"""Bench coverage is a decision, not an accident (VERDICT r10 ask 7).

The bench list is derived as REGISTRY minus an explicit exclusion set;
these tests pin that the exclusion set and the benched set partition
the registry EXACTLY, and that every exclusion is one of the two
documented kinds (frozen literal-frame golden tables, or capped
quadratic guard twins whose linear-scale twin IS benched).
"""

import bench

from harbourbridge_spark import queries as Q


def test_exclusions_partition_registry_exactly():
    benched = set(bench.BENCH_QUERIES)
    excluded = set(bench.BENCH_EXCLUDE)
    assert benched | excluded == set(Q.REGISTRY)
    assert not benched & excluded
    # no stale exclusion naming an entry that no longer exists
    assert excluded <= set(Q.REGISTRY)


def test_every_quadratic_guard_exclusion_has_a_benched_scale_twin():
    # the documented twin map: quadratic guard variant -> linear twin
    twins = {
        "dedup_ngram_jaccard": "dedup_lsh_verified",
        "dedup_embedding_cosine": "dedup_embedding_lsh",
    }
    benched = set(bench.BENCH_QUERIES)
    for guard, twin in twins.items():
        assert guard in bench.BENCH_EXCLUDE
        assert twin in benched, f"scale twin {twin} of {guard} not benched"


def test_no_silent_registry_growth_outside_the_partition():
    # a newly registered operator is benched automatically unless a
    # human adds it to BENCH_EXCLUDE with a reason — i.e. the benched
    # count tracks the registry size minus the fixed exclusion count
    assert len(bench.BENCH_QUERIES) == len(Q.REGISTRY) - len(
        bench.BENCH_EXCLUDE)
