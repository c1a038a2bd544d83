"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram
Jaccard, and embedding-cosine near-dup.

Dual-engine SQL templates (see text.py): Spark executes them over temp
views; the DuckDB rendering is the oracle, so candidate sets are
hash-compared exactly.

Scale design:
- exact dedup: one shuffle on the 48-bit content hash (not the full
  text — the classic shuffle-size optimization);
- MinHash-LSH: shingle explode is a projection; signatures are one
  groupBy(doc); banding turns the quadratic candidate search into
  equi-joins on band keys (shuffle on band buckets, skew-bounded
  because bucket size is capped by collision probability);
- SimHash: projection + 32 conditional sums per doc, pairs via
  band-blocked join on half-signatures (a Hamming-distance<=k search
  needs only ceil(32/(k+1)) blocks by pigeonhole);
- n-gram Jaccard: blocked pairwise verify — the *verification* stage
  downstream of LSH candidates, blocked here by (lang, length bucket);
- embedding near-dup: label-blocked exact cosine; the unblocked scale
  path is similarity.ann_lsh_sql.
"""

from __future__ import annotations

from ..confscope import scoped_parser_mode
from ..scan import read_cached, read_spread, read_store

import warnings
from typing import Iterator

import numpy as np
import pandas as pd

from .hashing import MERSENNE61, hash48, minhash_coeffs, perm_sql
from .text import TOKENS, norm_text, render

MINHASH_K = 16
BAND_SIZE = 4           # 4 bands of 4 -> candidates at jaccard ~>0.6
DEFAULT_JACCARD_T = 0.7  # default target threshold for the banding
                         # solver (bands_rows_for): solves to 4x4 under
                         # K=16 — the historical default banding, now
                         # DERIVED from the threshold rather than fixed
                         # (VERDICT r7 ask 5)
SHINGLE = 5             # character shingles
MAX_BUCKET = 256        # band-bucket membership cap (LSH skew guard):
                        # a degenerate bucket (all-identical boilerplate)
                        # would make one join key quadratic; buckets over
                        # the cap degrade to star pairing (every member
                        # vs the min-doc representative, O(n)) and are
                        # surfaced via lsh_bucket_stats

# The documented small-N exact variants (ngram_jaccard_pairs_sql,
# embedding_neardup_sql) are quadratic WITHIN a block. This cap bounds
# the largest block they will accept before the executable Spark paths
# refuse (10k rows -> ~50M comparisons per block, the reasonable edge
# of "small-N"); past it, use the LSH twin the error message names.
QUADRATIC_BLOCK_CAP = 10_000


class BlockTooLargeError(ValueError):
    """A blocking key exceeds the quadratic-variant cap."""


def check_quadratic_block_cap(spark, table: str, keys: str, op: str,
                              scale_twin: str, cap: int | None = None,
                              enforce: bool = True) -> int:
    """Guard for the small-N quadratic dedup variants: computes the
    largest block the blocking keys produce (one cheap map-side-
    combinable aggregate) and raises BlockTooLargeError (or warns when
    ``enforce=False``) if it exceeds ``cap``, pointing at the
    scale-safe twin. Returns the max block size."""
    cap = QUADRATIC_BLOCK_CAP if cap is None else cap
    n = spark.sql(
        f"SELECT COALESCE(MAX(n), 0) FROM "
        f"(SELECT COUNT(*) AS n FROM {table} GROUP BY {keys})"
    ).first()[0]
    if n > cap:
        msg = (f"{op}: largest block has {n} rows (> cap {cap}); this "
               f"variant is quadratic within a block and is documented "
               f"as the small-N exact option — use {scale_twin} at this "
               f"scale, or raise the cap explicitly if you accept "
               f"~{n * (n - 1) // 2} comparisons in one block")
        if enforce:
            raise BlockTooLargeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return n


def ngram_jaccard_pairs_fn(spark, sf_dir: str, cap: int | None = None,
                           enforce: bool = True):
    """Executable Spark path for the blocked n-gram Jaccard variant:
    refuses (BlockTooLargeError) when any (lang, len_bucket) block
    exceeds the quadratic cap — the scale path is dedup_lsh_verified."""
    with scoped_parser_mode(spark, "true"):
        read_spread(spark, f"{sf_dir}/documents.parquet") \
            .createOrReplaceTempView("documents")
        check_quadratic_block_cap(
            spark, "documents",
            "lang, CAST(floor(n_chars / 100.0) AS BIGINT)",
            op="dedup_ngram_jaccard", scale_twin="dedup_lsh_verified",
            cap=cap, enforce=enforce)
        return spark.sql(ngram_jaccard_pairs_sql("spark"))


def embedding_neardup_fn(spark, sf_dir: str, cap: int | None = None,
                         enforce: bool = True):
    """Executable Spark path for the label-blocked exact cosine
    variant: refuses when any label block exceeds the quadratic cap —
    the scale path is dedup_embedding_lsh."""
    with scoped_parser_mode(spark, "true"):
        read_spread(spark, f"{sf_dir}/embeddings.parquet") \
            .createOrReplaceTempView("embeddings")
        check_quadratic_block_cap(
            spark, "embeddings", "label",
            op="dedup_embedding_cosine", scale_twin="dedup_embedding_lsh",
            cap=cap, enforce=enforce)
        return spark.sql(embedding_neardup_sql("spark"))


def exact_dedup_sql(engine: str) -> str:
    """Exact duplicate groups via content hash: corpus-level stats in
    one pass. groupBy on the hash, not the text (shuffle carries 8
    bytes/row instead of the document)."""
    fp = hash48(norm_text(engine), engine)
    t = f"""
    WITH groups AS (
        SELECT {fp} AS fp, COUNT(*) AS n
        FROM documents GROUP BY 1
    )
    SELECT COUNT(*) AS n_distinct,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dup_rows,
           CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_groups
    FROM groups
    """
    return render(t, engine)


def _shingles_over(engine: str, nt: str = "nt") -> str:
    """Distinct character 5-gram shingles over a BOUND normalized-text
    column ``nt``. Binding matters: inlining trim(lower(text)) into the
    per-shingle lambda makes the engine recompute the normalization for
    every shingle — O(len^2) per document, measured 3x slower at
    sf0.1."""
    t = (f"{{adist}}({{ltrans}}({{seq}}(1, greatest(length({nt}) - {SHINGLE - 1}, 1)), "
         f"i -> substring({nt}, i, {SHINGLE})))")
    return render(t, engine)


def bands_rows_for(threshold: float, k: int = MINHASH_K) -> tuple[int, int]:
    """Derive (bands, rows-per-band) from a target Jaccard threshold:
    the LSH S-curve 1-(1-s^r)^b is steepest near (1/b)^(1/r), so pick
    the divisor pair of ``k`` whose characteristic threshold is closest
    to the target. K=16 offers t ≈ 0.06 (16 bands of 1), 0.35 (8x2),
    0.71 (4x4, the default), 0.92 (2x8), 1.0 (1x16)."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    best = None
    for r in range(1, k + 1):
        if k % r:
            continue
        b = k // r
        d = abs((1.0 / b) ** (1.0 / r) - threshold)
        if best is None or d < best[0]:
            best = (d, b, r)
    return best[1], best[2]


def minhash_signature_sql(engine: str, k: int = MINHASH_K,
                          fast: bool = False) -> str:
    """Per-doc MinHash signature (K permutations over shingle hashes),
    computed entirely per-row: normalize the text once in an inner
    projection (see _shingles_over), hash the shingle array once, then
    each permutation is an array_min over a transform. No explode, no
    groupBy — the earlier explode->K-MIN-aggregations formulation
    shuffled |docs| x |shingles| rows for the same result.

    ``fast=True`` switches to the CODE-POINT formulation: ascii() runs
    once per character (one pass builds the code-point array), and
    each shingle hash is then pure integer arithmetic over 5 array
    elements — hash31_poly's values exactly (ascii(substring(sh,j,1))
    == the code point at that text offset; out-of-range access
    coalesces to 0 == ascii('')), with ZERO string allocation per
    shingle.  The naive per-shingle form (substring the shingle, then
    5 more substrings inside the hash) benched SLOWER than one md5 per
    shingle; this form drops both the md5 and the per-shingle
    substrings.  Duplicate shingles are kept (array_min is unaffected
    by multiplicity, so the signature is identical and the distinct
    pass is saved).  md5 stays the default: the frozen oracles were
    recorded against it."""
    amin = "array_min" if engine == "spark" else "list_min"
    mins = ", ".join(
        f"{amin}({{ltrans}}(hs, h -> {perm_sql('h', a, b)})) AS m{i}"
        for i, (a, b) in enumerate(minhash_coeffs(k)))
    if fast:
        # engine-shifted array indexing: Spark arrays are 0-based,
        # DuckDB lists 1-based
        if engine == "spark":
            pos = f"{{seq}}(0, greatest({{alen}}(cp) - {SHINGLE}, 0))"
        else:
            pos = f"{{seq}}(1, greatest({{alen}}(cp) - {SHINGLE - 1}, 1))"
        h = f"coalesce(cp[i], 0)"
        for j in range(1, SHINGLE):
            h = f"(({h}) * 131 + coalesce(cp[i+{j}], 0)) % {1 << 31}"
        t = f"""
        WITH cps AS (
            SELECT doc_id,
                   {{ltrans}}({{seq}}(1, length(nt)),
                              j -> ascii(substring(nt, j, 1))) AS cp
            FROM (SELECT doc_id, {{ntext}} AS nt
                  FROM documents) _n
        ), hashed AS (
            SELECT doc_id, {{ltrans}}({pos}, i -> ({h})) AS hs
            FROM cps
        )
        SELECT doc_id, {mins} FROM hashed
        """
        return render(t, engine)
    sh = _shingles_over(engine)
    h = hash48("x", engine)
    t = f"""
    WITH hashed AS (
        SELECT doc_id, {{ltrans}}({sh}, x -> {h}) AS hs
        FROM (SELECT doc_id, {{ntext}} AS nt FROM documents) _n
    )
    SELECT doc_id, {mins} FROM hashed
    """
    return render(t, engine)


def _bands_clause(sig_source: str) -> str:
    """Shared band-expansion + size-capped bucket CTEs over a signature
    relation. The ``sized`` groupBy is a map-side-combinable count on
    the band key; buckets under MAX_BUCKET pair all-vs-all (``ok``);
    buckets OVER the cap degrade to STAR pairing (``big_star``: every
    member pairs with the bucket's min-doc representative) — O(n) per
    bucket instead of O(n^2), so giant duplicate clusters (boilerplate-
    heavy corpora) still surface in the near-dup path instead of being
    silently dropped. Deterministic in both engines (min doc_id rep);
    observable via lsh_bucket_stats_sql."""
    n_bands = MINHASH_K // BAND_SIZE
    return _bands_clause_at(sig_source, n_bands, BAND_SIZE)


def _band_expand_clause(sig_source: str, n_bands: int,
                        band_size: int, cte_name: str = "bands") -> str:
    """Just the band-expansion CTE text (``<cte_name> AS (...)``) over
    a signature relation — shared by the symmetric self-join clause
    below and the asymmetric incremental probes (which instantiate it
    twice under different names; the name is a parameter so no caller
    has to string-surgery the SQL)."""
    band_key = "CASE t.band " + " ".join(
        "WHEN {b} THEN concat_ws(',', {cols})".format(
            b=b, cols=", ".join(
                f"m{i}" for i in range(b * band_size, (b + 1) * band_size)))
        for b in range(n_bands)) + " END"
    values = ",".join(f"({b})" for b in range(n_bands))
    return f"""{cte_name} AS (
        SELECT doc_id, t.band, {band_key} AS key
        FROM {sig_source} CROSS JOIN (VALUES {values}) AS t(band)
    )"""


def _bands_clause_at(sig_source: str, n_bands: int, band_size: int) -> str:
    """_bands_clause for an explicit (bands, rows) choice — see
    bands_rows_for for deriving one from a Jaccard threshold."""
    return f"""{_band_expand_clause(sig_source, n_bands, band_size)}, sized AS (
        SELECT band, key, COUNT(*) AS n, MIN(doc_id) AS rep
        FROM bands GROUP BY band, key
    ), ok AS (
        SELECT b.doc_id, b.band, b.key
        FROM bands b JOIN sized s
          ON s.band = b.band AND s.key = b.key AND s.n <= {MAX_BUCKET}
    ), big_star AS (
        SELECT s.rep AS doc_a, b.doc_id AS doc_b
        FROM bands b JOIN sized s
          ON s.band = b.band AND s.key = b.key AND s.n > {MAX_BUCKET}
        WHERE b.doc_id <> s.rep
    )"""


_PAIRS_SELECT = """SELECT DISTINCT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM ok a JOIN ok b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        UNION ALL
        SELECT doc_a, doc_b FROM big_star
    ) _u"""


def _bands_clause_window_at(sig_source: str, n_bands: int,
                            band_size: int) -> str:
    """SPARK-side twin of _bands_clause_at with the bucket size/rep
    computed by ONE window over the band expansion instead of a
    groupBy + two bands⋈sized joins (r17; the shape the simhash
    candidate clause has always used, `_simhash_cand_clause`).  Same
    CTE contract (``ok``, ``big_star``) so _PAIRS_SELECT is shared;
    values identical: COUNT(*)/MIN(doc_id) OVER (PARTITION BY band,
    key) are exactly sized's aggregates, delivered on every member
    row.  Measured at sf0.1: candidate checkpoint 1.46-1.94 s
    (template) → 1.15-1.28 s (window), 101,251 pairs bit-identical.

    Scale note (guide §2.5): a degenerate bucket concentrates in one
    window partition, the same concentration the template's two SMJs
    already had (each sorts the bucket in one task pre-AQE-split);
    the window does it once.  The MAX_BUCKET star-degrade bounds the
    downstream explosion identically.  The ORACLE templates keep the
    groupBy+join form — this clause is only rendered in Spark
    execution strategies, so every declared single-statement SQL is
    unchanged."""
    return f"""{_band_expand_clause(sig_source, n_bands, band_size)}, ann AS (
        SELECT doc_id, band, key,
               COUNT(*) OVER w AS n, MIN(doc_id) OVER w AS rep
        FROM bands
        WINDOW w AS (PARTITION BY band, key)
    ), ok AS (
        SELECT doc_id, band, key FROM ann WHERE n <= {MAX_BUCKET}
    ), big_star AS (
        SELECT rep AS doc_a, doc_id AS doc_b FROM ann
        WHERE n > {MAX_BUCKET} AND doc_id <> rep
    )"""


def minhash_bands_sql(engine: str, sig_source: str,
                      threshold: float = DEFAULT_JACCARD_T) -> str:
    """The banding + candidate-join stage over an existing signature
    relation (``sig_source``). Split out so the Spark executor can
    cache the signature once (see minhash_lsh_pairs_fn) while the
    oracle keeps the single-statement CTE form. Banding is solved from
    the target Jaccard ``threshold`` (bands_rows_for); the default
    solves to the historical 4x4."""
    b, r = bands_rows_for(threshold)
    clause = _bands_clause_window_at(sig_source, b, r) \
        if engine == "spark" else _bands_clause_at(sig_source, b, r)
    t = f"""
    WITH {clause}
    {_PAIRS_SELECT}
    """
    return render(t, engine)


def minhash_lsh_pairs_fn(spark, sf_dir: str,
                         threshold: float = DEFAULT_JACCARD_T):
    """Spark execution strategy for the LSH pairs: materialize the
    signature ONCE (localCheckpoint + temp view) before the self-join —
    the CTE form would inline the whole shingle/hash pipeline into
    every reference (4 here: both join sides x the sized/ok split),
    and .cache() silently fails to match re-analyzed CTE plans on
    Spark 4.1 (the executed plan showed 4 full md5/shingle recomputes
    with the cache "enabled"). The checkpointed signature is |docs| x
    17 longs — tiny. Produces exactly the rows of
    minhash_lsh_pairs_sql.

    ``threshold`` is the production knob (VERDICT r7 ask 5): banding
    is DERIVED from the target Jaccard threshold via bands_rows_for —
    lower it and the banding reshapes (more bands, fewer rows) so the
    S-curve's knee lands on it. The default 0.7 solves to the same
    4x4 banding the pipeline has always used (frozen oracles).

    r16 (optimization round): the signature comes from the vectorized
    md5 Arrow kernel (bit-identical to the HOF SQL template by
    construction AND by the test_pipeline kernel-vs-SQL pin) — Spark
    evaluates transform()/aggregate() lambda bodies interpreted per
    element, which made the HOF signature stage ~3x the kernel cost
    (guide §4.1/§4.2; the oracle keeps the single-statement HOF
    form)."""
    vectorized_signature_view(spark, sf_dir, "__mh_sig")
    with scoped_parser_mode(spark, "true"):
        return spark.sql(minhash_bands_sql("spark", "__mh_sig", threshold))


_SHINGLE_CACHE_CAP = 1 << 21   # per-task md5 memo bound (~100 MB worst)


def _md5_sig_kernel(cache: dict | None = None):
    """Build the md5 signature kernel, optionally wired to a PER-TASK
    shingle-hash memo (guide §4.5 shape: heavyweight state constructed
    once per task, amortized over every batch).  Shingles are 5-char
    windows and repeat massively across documents of one partition, so
    the memo turns most md5 calls into a dict hit; the cap bounds
    worker memory on adversarially diverse corpora (hits past the cap
    simply compute — values never change, only speed).  hash48(s) ==
    int(md5(s)[:12], 16) == first 6 digest bytes big-endian — the
    ``int.from_bytes`` form skips the hex round-trip.  The K
    permutation mins run as ONE (K, n) vectorized op."""
    import hashlib
    coeffs = np.asarray(minhash_coeffs(MINHASH_K), np.int64)
    a_col = coeffs[:, 0:1]
    b_col = coeffs[:, 1:2]
    get = cache.get if cache is not None else None

    def kern(text: str) -> list:
        n = max(len(text) - SHINGLE + 1, 1)
        shingles = {text[i:i + SHINGLE] for i in range(n)}
        hs = np.empty(len(shingles), np.int64)
        if get is None:
            for j, s in enumerate(shingles):
                hs[j] = int.from_bytes(
                    hashlib.md5(s.encode("utf-8")).digest()[:6], "big")
        else:
            for j, s in enumerate(shingles):
                h = get(s)
                if h is None:
                    h = int.from_bytes(
                        hashlib.md5(s.encode("utf-8")).digest()[:6],
                        "big")
                    if len(cache) < _SHINGLE_CACHE_CAP:
                        cache[s] = h
                hs[j] = h
        return ((a_col * hs[None, :] + b_col) % MERSENNE61) \
            .min(axis=1).tolist()
    return kern


def _minhash_md5_signature(text: str) -> list:
    """Vectorized twin of the md5 signature: hash48(s) ==
    int(md5(s)[:12], 16) is computable exactly with hashlib (SQL md5
    hashes the UTF-8 bytes; so does ``s.encode()``), and shingles are
    plain code-point slices (Python slicing == substring semantics).
    Distinct shingles only — array_min is multiplicity-blind and the
    SQL template hashes a distinct array too."""
    return _md5_sig_kernel()(text)


def vectorized_signature_df(docs, kernel=None, materialize=True):
    """The checkpointed MinHash signature of a ``(doc_id, text, …)``
    DataFrame, computed by an Arrow-batched pandas_udf kernel
    (default: the md5 kernel, bit-identical to
    minhash_signature_sql()).  The scale-path signature stage shared
    by the verified-pair / clustering / observability operators AND
    (r16) the registry LSH / incremental / store-write paths — see
    minhash_lsh_pairs_fast_fn's docstring for why the kernel beats
    the interpreted SQL higher-order functions.  The udf is the
    ITERATOR form so the per-task shingle-hash memo (guide §4.5)
    builds once per task and serves every batch.

    ``materialize=False`` (r17) skips the localCheckpoint for callers
    that consume the signature exactly ONCE (single-reference plans:
    the non-admitting store probe, the store write) — the checkpoint
    there was a pure extra driver action; multi-reference callers keep
    the default so the kernel never re-runs per reference."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    @pandas_udf(ArrayType(LongType()))
    def sig_udf(texts_it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        k = kernel if kernel is not None else _md5_sig_kernel({})
        for texts in texts_it:
            # None -> None (SQL: transform(NULL)=NULL -> NULL mins),
            # so null-text docs flow through exactly like the template
            yield texts.map(lambda t: None if t is None else k(t))

    docs = docs.select("doc_id", F.trim(F.lower("text")).alias("nt"))
    # callers pass a spread input (scan.read_spread) — the documents
    # fixture is a single parquet row group → 1 scan partition, and
    # an unspread input serializes the whole Python signature stage
    # into ONE task (the synth_media _spread_ids lesson).  No .rdd
    # probe here: the input may carry an AQE shuffle, whose stages a
    # probe would materialize early.
    sig = (docs.select("doc_id", sig_udf("nt").alias("sig"))
           .select("doc_id",
                   *[F.element_at("sig", i + 1).alias(f"m{i}")
                     for i in range(MINHASH_K)]))
    return sig.localCheckpoint() if materialize else sig


def vectorized_signature_view(spark, sf_dir: str, view: str,
                              kernel=None):
    """Register vectorized_signature_df over the documents fixture as
    a temp view — the sf_dir-keyed convenience wrapper the registry
    entries use."""
    sig = vectorized_signature_df(
        read_spread(spark, f"{sf_dir}/documents.parquet"), kernel)
    sig.createOrReplaceTempView(view)
    return sig


def _minhash_numpy_signature(text: str) -> list:
    """The fast signature's per-document kernel: code points via a
    single utf-32 reinterpret (ord(c) == ascii(c) in Spark AND DuckDB,
    hashing.hash31_poly's contract), rolling 31-bit polynomial over
    SHINGLE-wide windows as vectorized numpy, then the K permutation
    mins as K vector ops.  Bit-identical to
    minhash_signature_sql(fast=True): short texts pad with 0
    (== ascii('')), and every intermediate fits int64 (hash < 2^31,
    a <= 2K+1, so a*h+b < 2^36)."""
    cp = np.frombuffer(text.encode("utf-32-le"), dtype="<u4") \
        .astype(np.int64)
    if len(cp) < SHINGLE:
        cp = np.concatenate([cp, np.zeros(SHINGLE - len(cp), np.int64)])
    n = len(cp) - SHINGLE + 1
    h = cp[:n].copy()
    for j in range(1, SHINGLE):
        h = (h * 131 + cp[j:j + n]) % (1 << 31)
    return [int(((a * h + b) % MERSENNE61).min())
            for a, b in minhash_coeffs(MINHASH_K)]


def minhash_lsh_pairs_fast_fn(spark, sf_dir: str,
                              threshold: float = DEFAULT_JACCARD_T):
    """minhash_lsh_pairs_fn with the signature computed in a
    VECTORIZED Arrow-batched pandas_udf instead of SQL higher-order
    functions — the corpus-scale knob, and the repo's documented
    escape hatch used for its stated reason: Spark evaluates lambda
    bodies inside transform()/aggregate() interpreted per element
    (outside whole-stage codegen), so the ~|docs| x |shingles| x K
    expression evaluations dominate every LSH bench no matter how
    cheap the shingle hash is (swapping md5 for an arithmetic
    polynomial inside the lambda measured NET SLOWER — more expression
    nodes per element).  numpy turns the same arithmetic into a few
    vector ops per document: measured 3.3s -> 0.8s on the signature
    stage and >=2x end-to-end vs dedup_minhash_lsh at sf0.1.

    Values are bit-identical to minhash_signature_sql(fast=True) (the
    single-statement form the DuckDB oracle runs), verified by the
    driver gate.  Same localCheckpoint caching, same banding/skew
    guards, and same solver-derived ``threshold`` knob as the md5
    path."""
    vectorized_signature_view(spark, sf_dir, "__mh_sig_fast",
                              kernel=_minhash_numpy_signature)
    with scoped_parser_mode(spark, "true"):
        return spark.sql(
            minhash_bands_sql("spark", "__mh_sig_fast", threshold))


def minhash_lsh_pairs_fast_sql(engine: str,
                               threshold: float = DEFAULT_JACCARD_T
                               ) -> str:
    """Single-statement (oracle) form of the fast-hash LSH pairs."""
    sig = minhash_signature_sql(engine, fast=True)
    b, r = bands_rows_for(threshold)
    t = f"""
    WITH sig AS ({sig}),
    {_bands_clause_at('sig', b, r)}
    {_PAIRS_SELECT}
    """
    return render(t, engine)


def minhash_lsh_pairs_sql(engine: str,
                          threshold: float = DEFAULT_JACCARD_T) -> str:
    """MinHash-LSH candidate pairs: band the signature (bands of
    BAND_SIZE), self-join on band keys, distinct pairs. The join is on
    the band hash — equality only, no quadratic scan, and bucket
    membership is capped at MAX_BUCKET (skew guard).

    Bands expand via a VALUES cross join (one signature computation
    per side, not one per band). The candidate search is a band-key
    self-join: Spark inlines the CTE into both sides (signature
    computed twice in this single-statement form — the executable
    Spark path minhash_lsh_pairs_fn caches it once), but the join
    distributes bucket expansion across tasks — a collect_list/flatten
    bucket expansion was measured 2-4x WORSE because giant buckets
    become single-row quadratic arrays with no parallelism.

    Banding derives from the target Jaccard ``threshold`` via
    bands_rows_for (default 0.7 -> the historical 4x4)."""
    sig = minhash_signature_sql(engine)
    b, r = bands_rows_for(threshold)
    t = f"""
    WITH sig AS ({sig}),
    {_bands_clause_at('sig', b, r)}
    {_PAIRS_SELECT}
    """
    return render(t, engine)


def minhash_lsh_pairs_at_sql(engine: str, threshold: float,
                             k: int = MINHASH_K) -> str:
    """minhash_lsh_pairs_sql with banding DERIVED from a target Jaccard
    threshold via bands_rows_for — the production knob: lower the
    threshold and the banding reshapes (more bands, fewer rows) so the
    S-curve's knee lands on it. The default K=16/r=4 pipeline is
    unchanged (frozen oracles); this entry point is for other operating
    points."""
    b, r = bands_rows_for(threshold, k)
    sig = minhash_signature_sql(engine, k)
    t = f"""
    WITH sig AS ({sig}),
    {_bands_clause_at('sig', b, r)}
    {_PAIRS_SELECT}
    """
    return render(t, engine)


def lsh_bucket_stats_sql(engine: str) -> str:
    """Observability for the LSH skew guard: band-bucket population
    stats, including how many buckets (and docs) the MAX_BUCKET cap
    drops from candidate generation. At 100 TB this is the query you
    run to tune the cap before the pair join."""
    sig = minhash_signature_sql(engine)
    n_bands = MINHASH_K // BAND_SIZE
    band_key = "CASE t.band " + " ".join(
        "WHEN {b} THEN concat_ws(',', {cols})".format(
            b=b, cols=", ".join(
                f"m{i}" for i in range(b * BAND_SIZE, (b + 1) * BAND_SIZE)))
        for b in range(n_bands)) + " END"
    values = ",".join(f"({b})" for b in range(n_bands))
    t = f"""
    WITH sig AS ({sig}),
    bands AS (
        SELECT doc_id, t.band, {band_key} AS key
        FROM sig CROSS JOIN (VALUES {values}) AS t(band)
    ), sized AS (
        SELECT band, key, COUNT(*) AS n
        FROM bands GROUP BY band, key
    )
    SELECT COUNT(*) AS n_buckets,
           CAST(MAX(n) AS BIGINT) AS max_bucket,
           CAST(SUM(CASE WHEN n > {MAX_BUCKET} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_capped_buckets,
           CAST(SUM(CASE WHEN n > {MAX_BUCKET} THEN n ELSE 0 END)
               AS BIGINT) AS n_docs_in_capped
    FROM sized
    """
    return render(t, engine)


def lsh_bucket_stats_fn(spark, sf_dir: str):
    """Spark strategy for lsh_bucket_stats: the same bucket-population
    aggregate, over the vectorized md5 signature view instead of the
    inline HOF signature CTE (identical values; see
    minhash_lsh_pairs_fast_fn for the why)."""
    vectorized_signature_view(spark, sf_dir, "__mh_sig_stats")
    n_bands = MINHASH_K // BAND_SIZE
    band_key = "CASE t.band " + " ".join(
        "WHEN {b} THEN concat_ws(',', {cols})".format(
            b=b, cols=", ".join(
                f"m{i}" for i in range(b * BAND_SIZE, (b + 1) * BAND_SIZE)))
        for b in range(n_bands)) + " END"
    values = ",".join(f"({b})" for b in range(n_bands))
    return spark.sql(f"""
    WITH bands AS (
        SELECT doc_id, t.band, {band_key} AS key
        FROM __mh_sig_stats CROSS JOIN (VALUES {values}) AS t(band)
    ), sized AS (
        SELECT band, key, COUNT(*) AS n
        FROM bands GROUP BY band, key
    )
    SELECT COUNT(*) AS n_buckets,
           CAST(MAX(n) AS BIGINT) AS max_bucket,
           CAST(SUM(CASE WHEN n > {MAX_BUCKET} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_capped_buckets,
           CAST(SUM(CASE WHEN n > {MAX_BUCKET} THEN n ELSE 0 END)
               AS BIGINT) AS n_docs_in_capped
    FROM sized
    """)


def minhash_lsh_pairs_at_fn(spark, sf_dir: str, threshold: float):
    """Spark strategy for the derived-banding candidates: banding
    solved from the threshold (bands_rows_for), signature from the
    vectorized md5 kernel view — identical values to
    minhash_lsh_pairs_at_sql."""
    b, r = bands_rows_for(threshold)
    vectorized_signature_view(spark, sf_dir, "__mh_sig_at")
    with scoped_parser_mode(spark, "true"):
        return spark.sql(render(f"""
        WITH {_bands_clause_window_at('__mh_sig_at', b, r)}
        {_PAIRS_SELECT}
        """, "spark"))


def dedup_keep_first_sql(engine: str) -> str:
    """The removal step downstream of candidate generation: keep the
    lowest doc_id per exact-content group, flag the rest as drops.
    Representative selection is a window min over the content hash —
    one shuffle on the 48-bit hash; survivors stream back without a
    second scan of the text."""
    fp = hash48(norm_text(engine), engine)
    t = f"""
    WITH fps AS (
        SELECT doc_id, {fp} AS fp FROM documents
    ), ranked AS (
        SELECT doc_id, fp,
               min(doc_id) OVER (PARTITION BY fp) AS keeper
        FROM fps
    )
    SELECT doc_id, fp, (doc_id = keeper) AS keep
    FROM ranked
    """
    return render(t, engine)


def _simhash_votes_ctes(engine: str, bits: int) -> str:
    """Shared CTE chain producing ``votes(doc_id, v0..v{bits-1})``:
    explode whitespace tokens, hash each, and per bit position take the
    majority vote (sum of +1/-1). Bit extraction is exact floor-
    division (h48 < 2^48 < 2^53, so double division is exact; >> and
    div/// differ across engines)."""
    toks = render("{rsplit}({ntext}, '\\s+')", engine)
    h = hash48("tok", engine)
    votes = ", ".join(
        f"SUM(CASE WHEN CAST(floor(h48 / {1 << j}.0) AS BIGINT) % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits))
    return f"""exploded AS (
        SELECT doc_id, {{explode}}({toks}) AS tok FROM documents
    ), hashed AS (
        SELECT doc_id, {h} AS h48 FROM exploded
    ), votes AS (
        SELECT doc_id, {votes} FROM hashed GROUP BY doc_id
    )"""


def simhash_sql(engine: str, bits: int = 32) -> str:
    """Per-doc SimHash over whitespace tokens: for each bit position,
    majority vote of token-hash bits; emitted as a bit string (engine-
    portable, no sign issues)."""
    bitstr = " || ".join(
        f"CASE WHEN v{j} >= 0 THEN '1' ELSE '0' END"
        for j in range(bits - 1, -1, -1))
    t = f"""
    WITH {_simhash_votes_ctes(engine, bits)}
    SELECT doc_id, {bitstr} AS simhash_bits FROM votes
    """
    return render(t, engine)


def _hamming(a: str, b: str, engine: str) -> str:
    """Exact Hamming distance between two integer signatures via
    popcount(xor). Spark spells xor ``^``; DuckDB's ``^`` is POWER, so
    it uses the xor() function. Both have bit_count."""
    if engine == "spark":
        return f"CAST(bit_count({a} ^ {b}) AS BIGINT)"
    return f"CAST(bit_count(xor({a}, {b})) AS BIGINT)"


def _simhash_kernel(bits: int = 32, cache: dict | None = None):
    """Build the per-doc SimHash kernel, optionally wired to a
    PER-TASK token-hash memo (r17; the _md5_sig_kernel shape, guide
    §4.5): tokens repeat massively across documents of a partition,
    so most md5 calls become a dict hit.  Values are unchanged — the
    memo only caches hash48(token), never votes."""
    import hashlib
    import re
    get = cache.get if cache is not None else None
    bit_range = np.arange(bits)
    bit_shift = np.arange(bits, dtype=np.int64)

    def kern(nt: str) -> int:
        toks = re.split(r"\s+", nt, flags=re.ASCII)
        if get is None:
            hs = np.fromiter(
                (int.from_bytes(
                    hashlib.md5(t.encode("utf-8")).digest()[:6], "big")
                 for t in toks), np.int64, len(toks))
        else:
            hs = np.empty(len(toks), np.int64)
            for j, t in enumerate(toks):
                h = get(t)
                if h is None:
                    h = int.from_bytes(
                        hashlib.md5(t.encode("utf-8")).digest()[:6],
                        "big")
                    if len(cache) < _SHINGLE_CACHE_CAP:
                        cache[t] = h
                hs[j] = h
        ones = ((hs[:, None] >> bit_range) & 1)
        votes = (2 * ones - 1).sum(axis=0)
        return int(((votes >= 0).astype(np.int64) << bit_shift).sum())
    return kern


def _simhash_int(nt: str, bits: int = 32) -> int:
    """Vectorized twin of the SimHash vote: tokens via
    re.split(r'\\s+', ..., re.ASCII) — Java regex \\s is the same
    ASCII class, and both splits keep leading/trailing empty fields —
    md5-hash48 per token (multiplicity kept: the SQL explode counts
    duplicate tokens), per-bit +1/-1 vote sums, then the integer
    signature with bit j set iff vote_j >= 0.  hash48(t) ==
    int(md5(t)[:12], 16) == first 6 digest bytes big-endian."""
    return _simhash_kernel(bits)(nt)


def simhash_signature_view(spark, sf_dir: str, view: str,
                           bits: int = 32):
    """Temp view of the checkpointed integer SimHash signature from the
    Arrow-batched kernel (bit-identical to the SQL vote CTEs)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def sig_udf(texts_it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # ITERATOR form (r17, guide §4.5): the per-task token-hash
        # memo builds once per task and serves every batch.  SQL drops
        # null-text docs entirely (explode of NULL emits no rows); the
        # callers filter nulls out, and None maps to None as a belt
        k = _simhash_kernel(bits, {})
        for texts in texts_it:
            yield texts.map(lambda t: None if t is None else k(t))

    # read_spread spreads the single-row-group scan so the kernel
    # does not serialize into one task (r16)
    docs = (read_spread(spark, f"{sf_dir}/documents.parquet")
            .select("doc_id", F.trim(F.lower("text")).alias("nt"))
            .where(F.col("nt").isNotNull()))
    sig = docs.select("doc_id", sig_udf("nt").alias("sig")) \
              .localCheckpoint()
    sig.createOrReplaceTempView(view)
    return sig


def simhash_fn(spark, sf_dir: str, bits: int = 32):
    """Spark strategy for dedup_simhash: kernel signature, rendered as
    the same MSB-first bit string the SQL template emits (bit j of the
    integer == vote_j >= 0, so the string is just the zero-padded
    binary rendering)."""
    sig = simhash_signature_view(spark, sf_dir, "__sh_sig", bits)
    sig.createOrReplaceTempView("__sh_sig")
    return spark.sql(f"""
    SELECT doc_id, lpad(conv(sig, 10, 2), {bits}, '0') AS simhash_bits
    FROM __sh_sig
    """)


def _simhash_cand_clause(keyed_source: str) -> str:
    """Shared slice-bucket candidate CTEs with the MAX_BUCKET skew
    guard (same policy as the MinHash band join, _bands_clause): a
    bucket over the cap degrades to STAR pairing against its min-doc
    representative — O(n) per bucket instead of O(n^2), so a
    boilerplate-heavy corpus whose signatures collapse onto few
    signatures cannot make a slice bucket quadratic. Star candidates
    still pass the exact popcount verify, so emitted pairs stay
    correct; only recall inside degenerate buckets degrades (the
    documented LSH trade)."""
    return f"""ann AS (
        SELECT doc_id, sig, b, slice,
               COUNT(*) OVER w AS n,
               MIN(doc_id) OVER w AS rep,
               MIN_BY(sig, doc_id) OVER w AS rep_sig
        FROM {keyed_source}
        WINDOW w AS (PARTITION BY b, slice)
    ), cand AS (
        SELECT DISTINCT doc_a, doc_b, sig_a, sig_b FROM (
            SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                   x.sig AS sig_a, y.sig AS sig_b
            FROM (SELECT * FROM ann WHERE n <= {MAX_BUCKET}) x
            JOIN (SELECT * FROM ann WHERE n <= {MAX_BUCKET}) y
              ON x.b = y.b AND x.slice = y.slice
             AND x.doc_id < y.doc_id
            UNION ALL
            SELECT rep AS doc_a, doc_id AS doc_b,
                   rep_sig AS sig_a, sig AS sig_b
            FROM ann
            WHERE n > {MAX_BUCKET} AND doc_id <> rep
        ) _u
    )"""


def simhash_pairs_fn(spark, sf_dir: str, k: int = 3, bits: int = 32):
    """Spark strategy for dedup_simhash_pairs: kernel signature view +
    the same pigeonhole slice join / popcount verify SQL (bucket-capped
    like the template)."""
    nb = k + 1
    width = -(-bits // nb)
    simhash_signature_view(spark, sf_dir, "__sh_sig_pairs", bits)
    ham = _hamming("sig_a", "sig_b", "spark")
    return spark.sql(f"""
    WITH keyed AS (
        SELECT doc_id, sig, b,
               CAST(floor(sig / pow(2.0, b * {width})) AS BIGINT)
                   % {1 << width} AS slice
        FROM (SELECT doc_id, sig, explode(sequence(0, {nb - 1})) AS b
              FROM __sh_sig_pairs) _b
    ), {_simhash_cand_clause('keyed')}
    SELECT doc_a, doc_b, {ham} AS hamming_dist
    FROM cand
    WHERE {ham} <= {k}
    """)


def simhash_pairs_sql(engine: str, k: int = 3, bits: int = 32) -> str:
    """SimHash near-dup PAIR SEARCH: all pairs with Hamming distance
    <= k, found WITHOUT a quadratic scan via the pigeonhole blocking of
    Manku et al. (WWW'07): split the signature into k+1 contiguous
    slices — two signatures within distance k must agree exactly on at
    least one slice — equi-join on (slice_index, slice_value), then
    exact popcount(xor) filter on the (deduplicated) candidates.

    Scale: candidate generation is an equi-join on slice buckets (one
    shuffle keyed by slice value); slice width = ceil(bits/(k+1)) sets
    bucket selectivity — at corpus scale raise ``bits`` (the generator
    is parametric up to 48, the exact-double limit shared with hash48)
    so each slice is wide enough that buckets stay small; skew auditing
    follows the lsh_bucket_stats pattern.

    Reference parity: the reference engine has no similarity search at
    all — this is part of the training-data pipeline extension
    (SURVEY §2.8)."""
    if not 0 < bits <= 48:
        raise ValueError("bits must be in (0, 48] (exact-double range)")
    nb = k + 1
    width = -(-bits // nb)
    # integer signature from the majority votes: sum of set-bit weights
    sig = " + ".join(
        f"CASE WHEN v{j} >= 0 THEN {1 << j} ELSE 0 END"
        for j in range(bits))
    ham = _hamming("sig_a", "sig_b", engine)
    t = f"""
    WITH {_simhash_votes_ctes(engine, bits)}, sigs AS (
        SELECT doc_id, CAST({sig} AS BIGINT) AS sig FROM votes
    ), keyed AS (
        SELECT doc_id, sig, b,
               CAST(floor(sig / pow(2.0, b * {width})) AS BIGINT)
                   % {1 << width} AS slice
        FROM (SELECT doc_id, sig, {{explode}}({{seq}}(0, {nb - 1})) AS b
              FROM sigs) _b
    ), {_simhash_cand_clause('keyed')}
    SELECT doc_a, doc_b, {ham} AS hamming_dist
    FROM cand
    WHERE {ham} <= {k}
    """
    return render(t, engine)


def _grams_over(engine: str, t: str = "t", n: int = 3) -> str:
    """Distinct word n-gram set over a BOUND token-array column ``t``
    ([] indexing is 0-based in Spark SQL, 1-based in DuckDB — hence the
    two forms). The token split must be bound in an inner projection:
    inlining it makes the engine re-split the text for every gram
    element — O(tokens^2) per document (measured ~9s -> ~1s at
    sf0.1)."""
    if engine == "spark":
        return render(
            f"{{adist}}({{ltrans}}({{seq}}(0, greatest({{alen}}({t}) - {n}, 0)), "
            f"i -> concat_ws(' ', {t}[i], {t}[i+1], {t}[i+2])))",
            engine)
    return render(
        f"{{adist}}({{ltrans}}({{seq}}(1, greatest({{alen}}({t}) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', {t}[i], {t}[i+1], {t}[i+2])))",
        engine)


def _gram_relation(engine: str, n: int = 3, extra_cols: str = "",
                   hashed: bool = False) -> str:
    """(doc_id[, extra], grams) relation with the token split bound
    once per row. ``hashed=True`` maps each gram through the portable
    48-bit hash: the set-intersection then runs over 8-byte longs
    instead of ~20-byte strings (smaller join shuffle, cheaper
    intersect); both engines use the identical hash, so Jaccard values
    match exactly (collisions included)."""
    toks = render("{rsplit}({ntext}, '\\s+')", engine)
    g = _grams_over(engine, "t", n)
    if hashed:
        g = render(f"{{adist}}({{ltrans}}({g}, x -> {hash48('x', engine)}))",
                   engine)
    return (f"SELECT doc_id, {extra_cols}{g} AS grams\n"
            f"        FROM (SELECT doc_id, {extra_cols}{toks} AS t "
            "FROM documents) _t")


def ngram_jaccard_pairs_sql(engine: str, n: int = 3,
                            threshold: float = 0.4) -> str:
    """Word n-gram Jaccard over (lang, length-bucket)-blocked pairs —
    the small-N exact-within-block option (quadratic within a block, so
    NOT the scale path; the 100 TB verify stage is
    lsh_verified_pairs_sql, which computes Jaccard only for LSH
    candidate pairs). Returns pairs with jaccard >= threshold."""
    toks = render("{rsplit}({ntext}, '\\s+')", engine)
    t = f"""
    WITH g AS (
        SELECT doc_id, lang, len_bucket,
               {_grams_over(engine, 't', n)} AS grams
        FROM (SELECT doc_id, lang,
                     CAST(floor(n_chars / 100.0) AS BIGINT) AS len_bucket,
                     {toks} AS t
              FROM documents) _t
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round({{alen}}({{ainter}}(a.grams, b.grams))
                 / CAST({{alen}}(a.grams) + {{alen}}(b.grams)
                        - {{alen}}({{ainter}}(a.grams, b.grams)) AS DOUBLE),
                 6) AS jaccard
    FROM g a JOIN g b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket
         AND a.doc_id < b.doc_id
    WHERE {{alen}}({{ainter}}(a.grams, b.grams))
          / CAST({{alen}}(a.grams) + {{alen}}(b.grams)
                 - {{alen}}({{ainter}}(a.grams, b.grams)) AS DOUBLE)
          >= {threshold}
    """
    return render(t, engine)


def _gram_set_kernel(cache: dict | None = None, n: int = 3):
    """Build the hashed-gram-set kernel, optionally wired to a
    PER-TASK gram-hash memo (the _md5_sig_kernel pattern: word
    n-grams repeat across documents, so most md5 calls become dict
    hits; the shared cap bounds worker memory)."""
    import hashlib
    import re
    split = re.compile(r"\s+", flags=re.ASCII).split
    get = cache.get if cache is not None else None

    def kern(nt: str) -> list:
        toks = split(nt)
        grams = {" ".join(toks[i:i + n])
                 for i in range(max(len(toks) - n, 0) + 1)}
        if get is None:
            return [int.from_bytes(
                hashlib.md5(g.encode("utf-8")).digest()[:6], "big")
                for g in grams]
        out = []
        for g in grams:
            h = get(g)
            if h is None:
                h = int.from_bytes(
                    hashlib.md5(g.encode("utf-8")).digest()[:6], "big")
                if len(cache) < _SHINGLE_CACHE_CAP:
                    cache[g] = h
            out.append(h)
        return out
    return kern


def _hashed_gram_set(nt: str, n: int = 3) -> list:
    """Vectorized twin of _gram_relation(hashed=True): ASCII-\\s token
    split (same as the SimHash kernel), word ``n``-grams at positions
    0..max(len-n, 0) — short docs yield one partial gram, exactly like
    concat_ws skipping out-of-range elements — distinct, md5-hash48
    per gram.  Order-free: consumers only do set intersections."""
    return _gram_set_kernel(n=n)(nt)


def lsh_verify_sql(engine: str, cand_source: str, n: int = 3,
                   threshold: float = 0.4, extra_ctes: str = "",
                   gram_source: str = "") -> str:
    """The verify stage wired to its candidate feed: n-gram Jaccard
    computed ONLY for pairs in ``cand_source`` (doc_a, doc_b). Two
    equi-joins on doc_id bring each side's gram set to the candidate
    row — work is O(|candidates|), never quadratic in a block. Pass
    ``gram_source`` (doc_id, grams) to reuse a pre-materialized gram
    relation (the Spark path caches grams for candidate-involved docs
    only — at scale candidates << corpus)."""
    if gram_source:
        g_cte = ""
        g = gram_source
    else:
        g_cte = (f"g AS (\n        "
                 f"{_gram_relation(engine, n, hashed=True)}\n    ), ")
        g = "g"
    # size prefilter: jaccard(A,B) <= min(|A|,|B|)/max(|A|,|B|), so pairs
    # failing the ratio can never reach the threshold — skips the
    # intersection for them without changing any result
    t = f"""
    WITH {extra_ctes}{g_cte}j AS (
        SELECT c.doc_a, c.doc_b,
               {{alen}}({{ainter}}(a.grams, b.grams)) AS inter,
               {{alen}}(a.grams) AS la, {{alen}}(b.grams) AS lb
        FROM {cand_source} c
        JOIN {g} a ON a.doc_id = c.doc_a
        JOIN {g} b ON b.doc_id = c.doc_b
         AND least({{alen}}(a.grams), {{alen}}(b.grams))
             >= {threshold} * greatest({{alen}}(a.grams), {{alen}}(b.grams))
    )
    SELECT doc_a, doc_b,
           round(inter / CAST(la + lb - inter AS DOUBLE), 6) AS jaccard
    FROM j
    WHERE inter / CAST(la + lb - inter AS DOUBLE) >= {threshold}
    """
    return render(t, engine)


def lsh_verified_pairs_sql(engine: str) -> str:
    """Single-statement form (the DuckDB oracle): LSH candidates CTE +
    Jaccard verify join."""
    cand = minhash_lsh_pairs_sql(engine)
    return lsh_verify_sql(engine, "cand",
                          extra_ctes=f"cand AS ({cand}),\n    ")


def lsh_verified_pairs_fn(spark, sf_dir: str):
    """Spark execution strategy: materialize LSH candidates off the
    cached signature (minhash_lsh_pairs_fn) into a cached table (they
    feed three references), then compute gram sets ONLY for docs that
    appear in a candidate pair — the id semi-join runs BEFORE the gram
    projection, so at scale (candidates << corpus) the expensive
    tokenize+gram work touches a sliver of the data. The verify joins
    are doc_id equi-joins; no quadratic term anywhere.

    The candidate signature comes from the vectorized md5 kernel
    (bit-identical to the SQL template the oracle inlines; the
    interpreted-HOF SQL form remains the dedup_minhash_lsh registry
    entry's own benchmark)."""
    vectorized_signature_view(spark, sf_dir, "__mh_sig_md5")
    with scoped_parser_mode(spark, "true"):
        read_spread(spark, f"{sf_dir}/documents.parquet") \
            .createOrReplaceTempView("documents")   # verify stage reads it
        pairs = spark.sql(minhash_bands_sql("spark", "__mh_sig_md5"))
        # localCheckpoint materializes the candidate pairs ONCE and replaces
        # the CTE-heavy lineage with a scan of the checkpointed partitions.
        # Plain .cache()/CACHE TABLE both fail here on Spark 4.1: .cache()
        # crashes the CTE-pruning optimizer rule
        # (PushdownPredicatesAndPruneColumnsForCTEDef), and CACHE TABLE's
        # cache lookup misses on re-analyzed CTE plans, silently recomputing
        # the band join for every reference (3x here — observed in the
        # executed plan).
        pairs = pairs.localCheckpoint()
        pairs.createOrReplaceTempView("__mh_cand")
        # gram sets for candidate docs via the vectorized kernel (hashed
        # word 3-grams, values identical to the SQL template — same token
        # split as the SimHash kernel, same md5 hash48)
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import ArrayType, LongType

        @pandas_udf(ArrayType(LongType()))
        def gram_udf(texts_it: Iterator[pd.Series]
                     ) -> Iterator[pd.Series]:
            k = _gram_set_kernel({})   # per-task gram-hash memo
            for texts in texts_it:
                yield texts.map(lambda t: None if t is None else k(t))

        ids = (pairs.select(F.col("doc_a").alias("doc_id"))
               .union(pairs.select(F.col("doc_b").alias("doc_id")))
               .distinct())
        # plain read (r16): the candidate-id semi-join prunes the corpus
        # to a tiny relation in one cheap task — spreading the full text
        # column ahead of it would shuffle the whole corpus for nothing;
        # the repartition AFTER the join is what feeds the gram kernel
        docs = (read_cached(spark, f"{sf_dir}/documents.parquet")
                .join(ids, "doc_id")
                .select("doc_id", F.trim(F.lower("text")).alias("nt")))
        # spread the gram kernel (r16): AQE coalesces the tiny
        # semi-join output to ~1 post-shuffle partition, serializing
        # the Python stage into one task — same starvation class as
        # the single-row-group signature scan.  Unconditional (no
        # .rdd probe: materializing an AQE join plan's RDD would
        # execute its query stages early)
        par = spark.sparkContext.defaultParallelism
        docs = docs.repartition(par)
        grams = (docs.select("doc_id", gram_udf("nt").alias("grams"))
                 .localCheckpoint())
        grams.createOrReplaceTempView("__mh_grams")
        return spark.sql(lsh_verify_sql("spark", "__mh_cand",
                                        gram_source="__mh_grams"))


def dedup_clusters_fn(spark, sf_dir: str, max_iters: int = 20,
                      pairs=None):
    """Near-dup CLUSTER ASSIGNMENT: connected components over the
    LSH-verified pair graph, via iterative min-label propagation —
    every doc in a component converges to the component's minimum
    doc_id (the canonical representative the removal step keeps).

    This is the iterative-algorithm pattern: the driver loop only
    orchestrates rounds (data never leaves the cluster; the per-round
    action is a count of changed labels), each round is one
    edge-labels equi-join + min-aggregate, and labels are
    localCheckpoint()ed so lineage stays flat. Rounds needed = graph
    diameter — tiny for dup clusters (near-cliques); ``max_iters``
    bounds pathological chains. The oracle recomputes components with
    a recursive CTE (transitive closure + MIN) — engine-independent
    agreement on every component.
    """
    from pyspark.sql import functions as F

    if pairs is None:
        pairs = (lsh_verified_pairs_fn(spark, sf_dir)
                 .select("doc_a", "doc_b").localCheckpoint())
    # symmetric edge list via inline-explode, not Union (r16, second
    # pass): the fused two-step cycle below references ``edges`` twice
    # in ONE plan, and Spark 4.1's Union constraint rewrite crashes on
    # a reused Union subtree (NoSuchElementException in
    # rewriteConstraints); the single-scan Generate has no such issue
    # and reads the checkpointed pairs once instead of twice.
    edges = pairs.selectExpr(
        "inline(array(struct(doc_a, doc_b), "
        "struct(doc_b AS doc_a, doc_a AS doc_b)))")

    def prop(lab):
        """One min-label step: least(label, min over neighbors)."""
        nbr = (edges.join(lab, edges.doc_a == lab.doc)
               .groupBy(F.col("doc_b").alias("doc"))
               .agg(F.min("label").alias("nl")))
        return (lab.join(nbr, "doc", "left")
                .select("doc",
                        F.least("label",
                                F.coalesce("nl", "label")).alias("label"),
                        (F.col("nl") < F.col("label")).alias("chg")))

    # STEP 1 fused into an edge aggregation (r17): with label_0(doc) =
    # doc, the first min-label step is label_1(doc) = least(doc,
    # min(neighbor doc_id)) — a single map-side-combinable groupBy over
    # the symmetric edge list.  The r16 shape materialized an identity
    # labels relation (nodes.distinct + localCheckpoint — one driver
    # action) and then ran step 1 as edges⋈labels + groupBy + labels⋈
    # (three shuffles); the fused form is ONE shuffle and no init
    # barrier.  Every node appears as doc_b in the symmetric edge list,
    # so the groupBy covers exactly the node set; labels are identical
    # (min over neighbor *labels* at step 1 == min over neighbor ids).
    def first_step():
        return (edges.groupBy(F.col("doc_b").alias("doc"))
                .agg(F.min("doc_a").alias("nl"))
                .select("doc",
                        F.least("doc", "nl").alias("label"),
                        (F.col("nl") < F.col("doc")).alias("chg")))

    # TWO propagation steps per checkpoint+count cycle (r16, second
    # pass): at sf0.1 the whole loop is fixed per-job overhead (143
    # vertices — measured 1.75 s for 2 rounds, i.e. ~0.4 s per driver
    # action on near-empty shuffles), and dup clusters are near-cliques
    # that converge in ~2 steps — so fusing steps halves the action
    # count and typically finishes in ONE cycle.  Labels are identical:
    # each step is the same deterministic monotone update, convergence
    # is still "last step changed nothing" (monotone fixpoint: a no-op
    # step can never be followed by a change), and an odd-round
    # convergence just means the cycle's second step is a no-op.
    # max_iters still bounds total STEPS, so pathological chains run
    # exactly as many updates as before.
    labels = None
    converged = False
    for cycle in range(max_iters // 2):
        one = first_step().select("doc", "label") if cycle == 0 \
            else prop(labels).select("doc", "label")
        new = prop(one).localCheckpoint()
        changed = new.where("chg").count()
        labels = new.select("doc", "label")
        if changed == 0:
            converged = True
            break
    if max_iters % 2 and not converged:
        # odd bound: the documented step budget ends on a single step
        one = first_step() if labels is None else prop(labels)
        labels = one.select("doc", "label").localCheckpoint()
    if labels is None:            # max_iters == 0: identity labels
        labels = (edges.select(F.col("doc_a").alias("doc")).distinct()
                  .select("doc", F.col("doc").alias("label")))
    return labels.select(F.col("doc").alias("doc_id"),
                         F.col("label").alias("cluster_id"))


def dedup_removal_manifest_fn(spark, sf_dir: str, clusters=None):
    """The end of the near-dup pipeline: a keep/drop decision for
    EVERY document.  Docs in the verified-pair graph keep only their
    cluster representative (min doc_id == cluster_id); docs with no
    near-duplicate are their own cluster and are kept.  One left join
    of the corpus against the (tiny) cluster labels — the manifest a
    removal job or audit consumes."""
    from pyspark.sql import functions as F
    if clusters is None:
        clusters = dedup_clusters_fn(spark, sf_dir)
    # plain read (r16): only doc_id leaves the scan — nothing heavy
    # chains into the scan stage, so the spread exchange buys nothing
    docs = read_cached(spark, f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    return (docs.join(clusters, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
                    (F.coalesce("cluster_id", F.col("doc_id"))
                     == F.col("doc_id")).alias("keep")))


def dedup_removal_manifest_oracle_sql() -> str:
    """Oracle: the recursive-closure cluster labels left-joined to all
    documents."""
    clusters = dedup_clusters_oracle_sql()
    return f"""
    WITH cl AS ({clusters})
    SELECT d.doc_id,
           COALESCE(cl.cluster_id, d.doc_id) AS cluster_id,
           COALESCE(cl.cluster_id, d.doc_id) = d.doc_id AS keep
    FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id
    """


def dedup_pipeline_materialized_fn(spark, sf_dir: str):
    """The dedup chain as a real pipeline would run it: the expensive
    stages (signature → candidates → verify; label propagation) are
    materialized ONCE and every downstream consumer reads the
    materialized result — versus the per-query harness shape where
    dedup_clusters and dedup_removal_manifest each re-run the whole
    chain.  Emits one summary row (stage cardinalities + drop count)
    so the entry is oracle-checkable; its bench time is the cost of
    ONE chain execution (≈ the max of the chain's stages, not their
    sum — the evidence that the per-query re-execution cost in the
    separate entries is harness artifact, not plan cost)."""
    from pyspark.sql import functions as F

    pairs = (lsh_verified_pairs_fn(spark, sf_dir)
             .select("doc_a", "doc_b").localCheckpoint())
    # no re-checkpoint of clusters (r17): dedup_clusters_fn's return
    # is already a projection OVER its loop's checkpointed labels, so
    # the extra localCheckpoint was a pure serialization barrier (one
    # whole driver action re-materializing materialized rows)
    clusters = dedup_clusters_fn(spark, sf_dir, pairs=pairs)
    manifest = dedup_removal_manifest_fn(spark, sf_dir,
                                         clusters=clusters)
    s_pairs = pairs.agg(
        F.count("*").cast("long").alias("n_verified_pairs"))
    s_clusters = clusters.agg(
        F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
        F.count("*").cast("long").alias("n_clustered_docs"))
    s_manifest = manifest.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0))
         .cast("long").alias("n_dropped"))
    # three 1-row aggregates: broadcast scalar crossJoins, no shuffle
    return s_pairs.crossJoin(s_clusters).crossJoin(s_manifest)


def dedup_pipeline_materialized_oracle_sql() -> str:
    """Oracle: the same five summary numbers from the recursive-CTE
    closure chain (the oracle recomputes stages — correctness only,
    the Spark side is what the bench times)."""
    cand = lsh_verified_pairs_sql("duckdb")
    clusters = dedup_clusters_oracle_sql()
    return f"""
    WITH cand AS ({cand}),
    cl AS ({clusters}),
    man AS (
        SELECT d.doc_id,
               COALESCE(cl.cluster_id, d.doc_id) = d.doc_id AS keep
        FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id
    )
    SELECT CAST((SELECT COUNT(*) FROM cand) AS BIGINT)
               AS n_verified_pairs,
           CAST((SELECT COUNT(DISTINCT cluster_id) FROM cl) AS BIGINT)
               AS n_clusters,
           CAST((SELECT COUNT(*) FROM cl) AS BIGINT)
               AS n_clustered_docs,
           CAST((SELECT COUNT(*) FROM man) AS BIGINT) AS n_docs,
           CAST((SELECT COUNT(*) FROM man WHERE NOT keep) AS BIGINT)
               AS n_dropped
    """


def dedup_clusters_oracle_sql() -> str:
    """DuckDB oracle for dedup_clusters_fn: recursive-CTE transitive
    closure over the same verified-pair graph, then MIN(root) per doc.
    Exact for the bounded oracle scale; the Spark side's label
    propagation is the 100 TB path (closure is quadratic per
    component, propagation is linear per round)."""
    cand = lsh_verified_pairs_sql("duckdb")
    return f"""
    WITH RECURSIVE cand AS ({cand}),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM cand
        UNION ALL
        SELECT doc_b AS u, doc_a AS v FROM cand
    ),
    nodes AS (SELECT DISTINCT u AS doc FROM edges),
    reach(doc, r) AS (
        SELECT doc, doc FROM nodes
        UNION
        SELECT e.v, reach.r
        FROM reach JOIN edges e ON e.u = reach.doc
    )
    SELECT doc AS doc_id, MIN(r) AS cluster_id
    FROM reach GROUP BY doc
    """


def embedding_neardup_sql(engine: str, threshold: float = 0.35) -> str:
    """Embedding-cosine near-dup pairs, blocked by label (exact within
    block). Dot/norm computed by sequential fold in both engines —
    bit-identical doubles."""
    if engine == "spark":
        dot = ("aggregate(zip_with(a.embedding, b.embedding, "
               "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
               "0D, (acc, v) -> acc + v)")
        norm = ("sqrt(aggregate(embedding, 0D, "
                "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")
    else:
        dot = ("list_dot_product(a.embedding::DOUBLE[], "
               "b.embedding::DOUBLE[])")
        norm = ("sqrt(list_dot_product(embedding::DOUBLE[], "
                "embedding::DOUBLE[]))")
    # norms are precomputed per vector (O(N)), not per pair (O(N^2))
    t = f"""
    WITH n AS (
        SELECT vec_id, label, embedding, {norm} AS nrm FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({dot} / (a.nrm * b.nrm), 6) AS cosine
    FROM n a JOIN n b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {dot} / (a.nrm * b.nrm) >= {threshold}
    """
    return render(t, engine)


def embedding_neardup_lsh_sql(engine: str, threshold: float = 0.35) -> str:
    """Embedding near-dup at scale: random-hyperplane sign signatures
    (shared with similarity.ann_lsh_sql) bucket the vectors, pairs form
    only within a bucket — an equi-join on the signature string, no
    label blocking, no quadratic term. Recall is approximate (near-dups
    with different signatures are missed); both engines compute the
    identical approximation. This is the default scale path; the
    label-blocked exact variant (embedding_neardup_sql) remains the
    small-N option.

    Bucket-join bound (two layers, same policy as the MinHash band join
    and the SimHash slice join — no LSH-family join in this repo is
    uncapped):

    1. exact-duplicate pre-collapse — byte-identical vectors are
       grouped (GROUP BY the array value: one hash shuffle) down to
       their min-vec_id representative carrying a ``mult``
       multiplicity BEFORE any signature work, so duplicate-heavy
       corpora (the dominant real-world shape — scraped embeddings
       repeat) cannot inflate a bucket at all.  Pair output reports
       representatives + multiplicities; intra-group pairs are implied
       by mult > 1 (all have cosine 1.0), never enumerated.
    2. MAX_BUCKET star-degrade — a signature bucket whose DISTINCT
       membership still exceeds the cap pairs each member against the
       bucket's min-vec_id representative only (O(n) per bucket), and
       those star candidates still pass the exact cosine filter, so
       emitted pairs stay correct; only recall inside degenerate
       buckets degrades (the documented LSH trade)."""
    from .similarity import _dot_sql, _norm_sql, _signature_sql
    sig = _signature_sql(engine, "embedding")
    dot = _dot_sql(engine, "a_emb", "b_emb")
    nrm = _norm_sql(engine, "embedding")
    t = f"""
    WITH collapsed AS (
        SELECT MIN(vec_id) AS vec_id,
               CAST(COUNT(*) AS BIGINT) AS mult,
               embedding
        FROM embeddings
        GROUP BY embedding
    ), n AS (
        SELECT vec_id, mult, embedding, {sig} AS sig, {nrm} AS nrm
        FROM collapsed
    ), b AS (
        SELECT vec_id, mult, embedding, sig, nrm,
               COUNT(*) OVER win AS bn,
               MIN(vec_id) OVER win AS rep,
               MIN_BY(embedding, vec_id) OVER win AS rep_emb,
               MIN_BY(nrm, vec_id) OVER win AS rep_nrm,
               MIN_BY(mult, vec_id) OVER win AS rep_mult
        FROM n
        WINDOW win AS (PARTITION BY sig)
    ), cand AS (
        SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
               x.mult AS mult_a, y.mult AS mult_b,
               x.embedding AS a_emb, y.embedding AS b_emb,
               x.nrm AS nrm_a, y.nrm AS nrm_b
        FROM (SELECT * FROM b WHERE bn <= {MAX_BUCKET}) x
        JOIN (SELECT * FROM b WHERE bn <= {MAX_BUCKET}) y
          ON x.sig = y.sig AND x.vec_id < y.vec_id
        UNION ALL
        SELECT rep AS vec_a, vec_id AS vec_b,
               rep_mult AS mult_a, mult AS mult_b,
               rep_emb AS a_emb, embedding AS b_emb,
               rep_nrm AS nrm_a, nrm AS nrm_b
        FROM b
        WHERE bn > {MAX_BUCKET} AND vec_id <> rep
    )
    SELECT vec_a, vec_b, mult_a, mult_b,
           round({dot} / (nrm_a * nrm_b), 6) AS cosine
    FROM cand
    WHERE {dot} / (nrm_a * nrm_b) >= {threshold}
    """
    return render(t, engine)


# ---------------------------------------------------------------------------
# winnowing fingerprints (span-overlap near-dup family)
# ---------------------------------------------------------------------------

WINNOW_K = 3            # words per k-gram
WINNOW_W = 4            # winnowing window: every run of W consecutive
                        # grams contributes >= 1 fingerprint, so any
                        # shared span of >= K + W - 1 words is
                        # GUARANTEED to produce a shared fingerprint
                        # (the winnowing locality guarantee)
WINNOW_MIN_SHARED = 2   # emit pairs sharing at least this many fps
WINNOW_MAX_DF = MAX_BUCKET  # fingerprint document-frequency cap


def _winnow_gram_hashes(engine: str) -> str:
    """Array of hash48 values of the word WINNOW_K-grams of ``tk`` in
    POSITIONAL order (no dedup — winnowing is positional). Spark
    lambda indexing over an array is 0-based, DuckDB's is 1-based:
    shift the index sequence, not the element refs (the
    decontaminate_sql idiom)."""
    joined = ", ".join(f"tk[i{f'+{o}' if o else ''}]"
                       for o in range(WINNOW_K))
    gram = f"concat_ws(' ', {joined})"
    if engine == "spark":
        body = ("{ltrans}({seq}(0, {alen}(tk) - %d), i -> %s)"
                % (WINNOW_K, hash48(gram, engine)))
    else:
        body = ("{ltrans}({seq}(1, {alen}(tk) - %d), i -> %s)"
                % (WINNOW_K - 1, hash48(gram, engine)))
    return render(body, engine)


def _winnow_tail_sql() -> str:
    """Shared tail of the winnow pipeline (template and fast path are
    identical from the positional gram-hash relation ``g(doc_id, pos,
    h)`` on): sliding-window min -> distinct fingerprints -> df cap ->
    pair join. Engine-portable as-is."""
    return f"""win AS (
        SELECT doc_id, pos,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW
                            AND {WINNOW_W - 1} FOLLOWING) AS fp,
               COUNT(*) OVER (PARTITION BY doc_id) AS np
        FROM g
    ), fps AS (
        SELECT DISTINCT doc_id, fp FROM win
        WHERE pos <= greatest(1, np - {WINNOW_W - 1})
    ), capped AS (
        SELECT doc_id, fp FROM (
            SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY fp) AS df
            FROM fps) _d
        WHERE df <= {WINNOW_MAX_DF}
    )"""


_WINNOW_FINAL = f"""
    totals AS (
        SELECT doc_id, COUNT(*) AS nf FROM capped GROUP BY doc_id
    ), shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               COUNT(*) AS shared_fps
        FROM capped a JOIN capped b
          ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT s.doc_a, s.doc_b,
           CAST(s.shared_fps AS BIGINT) AS shared_fps,
           round(CAST(s.shared_fps AS DOUBLE) / least(ta.nf, tb.nf), 6)
               AS span_overlap
    FROM shared s
    JOIN totals ta ON ta.doc_id = s.doc_a
    JOIN totals tb ON tb.doc_id = s.doc_b
    WHERE s.shared_fps >= {WINNOW_MIN_SHARED}
"""


def winnow_pairs_sql(engine: str) -> str:
    """Winnowing span-overlap pairs (the MOSS local-fingerprint
    family; Schleimer/Wilkerson/Aiken, SIGMOD'03): per doc take the
    MIN gram-hash of every sliding window of WINNOW_W word-3-gram
    hashes, dedupe to the fingerprint set, and pair documents sharing
    >= WINNOW_MIN_SHARED fingerprints.  Detects COPIED SPANS (any
    shared run of >= K+W-1 words yields a shared fingerprint — the
    winnowing guarantee) that whole-document MinHash misses when the
    rest of the two documents differs.

    Scale shape: tokens explode linearly; the window min is one
    per-doc sort (bounded partitions — a document's grams); the pair
    join is df-capped — fingerprints held by more than WINNOW_MAX_DF
    documents are dropped as boilerplate BEFORE the join (the
    classical winnowing 'ignore ubiquitous fingerprints' rule; the
    corpus-level boilerplate op reports them), so no join key can go
    quadratic in corpus size: pair output is bounded by
    sum_fp df(fp)^2 <= WINNOW_MAX_DF * total fingerprint mass.
    Candidate scoring (span_overlap = shared / min(|fps|)) needs no
    text re-read — the verify stage for emitted pairs is
    dedup_lsh_verified's gram-Jaccard.
    """
    gh = _winnow_gram_hashes(engine)
    t = f"""
    WITH tk AS (
        SELECT doc_id, {render(TOKENS, engine)} AS tk FROM documents
        WHERE text IS NOT NULL
    ), ghs AS (
        SELECT doc_id, {gh} AS gh FROM tk
        WHERE {{alen}}(tk) >= {WINNOW_K}
    ), g AS (
        SELECT doc_id, pos, {{elem}}(gh, pos) AS h
        FROM (SELECT doc_id, gh,
                     {{explode}}({{seq}}(1, {{alen}}(gh))) AS pos
              FROM ghs) _p
    ), {_winnow_tail_sql()},
    {_WINNOW_FINAL}
    """
    return render(t, engine)


def winnow_pairs_fn(spark, sf_dir: str):
    """Spark execution strategy for dedup_winnow_pairs: identical
    output to winnow_pairs_sql (the oracle keeps the array template),
    but gram hashes form via posexplode + window LEADs (tokens stream
    through one (doc_id, pos) sort — no per-row array build), and the
    capped fingerprint relation is checkpointed ONCE before being
    read from both sides of the pair join plus the totals aggregate
    (Spark inlines CTEs, so the template form would re-run the whole
    tokenize+winnow pipeline three times)."""
    from .text import render as _render
    with scoped_parser_mode(spark, "true"):
        read_spread(spark, f"{sf_dir}/documents.parquet") \
            .createOrReplaceTempView("documents")
        toks = _render(TOKENS, "spark")
        leads = ", ".join(f"lead(tok, {j}) OVER w"
                          for j in range(1, WINNOW_K))
        capped = spark.sql(f"""
        WITH toks AS (
            SELECT doc_id, posexplode({toks}) AS (pos, tok)
            FROM documents WHERE text IS NOT NULL
        ), g0 AS (
            SELECT doc_id, pos,
                   concat_ws(' ', tok, {leads}) AS gram,
                   lead(tok, {WINNOW_K - 1}) OVER w AS tlast
            FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ), g AS (
            -- posexplode positions are 0-based; the shared tail's
            -- full-window filter (pos <= np - W + 1) assumes the
            -- template's 1-based positions, so shift here
            SELECT doc_id, pos + 1 AS pos, {hash48('gram', 'spark')} AS h
            FROM g0 WHERE tlast IS NOT NULL
        ), {_winnow_tail_sql()}
        SELECT doc_id, fp FROM capped
        """).localCheckpoint()
        capped.createOrReplaceTempView("__winnow_capped")
        return spark.sql(f"""
        WITH capped AS (SELECT * FROM __winnow_capped),
        {_WINNOW_FINAL}
        """)


def _winnow_df_bucket_expr() -> tuple[str, int]:
    """Integer log2 CASE ladder over fingerprint document frequency
    (the surprisal rarity-bucket trick: exact integer comparisons, no
    cross-engine float log): bucket k = smallest k with df <= 2^k,
    k in 0..log2(WINNOW_MAX_DF); anything beyond the cap lands in
    bucket kmax+1 — exactly the fingerprints the df cap drops."""
    kmax = WINNOW_MAX_DF.bit_length() - 1
    ladder = " ".join(f"WHEN df <= {1 << k} THEN {k}"
                      for k in range(kmax + 1))
    return f"CASE {ladder} ELSE {kmax + 1} END", kmax


_WINNOW_STATS_TAIL = """
    dfreq AS (
        SELECT fp, COUNT(*) AS df FROM fps GROUP BY fp
    )
    SELECT CAST(df_bucket AS BIGINT) AS df_bucket,
           CAST(MAX(df_le) AS BIGINT) AS df_le,
           CAST(COUNT(*) AS BIGINT) AS n_fps,
           CAST(SUM(df) AS BIGINT) AS fp_mass,
           CAST(MAX(df) AS BIGINT) AS max_df,
           CAST(MAX(dropped) AS BIGINT) AS dropped_by_cap
    FROM (SELECT df, {bucket} AS df_bucket,
                 CASE WHEN df <= {cap} THEN {cap_le} ELSE -1 END AS df_le,
                 CASE WHEN df > {cap} THEN 1 ELSE 0 END AS dropped
          FROM dfreq) _b
    GROUP BY df_bucket
"""


def _winnow_stats_tail() -> str:
    bucket, kmax = _winnow_df_bucket_expr()
    # df_le per bucket is min(2^bucket, cap) — but since the bucket is
    # already the group key, render it as a second ladder over df so
    # the relation stays a single projection.
    le_ladder = " ".join(f"WHEN df <= {1 << k} THEN {1 << k}"
                         for k in range(kmax + 1))
    return _WINNOW_STATS_TAIL.format(
        bucket=bucket, cap=WINNOW_MAX_DF,
        cap_le=f"CASE {le_ladder} END")


def winnow_fp_stats_sql(engine: str) -> str:
    """Winnowing cap observability (the lsh_bucket_stats analogue for
    the span-overlap family): fingerprint document-frequency
    distribution as an integer log2 histogram — per bucket the
    fingerprint count, total posting mass, max df, the bucket's upper
    bound (df_le; -1 for the over-cap bucket), and whether the
    WINNOW_MAX_DF cap drops it from the pair join.  At 100 TB this is
    the query run to tune the boilerplate cap before dedup: the
    over-cap bucket's fp_mass is exactly the posting volume the cap
    saves the join, and a fat tail just under the cap says the cap is
    too high.  Single grouped aggregation over the fingerprint
    relation; no pair join."""
    gh = _winnow_gram_hashes(engine)
    t = f"""
    WITH tk AS (
        SELECT doc_id, {render(TOKENS, engine)} AS tk FROM documents
        WHERE text IS NOT NULL
    ), ghs AS (
        SELECT doc_id, {gh} AS gh FROM tk
        WHERE {{alen}}(tk) >= {WINNOW_K}
    ), g AS (
        SELECT doc_id, pos, {{elem}}(gh, pos) AS h
        FROM (SELECT doc_id, gh,
                     {{explode}}({{seq}}(1, {{alen}}(gh))) AS pos
              FROM ghs) _p
    ), {_winnow_tail_sql()},
    {_winnow_stats_tail()}
    """
    return render(t, engine)


def winnow_fp_stats_fn(spark, sf_dir: str):
    """Spark strategy for winnow_fp_stats: same histogram, gram
    hashes via posexplode + window LEADs (the winnow_pairs_fn kernel —
    one (doc_id, pos) sort, no per-row array build).  Single consumer
    chain, so nothing is checkpointed; the fp shuffle key is the
    8-byte hash, never text."""
    from .text import render as _render
    with scoped_parser_mode(spark, "true"):
        read_spread(spark, f"{sf_dir}/documents.parquet") \
            .createOrReplaceTempView("documents")
        toks = _render(TOKENS, "spark")
        leads = ", ".join(f"lead(tok, {j}) OVER w"
                          for j in range(1, WINNOW_K))
        return spark.sql(f"""
        WITH toks AS (
            SELECT doc_id, posexplode({toks}) AS (pos, tok)
            FROM documents WHERE text IS NOT NULL
        ), g0 AS (
            SELECT doc_id, pos,
                   concat_ws(' ', tok, {leads}) AS gram,
                   lead(tok, {WINNOW_K - 1}) OVER w AS tlast
            FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ), g AS (
            -- posexplode positions are 0-based; the shared tail assumes
            -- the template's 1-based positions (winnow_pairs_fn note)
            SELECT doc_id, pos + 1 AS pos, {hash48('gram', 'spark')} AS h
            FROM g0 WHERE tlast IS NOT NULL
        ), {_winnow_tail_sql()},
        {_winnow_stats_tail()}
        """)


# ---------------------------------------------------------------------------
# exact substring-span dedup (the ExactSubstr operator)
# ---------------------------------------------------------------------------

SUBSTR_K = 5            # tokens per gram: every duplicated span of
                        # >= K tokens is detected EXACTLY (all of its
                        # K-grams repeat), shorter spans never


def _substr_grams(engine: str) -> str:
    """Positional SUBSTR_K-gram hash relation g(doc_id, pos, h) —
    the winnow gram kernel at K=SUBSTR_K (1-based positions)."""
    joined = ", ".join(f"tk[i{f'+{o}' if o else ''}]"
                       for o in range(SUBSTR_K))
    gram = f"concat_ws(' ', {joined})"
    if engine == "spark":
        body = ("{ltrans}({seq}(0, {alen}(tk) - %d), i -> %s)"
                % (SUBSTR_K, hash48(gram, engine)))
    else:
        body = ("{ltrans}({seq}(1, {alen}(tk) - %d), i -> %s)"
                % (SUBSTR_K - 1, hash48(gram, engine)))
    return render(body, engine)


_SUBSTR_CTES = """dp AS (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   COUNT(*) OVER (PARTITION BY h) AS occ
            FROM g) _o
        WHERE occ >= 2
    ), isl AS (
        SELECT doc_id, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY pos) AS grp
        FROM dp
    )"""

_SUBSTR_SELECT = f"""SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS start_pos,
           CAST(MAX(pos) + {SUBSTR_K - 1} AS BIGINT) AS end_pos,
           CAST(MAX(pos) - MIN(pos) + {SUBSTR_K} AS BIGINT) AS n_tokens
    FROM isl GROUP BY doc_id, grp"""

_SUBSTR_TAIL = f"""{_SUBSTR_CTES}
    {_SUBSTR_SELECT}
"""


def substring_spans_sql(engine: str) -> str:
    """EXACT substring-span dedup manifest (the ExactSubstr operator
    of Lee et al., "Deduplicating Training Data Makes Language Models
    Better", ACL'22): every token position whose SUBSTR_K-gram occurs
    >= 2 times ANYWHERE in the corpus (cross-document or repeated
    within a document) is a duplicated position; maximal runs of
    duplicated positions merge (gaps-and-islands) into spans
    [start_pos, end_pos] of >= SUBSTR_K tokens.  This is the exact
    counterpart of the approximate winnowing pairs: winnowing samples
    fingerprints to find WHICH documents share spans; this emits the
    exact span boundaries a removal pass would cut.

    No pair join exists anywhere — duplication is a per-gram
    occurrence count and the rest is per-document windowing, so
    nothing in the plan can go quadratic in corpus size (contrast the
    df-capped winnow pair join).  The template's occurrence count is
    a window over the gram hash; the Spark strategy replaces it with
    a partial-aggregation groupBy + semi-join (substring_spans_fn)
    because a window partition is a single task per key — a
    boilerplate gram with df ~ 1e9 at 100 TB would hot-spot, while
    partial aggregation combines map-side and AQE splits any skewed
    join key."""
    t = f"""
    WITH tk AS (
        SELECT doc_id, {render(TOKENS, engine)} AS tk FROM documents
        WHERE text IS NOT NULL
    ), ghs AS (
        SELECT doc_id, {_substr_grams(engine)} AS gh FROM tk
        WHERE {{alen}}(tk) >= {SUBSTR_K}
    ), g AS (
        SELECT doc_id, pos, {{elem}}(gh, pos) AS h
        FROM (SELECT doc_id, gh,
                     {{explode}}({{seq}}(1, {{alen}}(gh))) AS pos
              FROM ghs) _p
    ), {_SUBSTR_TAIL}
    """
    return render(t, engine)


def _substr_gram_df(spark, source: str):
    """Positional SUBSTR_K-gram hash relation (doc_id, pos, h) over
    ``source`` (a documents-schema view): posexplode + window LEADs —
    one (doc_id, pos) sort, the winnow kernel.  Caller owns the
    parser-mode scope.  Shared by the full-corpus span pass and the
    incremental gram-store write/probe (VERDICT r14 ask 5), so the
    store and its probes hash grams IDENTICALLY by construction."""
    from .text import render as _render
    toks = _render(TOKENS, "spark")
    leads = ", ".join(f"lead(tok, {j}) OVER w"
                      for j in range(1, SUBSTR_K))
    return spark.sql(f"""
    WITH toks AS (
        SELECT doc_id, posexplode({toks}) AS (pos, tok)
        FROM {source} WHERE text IS NOT NULL
    ), g0 AS (
        SELECT doc_id, pos,
               concat_ws(' ', tok, {leads}) AS gram,
               lead(tok, {SUBSTR_K - 1}) OVER w AS tlast
        FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    )
    SELECT doc_id, pos + 1 AS pos, {hash48('gram', 'spark')} AS h
    FROM g0 WHERE tlast IS NOT NULL
    """)


def substring_spans_fn(spark, sf_dir: str):
    """Spark execution strategy for dedup_exact_substrings: identical
    output to substring_spans_sql, but (a) gram hashes form via
    posexplode + window LEADs (one (doc_id, pos) sort — the winnow
    kernel), and (b) the per-gram occurrence count is a groupBy
    (map-side partial aggregation) whose >= 2 survivors are
    localCheckpointed ONCE and semi-joined back — the duplicated-gram
    relation is the small side in real corpora, Spark would otherwise
    re-run the whole tokenize+gram pipeline for both consumers, and a
    hash-window would serialize each hot gram into one task.

    r16 (optimization round, guide §2.4): the gram relation itself is
    ALSO checkpointed — it feeds both the dup aggregation and the
    duplicated-position semi-join, and without the materialization
    Spark inlined the tokenize + posexplode + window + md5 pipeline
    into BOTH consumers (two full corpus passes per entry run)."""
    with scoped_parser_mode(spark, "true"):
        read_spread(spark, f"{sf_dir}/documents.parquet") \
            .createOrReplaceTempView("documents")
        g = _substr_gram_df(spark, "documents").localCheckpoint()
        g.createOrReplaceTempView("__substr_g")
        dup = spark.sql("""
            SELECT h FROM __substr_g GROUP BY h HAVING COUNT(*) >= 2
        """).localCheckpoint()
        dup.createOrReplaceTempView("__substr_dup")
        return spark.sql(f"""
        WITH dp AS (
            SELECT g.doc_id, g.pos
            FROM __substr_g g
            WHERE g.h IN (SELECT h FROM __substr_dup)
        ), isl AS (
            SELECT doc_id, pos,
                   pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY pos) AS grp
            FROM dp
        )
        SELECT doc_id,
               CAST(MIN(pos) AS BIGINT) AS start_pos,
               CAST(MAX(pos) + {SUBSTR_K - 1} AS BIGINT) AS end_pos,
               CAST(MAX(pos) - MIN(pos) + {SUBSTR_K} AS BIGINT) AS n_tokens
        FROM isl GROUP BY doc_id, grp
        """)


def _substr_stats_tail(engine: str) -> str:
    return f"""{_SUBSTR_CTES}, spans AS (
        {_SUBSTR_SELECT}
    ), per_doc AS (
        SELECT doc_id, SUM(n_tokens) AS dup_tokens,
               COUNT(*) AS n_spans, MAX(n_tokens) AS max_span
        FROM spans GROUP BY doc_id
    ), doc_mass AS (
        SELECT doc_id, {{alen}}({render(TOKENS, engine)}) AS n_toks
        FROM documents WHERE text IS NOT NULL
    )
    SELECT CAST(COUNT(p.doc_id) AS BIGINT) AS docs_with_spans,
           CAST(COUNT(*) AS BIGINT) AS docs_total,
           CAST(COALESCE(SUM(p.n_spans), 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(SUM(p.dup_tokens), 0) AS BIGINT)
               AS dup_tokens,
           CAST(COALESCE(MAX(p.max_span), 0) AS BIGINT) AS max_span,
           CAST(SUM(m.n_toks) AS BIGINT) AS total_tokens
    FROM doc_mass m LEFT JOIN per_doc p ON p.doc_id = m.doc_id
"""


def substring_apply_sql(engine: str) -> str:
    """EXACT substring removal with KEEP-FIRST semantics (the apply
    step of Lee et al.'s ExactSubstr): the corpus-wide first
    occurrence — minimal (doc_id, pos) — of every duplicated
    SUBSTR_K-gram is canonical and kept; every other occurrence's
    covered tokens [p, p+K-1] are removed, and the cleaned text is
    the remaining tokens re-joined in order.  A doc that repeats a
    phrase internally keeps only its first copy; a doc repeating
    another doc's earlier phrase loses all its copies.

    Output: (doc_id, n_tokens, n_removed, cleaned_text) — string-
    exact on both engines because tokenization is the shared
    normalized split and the re-join is order-pinned.

    Scale: canonical selection is one per-gram MIN (a window in this
    template; the hot-key-safe groupBy twin would follow the
    substring_spans_fn pattern); covered positions explode exactly K
    rows per non-canonical duplicated gram (linear); the re-join is a
    per-doc ordered aggregation.  No pair join anywhere."""
    if engine == "spark":
        rejoin = ("concat_ws(' ', transform(array_sort(collect_list("
                  "CASE WHEN r.pos IS NULL THEN "
                  "named_struct('pos', t.pos, 'tok', t.tok) END)), "
                  "x -> x.tok))")
    else:
        rejoin = ("COALESCE(string_agg(t.tok, ' ' ORDER BY t.pos) "
                  "FILTER (WHERE r.pos IS NULL), '')")
    t = f"""
    WITH tk AS (
        SELECT doc_id, {render(TOKENS, engine)} AS tk FROM documents
        WHERE text IS NOT NULL
    ), toks AS (
        SELECT doc_id, pos, {{elem}}(tk, pos) AS tok
        FROM (SELECT doc_id, tk,
                     {{explode}}({{seq}}(1, {{alen}}(tk))) AS pos
              FROM tk) _t
    ), ghs AS (
        SELECT doc_id, {_substr_grams(engine)} AS gh FROM tk
        WHERE {{alen}}(tk) >= {SUBSTR_K}
    ), g AS (
        SELECT doc_id, pos, {{elem}}(gh, pos) AS h
        FROM (SELECT doc_id, gh,
                     {{explode}}({{seq}}(1, {{alen}}(gh))) AS pos
              FROM ghs) _p
    ), ranked AS (
        SELECT doc_id, pos,
               COUNT(*) OVER (PARTITION BY h) AS occ,
               ROW_NUMBER() OVER (PARTITION BY h
                                  ORDER BY doc_id, pos) AS rk
        FROM g
    ), removed AS (
        SELECT DISTINCT doc_id, cov AS pos
        FROM (SELECT doc_id,
                     {{explode}}({{seq}}(pos, pos + {SUBSTR_K - 1}))
                         AS cov
              FROM ranked WHERE occ >= 2 AND rk > 1) _c
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(r.pos) AS BIGINT) AS n_removed,
           {rejoin} AS cleaned_text
    FROM toks t
    LEFT JOIN removed r ON r.doc_id = t.doc_id AND r.pos = t.pos
    GROUP BY t.doc_id
    """
    return render(t, engine)


def substring_stats_sql(engine: str) -> str:
    """Corpus-level observability for the ExactSubstr manifest (the
    winnow_fp_stats convention): how much of the corpus is inside
    duplicated spans — docs affected, span count, duplicated-token
    mass vs total token mass, largest span.  The number a 100 TB
    operator watches to decide whether substring dedup is worth a
    removal pass, without materializing the manifest."""
    t = f"""
    WITH tk AS (
        SELECT doc_id, {render(TOKENS, engine)} AS tk FROM documents
        WHERE text IS NOT NULL
    ), ghs AS (
        SELECT doc_id, {_substr_grams(engine)} AS gh FROM tk
        WHERE {{alen}}(tk) >= {SUBSTR_K}
    ), g AS (
        SELECT doc_id, pos, {{elem}}(gh, pos) AS h
        FROM (SELECT doc_id, gh,
                     {{explode}}({{seq}}(1, {{alen}}(gh))) AS pos
              FROM ghs) _p
    ), {_substr_stats_tail(engine)}
    """
    return render(t, engine)


# ---------------------------------------------------------------------------
# incremental dedup: new batch vs existing corpus
# ---------------------------------------------------------------------------

INCOMING_MOD = 10
INCOMING_RES = 8        # doc_id % 10 >= 8 stands in for the new batch


def _incremental_tail(mod: int, res: int) -> str:
    """Asymmetric band probe over ``bands``: incoming docs join only
    EXISTING-side buckets (sized on the existing side; over-cap
    buckets degrade to the min-existing-doc representative, the same
    star policy as the symmetric join). Engine-portable as-is."""
    return f"""ex AS (
        SELECT doc_id, band, key FROM bands
        WHERE doc_id % {mod} < {res}
    ), inc AS (
        SELECT doc_id, band, key FROM bands
        WHERE doc_id % {mod} >= {res}
    ), sized AS (
        SELECT band, key, COUNT(*) AS n, MIN(doc_id) AS rep
        FROM ex GROUP BY band, key
    ), cand AS (
        SELECT i.doc_id AS new_doc, e.doc_id AS dup_of
        FROM inc i
        JOIN sized s ON s.band = i.band AND s.key = i.key
                    AND s.n <= {MAX_BUCKET}
        JOIN ex e ON e.band = i.band AND e.key = i.key
        UNION
        SELECT i.doc_id AS new_doc, s.rep AS dup_of
        FROM inc i
        JOIN sized s ON s.band = i.band AND s.key = i.key
                    AND s.n > {MAX_BUCKET}
    )
    SELECT new_doc AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_corpus_matches,
           MIN(dup_of) AS dup_of
    FROM cand GROUP BY new_doc"""


def dedup_incremental_sql(engine: str, mod: int = INCOMING_MOD,
                          res: int = INCOMING_RES) -> str:
    """Incremental (one-sided) dedup — the shape every production
    ingest actually runs: a NEW batch is admitted against the
    EXISTING corpus, never re-deduplicating the corpus against
    itself.  doc_id % {mod} >= {res} stands in for the batch; a real
    deployment reads the batch from its landing table and the
    PRE-COMPUTED corpus signature store (signatures are append-only:
    this round's admitted batch becomes next round's corpus rows).

    Output: one row per flagged incoming doc with its distinct
    corpus-match count and the minimum matching corpus doc (the
    canonical it duplicates) — the admission-filter verdict list.

    Scale shape vs the symmetric self-join: the probe join is
    |batch| x bands against bucketed corpus keys — batch-sized, not
    corpus-sized; corpus-side buckets carry the same MAX_BUCKET
    star-degrade so a boilerplate bucket costs each incoming doc one
    representative row, never |bucket| rows.  Candidates here are
    band-collision verdicts (the lsh_verified gram-Jaccard stage
    applies downstream unchanged when exactness matters)."""
    sig = minhash_signature_sql(engine)
    n_bands = MINHASH_K // BAND_SIZE
    t = f"""
    WITH sig AS ({sig}),
    {_band_expand_clause('sig', n_bands, BAND_SIZE)},
    {_incremental_tail(mod, res)}
    """
    return render(t, engine)


def dedup_incremental_fn(spark, sf_dir: str, mod: int = INCOMING_MOD,
                         res: int = INCOMING_RES):
    """Spark strategy: signature materialized once (the
    minhash_lsh_pairs_fn lesson — the CTE form would recompute the
    shingle/md5 pipeline for the ex/inc/sized references), then the
    asymmetric probe SQL.  r16: the signature comes from the
    vectorized md5 Arrow kernel (bit-identical to the HOF template;
    see minhash_lsh_pairs_fn)."""
    with scoped_parser_mode(spark, "true"):
        vectorized_signature_view(spark, sf_dir, "__mhinc_sig")
        n_bands = MINHASH_K // BAND_SIZE
        return spark.sql(f"""
        WITH {_band_expand_clause('__mhinc_sig', n_bands, BAND_SIZE)},
        {_incremental_tail(mod, res)}
        """)


# ---------------------------------------------------------------------------
# persistent signature store (the production incremental-dedup flow)
# ---------------------------------------------------------------------------

def signature_store_write(spark, docs_df, store_path: str,
                          mode: str = "overwrite") -> None:
    """Compute MinHash signatures for ``docs_df`` (documents schema)
    and persist them as the parquet SIGNATURE STORE — the append-only
    corpus-side state of incremental dedup. Signatures are |docs| x
    (1 + K) longs: the store for a 100 TB corpus is ~1/1000th of the
    text and is the ONLY thing future batches ever read — the corpus
    text is never re-tokenized."""
    from .storecache import store_lock

    # r16: vectorized md5 kernel signature (bit-identical to the HOF
    # template; see minhash_lsh_pairs_fn) — the store for a given
    # corpus is byte-for-byte what the SQL form wrote.  r17: the
    # parquet write is the signature's ONLY consumer, so it computes
    # inside the write action (no pre-write checkpoint barrier).
    sig = vectorized_signature_df(docs_df, materialize=False)
    # shared mutation lock: an append landing while a compaction is
    # between its snapshot and its swap would be silently destroyed
    # by the swap (storecache.store_lock) — serialize writers only;
    # probes never lock
    with store_lock(store_path, exclusive=False):
        sig.write.mode(mode).parquet(store_path)


def signature_store_compact(spark, store_path: str,
                            rows_per_file: int = 4_000_000) -> dict:
    """Compact the append-only signature store (VERDICT r10 ask 8):
    every admitted micro-batch appends a handful of parquet files, and
    the documented at-least-once crash-replay contract can append the
    SAME batch twice — so at 100 TB the store itself becomes a corpus
    of small files carrying duplicate rows.  Compaction = DISTINCT over
    whole rows (replay duplicates are bit-identical: signatures are
    deterministic functions of the text) + re-bucket to
    ``ceil(rows / rows_per_file)`` files hash-partitioned on doc_id +
    atomic directory swap (storecache.replace_store).

    DECISION-INVARIANT by construction: the probe's ``dup_of`` is a
    MIN over candidate doc_ids, bucket degrade reps are MIN(doc_id),
    and the candidate CTE's UNION is a set union — so duplicate store
    rows never changed ANY verdict column to begin with, and removing
    them is purely physical (tests/test_store_compaction.py pins the
    probe output bit-identical pre-compact, post-compact, and vs a
    from-scratch store).  Returns
    ``{rows_before, rows_after, files_before, files_after}``."""
    from .storecache import replace_store, store_lock

    # the EXCLUSIVE lock covers snapshot AND swap: locking only the
    # swap lets a concurrent shared-lock append land between this
    # snapshot and the swap and be destroyed by it (caught by the
    # live-admission e2e — fork A lost epoch-1's signatures)
    with store_lock(store_path, exclusive=True):
        df = spark.read.parquet(store_path)
        files_before = len(df.inputFiles())
        rows_before = df.count()
        # materialize BEFORE the swap: the plan reads the directory
        # the swap is about to replace
        compacted = df.distinct().localCheckpoint()
        rows_after = compacted.count()
        n_files = max(1, -(-rows_after // rows_per_file))
        replace_store(store_path, lambda tmp: compacted
                      .repartition(n_files, "doc_id")
                      .write.parquet(tmp), pre_locked=True)
    return {"rows_before": rows_before, "rows_after": rows_after,
            "files_before": files_before,
            "files_after": len(
                spark.read.parquet(store_path).inputFiles())}


def signature_store_evict(spark, store_path: str,
                          drop_where: str) -> dict:
    """Evict signatures matching the SQL predicate ``drop_where``
    (e.g. ``"doc_id IN (...)"`` for takedowns, or a range predicate
    for retention) from the persisted store, with the same
    materialize-then-atomic-swap discipline as compaction.  Unlike
    compaction this DELIBERATELY changes future decisions: batches
    duplicating an evicted doc stop being flagged — that is the point
    (right-to-be-forgotten / retention); everything else is untouched
    (pinned by tests)."""
    from .storecache import replace_store, store_lock

    with store_lock(store_path, exclusive=True):
        df = spark.read.parquet(store_path)
        rows_before = df.count()
        kept = df.where(f"NOT ({drop_where})").localCheckpoint()
        rows_after = kept.count()
        replace_store(store_path,
                      lambda tmp: kept.write.parquet(tmp),
                      pre_locked=True)
    return {"rows_before": rows_before, "rows_after": rows_after,
            "evicted": rows_before - rows_after}


def dedup_incremental_against_store(spark, store_path: str, batch_df,
                                    admit: bool = False):
    """Probe a NEW batch against the persisted signature store: only
    the batch is tokenized (corpus signatures come straight off
    parquet), the probe is the same asymmetric band join as
    dedup_incremental (corpus-side MAX_BUCKET star-degrade), and with
    ``admit=True`` the CLEAN batch docs' signatures are APPENDED to
    the store — the next batch then dedups against them too, which is
    the whole append-only contract. Returns the verdict DataFrame
    (doc_id, n_corpus_matches, dup_of) for flagged batch docs.

    Scale: one batch-sized signature job, one batch-sized band probe
    against bucketed store keys, one batch-sized append. Nothing is
    ever recomputed over the corpus."""
    with scoped_parser_mode(spark, "true"):
        # r16: vectorized md5 kernel for the batch signature
        # (bit-identical to the HOF template; see minhash_lsh_pairs_fn).
        # r17 negative result, kept ON the checkpoint: computing the
        # signature inside the verdicts action (materialize=False) was
        # measured 2.0-2.6 s vs 1.5-1.8 s with the checkpoint — the
        # probe's cand UNION references ``inc`` twice, so the CTE
        # inlining re-runs the Arrow kernel per reference and the
        # double evaluation costs more than the barrier it saves.
        batch_sig = vectorized_signature_df(batch_df)
        batch_sig.createOrReplaceTempView("__inc_batch_sig")
        # read_store (r16): listing-keyed relation memo — the probe
        # re-resolves the store only when its file set actually changed
        read_store(spark, store_path) \
            .createOrReplaceTempView("__inc_store_sig")
        n_bands = MINHASH_K // BAND_SIZE
        verdicts = spark.sql(f"""
        WITH {_band_expand_clause('__inc_store_sig', n_bands, BAND_SIZE)},
        ex AS (SELECT doc_id, band, key FROM bands),
        {_band_expand_clause('__inc_batch_sig', n_bands, BAND_SIZE,
                             cte_name='inc_bands')},
        inc AS (SELECT doc_id, band, key FROM inc_bands),
        sized AS (
            SELECT band, key, COUNT(*) AS n, MIN(doc_id) AS rep
            FROM ex GROUP BY band, key
        ), cand AS (
            SELECT i.doc_id AS new_doc, e.doc_id AS dup_of
            FROM inc i
            JOIN sized s ON s.band = i.band AND s.key = i.key
                        AND s.n <= {MAX_BUCKET}
            JOIN ex e ON e.band = i.band AND e.key = i.key
            UNION
            SELECT i.doc_id AS new_doc, s.rep AS dup_of
            FROM inc i
            JOIN sized s ON s.band = i.band AND s.key = i.key
                        AND s.n > {MAX_BUCKET}
        )
        SELECT new_doc AS doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_corpus_matches,
               MIN(dup_of) AS dup_of
        FROM cand GROUP BY new_doc
        """).localCheckpoint()
        if admit:
            # WITHIN-batch near-duplicates must not all be admitted: two
            # new docs duplicating each other (but nothing in the store)
            # produce no verdicts, and admitting both would plant a
            # permanent duplicate pair no future probe can ever flag
            # (code-review r7). A batch-internal band self-join excludes
            # every doc that collides with a SMALLER batch doc — the
            # min-doc representative of each candidate group is admitted,
            # consistent with the candidate-level semantics of the store
            # probe itself.
            intra = spark.sql(f"""
            WITH {_band_expand_clause('__inc_batch_sig', n_bands,
                                      BAND_SIZE)}
            SELECT DISTINCT b.doc_id
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.key = b.key
             AND a.doc_id < b.doc_id
            """)
            excluded = verdicts.select("doc_id").union(intra)
            clean_sig = batch_sig.join(excluded, "doc_id", "left_anti")
            clean_sig.write.mode("append").parquet(store_path)
        return verdicts


def dedup_incremental_store_entry_fn(spark, sf_dir: str,
                                     mod: int = INCOMING_MOD,
                                     res: int = INCOMING_RES):
    """Registry/bench twin of dedup_incremental probing the PERSISTED
    signature store — the amortized production shape (VERDICT r7 ask
    6): the corpus-side store is built once per fixture (keyed by the
    documents file's identity) and REUSED across runs, so the measured
    cost is the batch-sized probe, not the corpus signature recompute
    the harness-shaped entry (dedup_incremental) pays every run.
    Value-identical to dedup_incremental_sql: the store holds exactly
    the corpus docs' signatures, the probe is the same asymmetric band
    join."""
    import hashlib
    import os

    from .storecache import publish_store, store_path

    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    # key on the fixture's FULL identity (absolute path + ns mtime +
    # size), not its basename + whole-second mtime — two fixtures
    # sharing a basename regenerated within the same second must not
    # collide (code-review r8).  The store lives in the per-user 0700
    # cache (ADVICE r8: the old world-shared /tmp path was
    # pre-creatable by other users and accumulated stale stores);
    # store_path() evicts superseded fixture identities.
    ident = hashlib.sha1(
        f"{os.path.abspath(src)}|{st.st_mtime_ns}|{st.st_size}"
        f"|{mod}|{res}".encode()).hexdigest()[:16]
    store = store_path("sig", ident)
    docs = read_spread(spark, src)
    publish_store(store, lambda tmp: signature_store_write(
        spark, docs.where(f"doc_id % {mod} < {res}"), tmp))
    return dedup_incremental_against_store(
        spark, store, docs.where(f"doc_id % {mod} >= {res}"))


# ---------------------------------------------------------------------------
# incremental ExactSubstr: persisted 5-gram occurrence store
# (VERDICT r14 ask 5 — the substring-span family's production flow)
# ---------------------------------------------------------------------------

def gram_store_write(spark, docs_df, store_path: str,
                     mode: str = "overwrite") -> None:
    """Tokenize ``docs_df`` (documents schema) ONCE and persist its
    per-gram occurrence counts ``(h, n_occ)`` as the parquet 5-GRAM
    STORE — the corpus-side state of incremental ExactSubstr.  The
    store for a 100 TB corpus is one row per DISTINCT gram (bounded
    by token count / K, in practice far smaller), and future batches
    read only it — the corpus text is never re-tokenized.

    Append-only contract: admitted batches append their own (h,
    n_occ) rows; the probe tests PRESENCE of h (any corpus
    occurrence makes a batch position duplicated), so replayed or
    duplicate h rows can never change a verdict — the same
    decision-invariance argument as signature_store_compact.  Writers
    take the shared storecache lock (appends of distinct batches
    commute; a compaction would take it exclusively)."""
    from .storecache import store_lock

    docs_df.createOrReplaceTempView("__substr_store_in")
    with scoped_parser_mode(spark, "true"):
        g = _substr_gram_df(spark, "__substr_store_in")
        counts = g.groupBy("h").count().withColumnRenamed(
            "count", "n_occ")
        with store_lock(store_path, exclusive=False):
            counts.write.mode(mode).parquet(store_path)


_SUBSTR_ISL_SELECT = f"""SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS start_pos,
           CAST(MAX(pos) + {SUBSTR_K - 1} AS BIGINT) AS end_pos,
           CAST(MAX(pos) - MIN(pos) + {SUBSTR_K} AS BIGINT) AS n_tokens
    FROM isl GROUP BY doc_id, grp"""


def substring_probe_against_store(spark, store_path: str, batch_df,
                                  admit: bool = False):
    """Probe a NEW batch against the persisted 5-gram store: only the
    batch is tokenized, a batch position is duplicated iff its gram
    is PRESENT in the store (>= 1 corpus occurrence makes the global
    count >= 2) OR occurs >= 2 times WITHIN the batch (two new docs
    sharing a phrase the corpus has never seen are still mutual
    duplicates — the intra-batch analogue of the admission guard in
    dedup_incremental_against_store), and maximal runs of duplicated
    positions merge into spans exactly as in substring_spans_sql.

    With ``admit=True`` the batch's own gram counts are APPENDED to
    the store (shared lock) — ExactSubstr admits every doc (spans are
    removal instructions, not rejections), so the next batch dedups
    against ALL of this batch's grams, which is the append-only
    contract.

    Returns (doc_id, start_pos, end_pos, n_tokens) for batch docs.
    Scale: one batch-sized tokenize, one batch-sized hash join
    against the store's distinct gram hashes (8-byte keys — never
    text), one per-doc window; nothing corpus-sized recomputes."""
    from .storecache import store_lock

    with scoped_parser_mode(spark, "true"):
        batch_df.createOrReplaceTempView("__substr_batch_in")
        g = _substr_gram_df(spark, "__substr_batch_in").localCheckpoint()
        g.createOrReplaceTempView("__substr_batch_g")
        read_store(spark, store_path).createOrReplaceTempView(
            "__substr_store_g")
        spans = spark.sql(f"""
        WITH hits AS (
            SELECT DISTINCT h FROM (
                SELECT h FROM __substr_store_g
                UNION ALL
                SELECT h FROM __substr_batch_g
                GROUP BY h HAVING COUNT(*) >= 2
            ) _u
        ), dp AS (
            SELECT g.doc_id, g.pos
            FROM __substr_batch_g g JOIN hits ON hits.h = g.h
        ), isl AS (
            SELECT doc_id, pos,
                   pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY pos) AS grp
            FROM dp
        )
        {_SUBSTR_ISL_SELECT}
        """).localCheckpoint()
        if admit:
            batch_counts = spark.sql("""
                SELECT h, COUNT(*) AS n_occ
                FROM __substr_batch_g GROUP BY h
            """)
            with store_lock(store_path, exclusive=False):
                batch_counts.write.mode("append").parquet(store_path)
        return spans


def substring_incremental_sql(engine: str, mod: int = INCOMING_MOD,
                              res: int = INCOMING_RES) -> str:
    """Oracle template for substring_incremental: because a batch
    position is duplicated iff its gram's GLOBAL (corpus + batch)
    occurrence count is >= 2 — presence in the corpus OR an
    intra-batch repeat both reduce to that — the incremental probe's
    output equals the full symmetric span pass restricted to batch
    docs.  One closed form serves both engines; the Spark strategy
    computes it batch-sized against the persisted store."""
    t = f"""
    WITH tk AS (
        SELECT doc_id, {render(TOKENS, engine)} AS tk FROM documents
        WHERE text IS NOT NULL
    ), ghs AS (
        SELECT doc_id, {_substr_grams(engine)} AS gh FROM tk
        WHERE {{alen}}(tk) >= {SUBSTR_K}
    ), g AS (
        SELECT doc_id, pos, {{elem}}(gh, pos) AS h
        FROM (SELECT doc_id, gh,
                     {{explode}}({{seq}}(1, {{alen}}(gh))) AS pos
              FROM ghs) _p
    ), dp AS (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   COUNT(*) OVER (PARTITION BY h) AS occ
            FROM g) _o
        WHERE occ >= 2 AND doc_id % {mod} >= {res}
    ), isl AS (
        SELECT doc_id, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY pos) AS grp
        FROM dp
    )
    {_SUBSTR_ISL_SELECT}
    """
    return render(t, engine)


def substring_incremental_store_entry_fn(spark, sf_dir: str,
                                         mod: int = INCOMING_MOD,
                                         res: int = INCOMING_RES):
    """Registry/bench twin: the corpus-side gram store is built once
    per fixture identity (same keying and per-user 0700 cache as the
    signature store) and REUSED across runs, so the measured cost is
    the batch-sized probe — the amortized production shape of the
    substring family, mirroring dedup_incremental_against_store."""
    import hashlib
    import os

    from .storecache import publish_store, store_path

    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    ident = hashlib.sha1(
        f"{os.path.abspath(src)}|{st.st_mtime_ns}|{st.st_size}"
        f"|{mod}|{res}".encode()).hexdigest()[:16]
    store = store_path("substrgrams", ident)
    docs = read_spread(spark, src)
    publish_store(store, lambda tmp: gram_store_write(
        spark, docs.where(f"doc_id % {mod} < {res}"), tmp))
    return substring_probe_against_store(
        spark, store, docs.where(f"doc_id % {mod} >= {res}"))
