"""Session-conf scoping (VERDICT r12 "What's wrong #4"): every
parser-mode toggle in the library is build-scoped — an entry or
library call must leave spark.sql.parser.escapedStringLiterals
exactly as found, so callers outside the registry never inherit a
parse mode another operator happened to set last."""

import pytest

from harbourbridge_spark import queries as Q
from harbourbridge_spark.confscope import (PARSER_KEY, scoped_conf,
                                           scoped_parser_mode)

SF = "/root/testdata/sf0.001"

# one representative per formerly-leaking family: template runner,
# checkpointing strategy fns, iterative (BPE), store-backed, DSIR
PROBE_ENTRIES = [
    "quality_classifier",        # _run_template
    "decontaminate",             # strategy fn with checkpoint
    "bpe_apply",                 # iterative + the latent '\\s+' bug
    "dsir_importance",           # localCheckpoint strategy
    "dedup_exact",               # dedup family
    "line_dedup_ccnet",          # cleaning family
]


def test_scoped_conf_restores_set_and_unset(spark):
    spark.conf.set(PARSER_KEY, "false")
    with scoped_parser_mode(spark, "true"):
        assert spark.conf.get(PARSER_KEY) == "true"
    assert spark.conf.get(PARSER_KEY) == "false"
    with scoped_conf(spark, "spark.zz.test.key", "1"):
        assert spark.conf.get("spark.zz.test.key") == "1"
    with pytest.raises(Exception):
        spark.conf.get("spark.zz.test.key")


@pytest.mark.parametrize("name", PROBE_ENTRIES)
def test_entries_leave_parser_mode_as_found(spark, name):
    if name not in Q.REGISTRY:
        pytest.skip(f"{name} not registered")
    spark.conf.set(PARSER_KEY, "false")       # adversarial baseline
    try:
        df = Q.REGISTRY[name].fn(spark, SF)
        assert df.count() >= 0                # build AND execute
        assert spark.conf.get(PARSER_KEY) == "false"
    finally:
        spark.conf.unset(PARSER_KEY)
