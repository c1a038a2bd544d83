"""DSIR importance-selection semantics: documents that LOOK like the
target slice must outscore documents that don't, regardless of their
own lang label — the sign structure of the paper's log ratio,
preserved by the integer rarity-ladder quantization."""

from harbourbridge_spark.pipeline import dsir
from harbourbridge_spark.pipeline.text import render


def _docs_view(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long")
    df.createOrReplaceTempView("documents")
    return df


def test_dsir_target_lookalike_outscores_offtarget(spark):
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    # target slice (lang='en'): heavy in 'alpha beta gamma'
    rows = [(i, "alpha beta gamma alpha beta", "en", "s", 20)
            for i in range(8)]
    # raw-only doc that MIMICS the target vocabulary, and an
    # EQUAL-LENGTH raw-only doc with vocabulary the target never
    # uses (scores are occurrence sums — like the paper's
    # unnormalized weights — so only equal-gram-mass docs compare)
    rows.append((100, "alpha beta gamma", "fr", "s", 15))
    rows.append((101, "zeta eta theta", "fr", "s", 14))
    _docs_view(spark, rows)
    got = {r.doc_id: (r.score, r.n_grams) for r in spark.sql(
        render(dsir.dsir_importance_sql("spark"), "spark")).collect()}
    assert got[100][1] == got[101][1]          # same gram mass
    assert got[100][0] > got[101][0], got


def test_dsir_select_mean_cutoff(spark, tmp_path):
    """fn strategy vs the shared-template semantics: selected == 1
    iff score*n >= total, and the fn's output matches a direct
    recomputation from dsir_importance."""
    import pyspark.sql.functions as F
    rows = [(i, "alpha beta gamma", "en", "s", 15) for i in range(6)]
    rows += [(10, "alpha beta gamma", "de", "s", 15),
             (11, "zeta eta theta", "de", "s", 14)]
    df = _docs_view(spark, rows)
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    sel = dsir.dsir_select_fn(spark, str(tmp_path)).collect()
    n = len(sel)
    total = sum(r.score for r in sel)
    for r in sel:
        assert r.selected == (1 if r.score * n >= total else 0), r
    by_id = {r.doc_id: r.selected for r in sel}
    assert by_id[10] == 1 and by_id[11] == 0, by_id
