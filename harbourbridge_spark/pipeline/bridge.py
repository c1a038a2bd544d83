"""Migration -> corpus bridge: turn MIGRATED relational tables into
the ``documents`` corpus schema the LLM-data pipeline consumes
(dedup / curation / ANN / packing), closing the product loop — a user
migrates a dump with the engine, then trains on it with the pipeline,
without an intermediate ETL step.

Row-to-document semantics (the widely used "linearize a table row as
text" recipe for structured-data pretraining): each row becomes one
document whose text is ``col1 val1 col2 val2 ...`` over the chosen
columns, ``doc_id`` is the table's integer key, ``source`` the table
name — so corpus-level lineage (which table did this near-dup come
from?) falls out of the existing source_stats/drift operators for
free.

Scale shape: one narrow projection per table (column pruning reaches
the parquet scan), a union, no shuffle at all — downstream operators
impose their own (documented) shuffle shapes.
"""

from __future__ import annotations

from ..confscope import scoped_parser_mode
from ..scan import read_cached

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def documents_from_table(df: DataFrame, key_col: str, source: str,
                         text_cols: list[str],
                         lang: str = "und") -> DataFrame:
    """One migrated table -> documents rows.  ``text`` interleaves
    column names with rendered values (NULL -> the literal word
    "null", so missingness is part of the text the quality/dedup
    operators see)."""
    parts = []
    for c in text_cols:
        parts.append(F.lit(c))
        parts.append(F.coalesce(F.col(c).cast("string"),
                                F.lit("null")))
    return df.select(
        F.col(key_col).cast("long").alias("doc_id"),
        F.lit(source).alias("source"),
        F.lit(lang).alias("lang"),
        F.concat_ws(" ", *parts).alias("text"))


def documents_from_tables(spark: SparkSession,
                          tables: dict[str, tuple[DataFrame, str,
                                                  list[str]]],
                          id_stride: int = 1 << 40) -> DataFrame:
    """Union several tables into one corpus.  Each table's doc_ids are
    offset into its own ``id_stride`` band (table index * stride +
    key), so ids stay unique across tables and the band recovers the
    source table arithmetically — the same banding trick the synthetic
    PK generator uses for cross-shard uniqueness."""
    out = None
    for i, (name, (df, key_col, text_cols)) in enumerate(
            sorted(tables.items())):
        docs = documents_from_table(df, key_col, name, text_cols)
        docs = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * id_stride))
        out = docs if out is None else out.unionByName(docs)
    if out is None:
        raise ValueError("no tables given")
    return out


# the two fixture tables the oracle entry bridges (integer + string
# columns only: their cast-to-string renderings are engine-identical;
# doubles/timestamps are NOT — the repo's oracle-parity rule)
_ENTRY_TABLES = {
    "orders": ("o_orderkey", ["o_orderkey", "o_custkey",
                              "o_orderstatus", "o_orderpriority"]),
    "supplier": ("s_suppkey", ["s_suppkey", "s_name", "s_nationkey"]),
}
_ID_STRIDE = 1 << 40


def _docs_cte(engine: str) -> str:
    """The bridge's text assembly as SQL — the DuckDB oracle twin of
    documents_from_table (names interleaved with values, NULL ->
    'null', ids banded by table index)."""
    vcast = "STRING" if engine == "spark" else "VARCHAR"
    selects = []
    for i, (name, (key, cols)) in enumerate(sorted(
            _ENTRY_TABLES.items())):
        parts = ", ".join(
            f"'{c}', COALESCE(CAST({c} AS {vcast}), 'null')"
            for c in cols)
        selects.append(
            f"SELECT CAST({key} AS BIGINT) + {i * _ID_STRIDE} "
            f"AS doc_id, '{name}' AS source, "
            f"concat_ws(' ', {parts}) AS text FROM {name}")
    return " UNION ALL ".join(selects)


def corpus_from_relational_sql(engine: str) -> str:
    """Per-document token count + 48-bit content fingerprint over the
    bridged corpus — the projection every downstream dedup/curation
    operator starts from, proving migrated tables flow straight into
    the pipeline."""
    from .hashing import hash48
    from .text import TOKENS, norm_text, render
    fp = hash48(norm_text(engine), engine)
    toks = render(TOKENS, engine)
    return f"""
    WITH docs AS ({_docs_cte(engine)})
    SELECT doc_id, source,
           CAST({render('{alen}(tk)', engine)} AS BIGINT) AS n_tokens,
           CAST({fp} AS BIGINT) AS fp
    FROM (SELECT doc_id, source, text, {toks} AS tk FROM docs) _b
    """


def corpus_from_relational_fn(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Spark side: the REAL bridge functions build the corpus from
    the migrated parquet tables, then the shared dual-rendered
    token/fingerprint projection runs over it."""
    tables = {}
    for name, (key, cols) in _ENTRY_TABLES.items():
        df = read_cached(spark, f"{sf_dir}/{name}.parquet")
        tables[name] = (df, key, cols)
    docs = documents_from_tables(spark, tables, id_stride=_ID_STRIDE)
    docs.createOrReplaceTempView("__bridge_docs")
    from .hashing import hash48
    from .text import TOKENS, norm_text, render
    fp = hash48(norm_text("spark"), "spark")
    toks = render(TOKENS, "spark")
    with scoped_parser_mode(spark, "true"):
        return spark.sql(f"""
        SELECT doc_id, source,
               CAST(size(tk) AS BIGINT) AS n_tokens,
               CAST({fp} AS BIGINT) AS fp
        FROM (SELECT doc_id, source, text, {toks} AS tk
              FROM __bridge_docs) _b
        """)
