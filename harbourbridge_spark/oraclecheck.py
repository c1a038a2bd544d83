"""Shared Spark-vs-DuckDB comparison used by BOTH the local gate tool
(tools/check_oracle.py) and the in-CI gate test
(tests/test_oracle_gate.py) — VERDICT r9 ask 2: a red registry entry
must fail `pytest tests/` locally, not first surface in the driver's
official CORRECTNESS window.

The canonicalization mirrors the driver's compare: columns sorted by
name, floats rendered at 10 significant digits, rows sorted — so a
pass here predicts a pass in CORRECTNESS_r*.json.
"""

from __future__ import annotations

import math

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def register_views(con, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'")


def canon(df) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(f"{v:.10g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def compare_entry(spark, con, name: str, fn, oracle: str | None,
                  sf_dir: str) -> tuple[bool, str]:
    """Run one registry entry both ways; (ok, detail)."""
    sdf = fn(spark, sf_dir).toPandas()
    if oracle is None:
        return True, f"{len(sdf)} rows (no oracle)"
    odf = con.execute(oracle).df()
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, (f"columns differ: spark={sorted(sdf.columns)} "
                       f"duckdb={sorted(odf.columns)}")
    if len(sdf) != len(odf):
        return False, f"rowcount spark={len(sdf)} duckdb={len(odf)}"
    a, b = canon(sdf), canon(odf)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"values differ; first diffs: {diffs}"
    return True, f"{len(sdf)} rows"
