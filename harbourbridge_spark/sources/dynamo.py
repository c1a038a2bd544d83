"""DynamoDB-style statistical schema inference + data conversion
(S19-S25, D4/D15/D16 in SURVEY §2).

The reference scans a sample of items and builds a per-attribute type
histogram (dynamodb/schema.go:144-229), then infers column types with
three thresholds (dynamodb/schema.go:43-44, 236-292):

- rare observed types (<= 0.1% of rows) are discarded as noise;
- a column is nullable if absent from > 0.1% of rows;
- if more than one candidate survives at the 5% conflict threshold,
  the column falls back to String.

Spark-first re-expression: items arrive as a DataFrame with one
``item`` column holding DynamoDB-JSON text ({"attr": {"S": "v"}, ...}).
The histogram is a real distributed aggregation (explode keys ->
classify via JSON expressions -> groupBy counts); only the tiny
(attribute x type) count table reaches the driver, where the
threshold logic runs verbatim. At 100 TB the sample is bounded by
``sample_size`` rows (df.limit pushes the limit to the scan).

Data conversion (D4): per-column JSON extraction + casts, including
Number->NUMERIC fit checking (D16: 29 digits before / 9 after the
point, numericParsable, dynamodb/schema.go:298-327), base64 Binary
decode, Map/List kept as JSON text (D15), and sets as typed arrays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schema_ir as ir
from ..context import MigrationContext
from ..convert import ERRS_COL, ConversionResult
from ..toddl import schema_to_ddl
from ..types import SourceType
from ..typemap import dynamodb as ddy

ERR_THRESHOLD = 0.001       # dynamodb/schema.go:43
CONFLICT_THRESHOLD = 0.05   # dynamodb/schema.go:44

# Spanner-NUMERIC fit: 29 integer digits, 9 fractional (D16).
# The dot is a CHARACTER CLASS, not a backslash escape: this SQL text
# is parsed under whatever spark.sql.parser.escapedStringLiterals the
# session currently has (the template convention toggles it), and
# '\\.' flips meaning between the two modes — that exact flip
# misclassified every Number as NumberString and silently disabled
# quarantine when a template entry ran first in the session
# (caught by tests/test_dynamo.py failing after test_dsir.py).
_NUMERIC_FIT = (
    "x RLIKE '^[+-]?[0-9]*[.]?[0-9]*([eE][+-]?[0-9]+)?$' AND "
    "TRY_CAST(x AS DECIMAL(38,9)) IS NOT NULL AND "
    "abs(TRY_CAST(x AS DECIMAL(38,9))) < 1e29")


def _observed_type_expr() -> Column:
    """Classify one attribute value (DynamoDB-JSON text in column `av`)
    into the 11 observed types (incTypeCount, dynamodb/schema.go:183-229).
    """
    tag = F.expr("json_object_keys(av)[0]")
    n_val = F.expr("get_json_object(av, '$.N')")
    ns_vals = F.expr("from_json(get_json_object(av, '$.NS'), 'array<string>')")
    ns_all_fit = F.expr(
        "forall(from_json(get_json_object(av, '$.NS'), 'array<string>'), "
        f"x -> {_NUMERIC_FIT})")
    n_fits = F.expr(f"exists(array(get_json_object(av, '$.N')), x -> {_NUMERIC_FIT})")
    return (F.when(tag == "S", ddy.TYPE_STRING)
            .when(tag == "BOOL", ddy.TYPE_BOOL)
            .when(tag == "N", F.when(n_fits, ddy.TYPE_NUMBER)
                  .otherwise(ddy.TYPE_NUMBER_STRING))
            .when(tag == "B", ddy.TYPE_BINARY)
            .when(tag == "NULL", ddy.TYPE_NULL)
            .when(tag == "L", ddy.TYPE_LIST)
            .when(tag == "M", ddy.TYPE_MAP)
            .when(tag == "SS", ddy.TYPE_STRING_SET)
            .when(tag == "NS", F.when(ns_all_fit, ddy.TYPE_NUMBER_SET)
                  .otherwise(ddy.TYPE_NUMBER_STRING_SET))
            .when(tag == "BS", ddy.TYPE_BINARY_SET)
            .otherwise(ddy.TYPE_STRING))


def type_histogram(items: DataFrame, sample_size: int = 100_000,
                   item_col: str = "item") -> tuple[DataFrame, int]:
    """S21/S22: per-(attribute, observed type) counts over a row sample.
    Returns (histogram_df, sampled_row_count)."""
    sample = items.limit(sample_size).select(
        F.col(item_col).alias("item")).cache()
    n = sample.count()
    exploded = (sample
                .select(F.explode(F.expr("json_object_keys(item)")).alias("attr"),
                        F.col("item"))
                .withColumn("av", F.expr(
                    "get_json_object(item, concat('$.', attr))"))
                .withColumn("obs_type", _observed_type_expr()))
    hist = (exploded.groupBy("attr", "obs_type")
            .agg(F.count(F.lit(1)).alias("n")))
    return hist, n


def infer_data_types(hist_rows: list, total_rows: int
                     ) -> dict[str, tuple[str, bool]]:
    """S23 (inferDataTypes, dynamodb/schema.go:236-292): threshold logic
    over the collected histogram. Returns {attr: (observed_type,
    nullable)}. Pure driver-side — input is the tiny count table."""
    by_attr: dict[str, dict[str, int]] = {}
    for r in hist_rows:
        by_attr.setdefault(r["attr"], {})[r["obs_type"]] = r["n"]
    out: dict[str, tuple[str, bool]] = {}
    for attr, counts in by_attr.items():
        # presentRows sums EVERY observation, noise included
        # (schema.go:244-245)
        present = sum(counts.values())
        nullable = (total_rows - present) > ERR_THRESHOLD * total_rows
        # NULL-typed observations make the column nullable but don't
        # vote (divergence from the reference, which lets Null vote as
        # a type; a mostly-NULL column typed "Null" has no useful
        # target mapping, so nullability is the better signal)
        null_n = counts.pop(ddy.TYPE_NULL, 0)
        if null_n > ERR_THRESHOLD * total_rows:
            nullable = True
        # discard noise types at or below the error threshold
        # (schema.go:246-253: keep iff count/rows > errThreshold)
        stat_items = {t: c for t, c in counts.items()
                      if c > ERR_THRESHOLD * total_rows}
        if not stat_items:
            # "Skip column with no data records" (schema.go:254-257):
            # all-noise and empty columns get NO schema entry
            continue
        candidates = {t: c for t, c in stat_items.items()
                      if c > CONFLICT_THRESHOLD * present}
        if len(candidates) == 1:
            out[attr] = (next(iter(candidates)), nullable)
        else:
            # zero or several conflicting candidates -> String
            # (schema.go:283-290)
            out[attr] = (ddy.TYPE_STRING, nullable)
    return out


def infer_schema(ctx: MigrationContext, items: DataFrame, table_name: str,
                 partition_keys: list[str] | None = None,
                 sample_size: int = 100_000,
                 item_col: str = "item") -> ir.SourceTable:
    """S20/S23: build the SourceTable IR for one DynamoDB-style table.
    ``partition_keys`` plays the role of the key schema from
    DescribeTable (analyzeMetadata, dynamodb/schema.go:116-142)."""
    hist, n = type_histogram(items, sample_size, item_col)
    inferred = infer_data_types([r.asDict() for r in hist.collect()], n)
    table = ir.SourceTable(name=table_name)
    # deterministic column order: keys first, then alphabetical
    # (dynamodb/schema.go:111)
    keys = partition_keys or []
    ordered = keys + sorted(k for k in inferred if k not in keys)
    for attr in ordered:
        obs, nullable = inferred.get(attr, (ddy.TYPE_STRING, True))
        not_null = attr in keys or not nullable
        table.col_names.append(attr)
        table.col_defs[attr] = ir.SourceColumn(
            attr, SourceType(obs), not_null=not_null)
    table.primary_keys = [ir.Key(k) for k in keys]
    ctx.src_schema[table_name] = table
    return table


def _value_expr(attr: str, obs: str) -> tuple[Column, Column]:
    """D4: typed extraction for one column from the DynamoDB-JSON item.
    Returns (value, err)."""
    av = F.expr(f"get_json_object(item, '$.{attr}')")
    tag_val = {
        ddy.TYPE_STRING: F.expr(f"get_json_object(item, '$.{attr}.S')"),
        ddy.TYPE_BOOL: F.expr(f"get_json_object(item, '$.{attr}.BOOL')")
        .try_cast("boolean"),
        ddy.TYPE_NUMBER: F.expr(f"get_json_object(item, '$.{attr}.N')")
        .try_cast("decimal(38,9)"),
        ddy.TYPE_NUMBER_STRING: F.expr(f"get_json_object(item, '$.{attr}.N')"),
        ddy.TYPE_BINARY: F.unbase64(
            F.expr(f"get_json_object(item, '$.{attr}.B')")),
        ddy.TYPE_LIST: F.expr(f"get_json_object(item, '$.{attr}.L')"),
        ddy.TYPE_MAP: F.expr(f"get_json_object(item, '$.{attr}.M')"),
        ddy.TYPE_STRING_SET: F.expr(
            f"from_json(get_json_object(item, '$.{attr}.SS'), 'array<string>')"),
        ddy.TYPE_NUMBER_SET: F.expr(
            f"transform(from_json(get_json_object(item, '$.{attr}.NS'), "
            "'array<string>'), x -> TRY_CAST(x AS DECIMAL(38,9)))"),
        ddy.TYPE_NUMBER_STRING_SET: F.expr(
            f"from_json(get_json_object(item, '$.{attr}.NS'), 'array<string>')"),
        ddy.TYPE_BINARY_SET: F.expr(
            f"transform(from_json(get_json_object(item, '$.{attr}.BS'), "
            "'array<string>'), x -> unbase64(x))"),
    }
    val = tag_val.get(obs, F.expr(f"get_json_object(item, '$.{attr}')"))
    # error: attribute present but extraction failed (e.g. S column got
    # an N-typed value, Number failed decimal fit)
    err = av.isNotNull() & val.isNull() & \
        ~F.expr(f"get_json_object(item, '$.{attr}.NULL')").isNotNull()
    return val, err


def convert_items(ctx: MigrationContext, items: DataFrame, table_name: str,
                  item_col: str = "item") -> ConversionResult:
    """S24 + D4: convert DynamoDB-JSON items into the inferred typed
    shape, with per-row bad-row quarantine (whole-row semantics,
    dynamodb/data.go:93-191)."""
    table = ctx.src_schema[table_name]
    df = items.select(F.col(item_col).alias("item"))
    exprs, errs = [], []
    for cn in table.col_names:
        obs = table.col_defs[cn].type.name
        val, err = _value_expr(cn, obs)
        exprs.append(val.alias(cn))
        errs.append(F.when(err, F.lit(cn)).otherwise(F.lit(None)))
    errs_col = F.filter(F.array(*errs), lambda x: x.isNotNull())
    with_errs = df.withColumn(ERRS_COL, errs_col)
    good = with_errs.where(F.size(ERRS_COL) == 0).select(*exprs)
    bad = with_errs.where(F.size(ERRS_COL) > 0)
    return ConversionResult(good=good, bad=bad)


def migrate_dynamo_items(spark: SparkSession, items: DataFrame,
                         table_name: str,
                         partition_keys: list[str] | None = None,
                         sample_size: int = 100_000,
                         ctx: MigrationContext | None = None
                         ) -> tuple[MigrationContext, ConversionResult]:
    """Full DynamoDB-style migration of one table of JSON items."""
    if ctx is None:
        ctx = MigrationContext()
    infer_schema(ctx, items, table_name, partition_keys, sample_size)
    schema_to_ddl(ctx, "dynamodb")
    ctx.add_synthetic_pkeys()
    ctx.set_data_mode()
    return ctx, convert_items(ctx, items, table_name)
