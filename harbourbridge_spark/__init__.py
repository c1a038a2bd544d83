"""harbourbridge_spark — a PySpark-native schema+data migration engine.

A from-scratch rebuild of the capabilities of
cloudspannerecosystem/harbourbridge (PostgreSQL / MySQL / DynamoDB ->
Spanner-style target schema) on top of Apache Spark DataFrames:

- ``types``        target type system (8 scalars + ARRAY) <-> Spark types
- ``schema_ir``    dialect-neutral source schema IR + target schema AST
- ``context``      MigrationContext: the single JSON-serializable state
                   object (schemas, name maps, issues, stats, session file)
- ``mapping``      identifier legalization + collision-free name mapping
- ``typemap``      per-dialect source-type -> target-type matrices
- ``convert``      cast-expression planner: typed projection + bad-row split
- ``sources``      pg_dump / mysqldump stream parsers, JDBC info_schema
                   readers, DynamoDB-style schema inference
- ``sink``         parquet/catalog writers + batched bisection writer
- ``report``       conversion statistics, quality rating, text report
- ``ddl``          target DDL rendering with interleave-aware ordering
- ``pipeline``     large-scale training-data operators (dedup, similarity
                   search, text analysis, multimodal columns)
- ``streaming``    Structured Streaming variants of the event operators

Design stance: declarative DataFrame plans that Catalyst can optimize;
Python UDFs only where built-ins genuinely cannot express the semantics
(and then Arrow-batched). No RDD code paths.
"""

__version__ = "0.1.0"
