"""Sources: dump-stream parsers and catalog readers (SURVEY §2.1).

- ``pgdump``      pg_dump text stream -> schema IR + per-table DataFrames
- ``mysqldump``   mysqldump text stream (same two-pass protocol)
- ``infoschema``  JDBC information_schema readers (postgres + mysql)
- ``dynamo``      DynamoDB-style statistical schema inference over a
                  DataFrame of semi-structured rows
"""
