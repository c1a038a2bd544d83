"""Atomic executemany-style JDBC batch writer (K1/K2 against a real
JDBC endpoint).

``JdbcBatchWriter`` drives a ``java.sql.PreparedStatement`` through
the Spark JVM's py4j gateway: one ``addBatch`` per row, a single
``executeBatch`` inside a transaction, ``commit`` on success and
``rollback`` on any SQLException — so a failing batch leaves NO
partial state.  That is the Spanner-mutation-atomicity shape the
reference's bisection protocol assumes
(/root/reference/spanner/batchwriter.go:248-280: a batch either
commits whole or fails whole, and the writer re-splits failures down
to single rows).

A py4j gateway lives in the driver process only, so this writer pairs
with ``batch_writer.write_rows_locally`` (the same batching+bisection
loop foreachPartition runs, executed driver-side).  The distributed
twin with identical semantics is exercised against sqlite3 in
``sqlite_writer`` — this module's job is the *server-shaped* error:
Derby raises java.sql.BatchUpdateException wrapping
SQLIntegrityConstraintViolationException, which surfaces here as
``JdbcWriteError`` and feeds the real bisection path.
"""

from __future__ import annotations

from typing import Sequence

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


class JdbcWriteError(Exception):
    """A JDBC batch failed (and was rolled back)."""


class JdbcBatchWriter:
    """write(rows) callable over a JDBC endpoint via the Spark JVM.

    Parameters
    ----------
    spark: SparkSession (driver-side; supplies the py4j gateway)
    url: JDBC url, e.g. ``jdbc:derby:/tmp/db;create=true``
    table: qualified table name to INSERT into
    columns: column names, in row-tuple order
    driver: JDBC driver class to load (default embedded Derby, which
        ships with Spark for the Hive metastore)
    """

    def __init__(self, spark, url: str, table: str,
                 columns: Sequence[str], driver: str = DERBY_DRIVER):
        self._jvm = spark._jvm
        self._url = url
        self._sql = "INSERT INTO {} ({}) VALUES ({})".format(
            table, ", ".join(columns), ", ".join(["?"] * len(columns)))
        # DriverManager only sees drivers registered in the JVM;
        # Class.forName triggers the embedded driver's static
        # registration (idempotent).
        self._jvm.java.lang.Class.forName(driver)

    def __call__(self, rows: list) -> None:
        conn = self._jvm.java.sql.DriverManager.getConnection(self._url)
        try:
            conn.setAutoCommit(False)
            ps = conn.prepareStatement(self._sql)
            try:
                for row in rows:
                    for i, v in enumerate(row):
                        ps.setObject(i + 1, v)
                    ps.addBatch()
                ps.executeBatch()
                conn.commit()
            except Exception as e:  # py4j Py4JJavaError wrapping SQLException
                conn.rollback()
                raise JdbcWriteError(str(e)[:500]) from None
            finally:
                ps.close()
        finally:
            conn.close()

    def count(self, table: str) -> int:
        """Row count via plain JDBC (verification helper)."""
        conn = self._jvm.java.sql.DriverManager.getConnection(self._url)
        try:
            st = conn.createStatement()
            rs = st.executeQuery(f"SELECT COUNT(*) FROM {table}")
            rs.next()
            return rs.getLong(1)
        finally:
            conn.close()
