"""Focused tests for the r16 metadata-relation memos (scan.py):
``read_cached`` (immutable single-file fixtures, stat-keyed) and
``read_store`` (store DIRECTORIES, listing-keyed so appends and
overwrites — which always change the part-file set — can never serve
a stale relation).  Metadata only: both return unexecuted plans, so
the assertions check (a) memo hits return the SAME DataFrame object,
(b) any change to the underlying files yields a FRESH relation whose
action sees the new data."""

import os

import pytest

from harbourbridge_spark.scan import read_cached, read_store


@pytest.fixture()
def docs_dir(tmp_path, spark):
    p = str(tmp_path / "store")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string") \
        .coalesce(1).write.parquet(p)
    return p


def test_read_store_memo_hit_same_object(spark, docs_dir):
    a = read_store(spark, docs_dir)
    b = read_store(spark, docs_dir)
    assert a is b
    assert a.count() == 2


def test_read_store_append_invalidates(spark, docs_dir):
    before = read_store(spark, docs_dir)
    assert before.count() == 2
    spark.createDataFrame([(3, "c")], "id long, v string") \
        .coalesce(1).write.mode("append").parquet(docs_dir)
    after = read_store(spark, docs_dir)
    assert after is not before
    assert after.count() == 3


def test_read_store_overwrite_invalidates(spark, docs_dir):
    before = read_store(spark, docs_dir)
    assert before.count() == 2
    spark.createDataFrame([(9, "z")], "id long, v string") \
        .coalesce(1).write.mode("overwrite").parquet(docs_dir)
    after = read_store(spark, docs_dir)
    assert after is not before
    assert [r.id for r in after.collect()] == [9]


def test_read_store_missing_path_falls_through(spark, tmp_path):
    # nonexistent path: no memo entry, plain reader error surfaces
    from pyspark.errors import AnalysisException
    with pytest.raises(AnalysisException):
        read_store(spark, str(tmp_path / "nope")).count()


def test_read_cached_rewrite_invalidates(spark, tmp_path):
    d = str(tmp_path / "one")
    spark.createDataFrame([(1,)], "id long").coalesce(1) \
        .write.parquet(d)
    f = [os.path.join(d, n) for n in os.listdir(d)
         if n.endswith(".parquet")][0]
    a = read_cached(spark, f)
    assert a is read_cached(spark, f)
    assert a.count() == 1
    # rewrite the file bytes (mtime_ns + size key must change)
    d2 = str(tmp_path / "two")
    spark.createDataFrame([(1,), (2,)], "id long").coalesce(1) \
        .write.parquet(d2)
    f2 = [os.path.join(d2, n) for n in os.listdir(d2)
          if n.endswith(".parquet")][0]
    os.replace(f2, f)
    for n in os.listdir(d):    # stale Hadoop .crc sidecars
        if n.endswith(".crc"):
            os.remove(os.path.join(d, n))
    b = read_cached(spark, f)
    assert b is not a
    assert b.count() == 2
