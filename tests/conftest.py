import pytest
from pyspark.sql import SparkSession

from harbourbridge_spark.confscope import apply_recommended


@pytest.fixture(scope="session")
def spark():
    # creation-time Arrow input bound (ADVICE r14/r15): the
    # recommended confs come from the ONE source dict in confscope,
    # never hand-copied literals
    s = (apply_recommended(
        SparkSession.builder
        .master("local[8]")
        .appName("harbourbridge-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true"))
        .getOrCreate())
    yield s
    s.stop()
