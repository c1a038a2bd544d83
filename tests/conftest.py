import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (SparkSession.builder
         .master("local[8]")
         .appName("harbourbridge-spark-tests")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.adaptive.enabled", "true")
         # creation-time Arrow input bound (ADVICE r14; see
         # confscope.RECOMMENDED_SESSION_CONFS)
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
         .getOrCreate())
    yield s
    s.stop()
