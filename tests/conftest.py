import pytest


@pytest.fixture(scope="session")
def spark():
    from archive_query_log_spark.session import get_spark

    s = get_spark(app_name="aql-spark-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
