import pytest

from sits_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="sits-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
