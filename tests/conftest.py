import pytest

from networkit_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="networkit-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": "/tmp/nk-spark-warehouse",
            "spark.driver.memory": "4g",
        },
    )
    yield s
