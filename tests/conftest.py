import pytest

from etl_tool_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("etl_tool_spark_tests", extra_conf={
        "spark.sql.shuffle.partitions": "8",
        "spark.driver.memory": "8g",
    })
    yield s
