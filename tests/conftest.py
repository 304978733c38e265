import os

import pytest
from pyspark.sql import SparkSession


def make_spark(master: str | None = None, app: str = "walk_spark-tests",
               shuffle_partitions: int = 8) -> SparkSession:
    return (
        SparkSession.builder.master(
            master or os.environ.get("WALK_SPARK_MASTER", "local[4]")
        )
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )


@pytest.fixture(scope="session")
def spark():
    s = make_spark()
    yield s
    s.stop()
