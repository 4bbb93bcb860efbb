import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from derzis_spark.engine import build_session

    s = build_session(app="derzis-spark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


def fixture_dataframes(spark, fx):
    """CrawlFixture → (pages, robots, seeds) DataFrames."""
    from derzis_spark import schemas

    pages = spark.createDataFrame(fx.pages_rows(), schemas.PAGES)
    robots = spark.createDataFrame(fx.robots_rows(), schemas.ROBOTS)
    seeds = spark.createDataFrame([(u,) for u in fx.seeds], schemas.SEEDS)
    return pages, robots, seeds
