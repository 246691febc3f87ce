from __future__ import annotations

import pytest

from data_migration_tool_spark.session import get_spark
from data_migration_tool_spark.tables import register_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="dmt-tests", master="local[4]")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def tables(spark):
    return register_tables(spark, SF_DIR)
