from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from arcadedb_spark.session import get_spark

    s = get_spark("arcadedb-spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def db(spark):
    from arcadedb_spark.database import Database

    return Database.open(spark, SF_DIR)
