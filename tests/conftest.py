from __future__ import annotations

import os

import duckdb
import pytest

from map_reduce_engine_spark.session import TABLES, get_spark

SF_SMOKE = os.environ.get("MRE_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mre-tests", cpus=int(os.environ.get("MRE_TEST_CPUS", "8")))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def duck(sf_dir):
    """DuckDB connection with fixture tables registered as views —
    mirrors the driver's oracle setup."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()
