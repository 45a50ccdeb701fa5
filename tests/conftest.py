from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

# Tests default to the smallest scale factor for speed; override with
# SPARK_GRAFT_TEST_SF_DIR to re-check at sf0.01 (the driver's gate SF).
TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from swisscourtrulingcorpus_spark.session import get_spark

    spark = get_spark(app_name="tests", master="local[4]")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    """DuckDB connection with the same views the driver registers."""
    import duckdb

    from swisscourtrulingcorpus_spark.sources.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def explain_plan_str(df, mode: str = "formatted") -> str:
    """Public-API plan dump (classic + Spark Connect safe) — use
    instead of df._jdf.queryExecution().  Importable from test modules
    (``from conftest import explain_plan_str``) as well as via the
    ``explain_plan`` fixture."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="session")
def explain_plan():
    return explain_plan_str
