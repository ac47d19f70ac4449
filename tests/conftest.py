from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

from mapreduce_rust_spark.tables import TABLES, table_path  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    from mapreduce_rust_spark.session import get_spark
    spark = get_spark("mapreduce_rust_spark-tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection mirroring the driver's oracle setup: every
    fixture table registered as a view at sf0.01."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(SF_CORRECT, name)}')"
        )
    yield con
    con.close()
