"""Shared fixtures: one SparkSession per test session, a DuckDB
connection with the testdata views, and the oracle-comparison helper
mirroring the driver's gate (rowcount + columns + canonical multiset).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lambda_refarch_mapreduce_spark import get_spark  # noqa: E402
from lambda_refarch_mapreduce_spark.sources.readers import TABLES  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("engine-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_CORRECT}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def assert_matches_oracle(sdf, duck, sql: str):
    """Driver-gate replica: Spark DataFrame vs DuckDB SQL result."""
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    ores = duck.sql(sql)
    orows = ores.fetchall()
    ocols = [d[0] for d in ores.description]
    assert sorted(scols) == sorted(ocols), f"columns {scols} vs {ocols}"
    assert len(srows) == len(orows), f"rowcount {len(srows)} vs {len(orows)}"
    cs, co = canon(srows, scols), canon(orows, ocols)
    mismatches = [(a, b) for a, b in zip(cs, co) if a != b][:5]
    assert cs == co, f"value mismatch, first diffs: {mismatches}"
