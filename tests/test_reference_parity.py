"""Reference-parity golden tests (SURVEY.md §5): the AMPLab queries
1a/1b/2a on uservisits/rankings CSV fixtures shaped per FIXTURES.md
§11-12, including the reference's edge semantics — malformed-row
drop-and-count (mapper.py:49-57) and SQL/Python SUBSTR (mapper.py:51,
canonical per SURVEY.md §7.4).

Fixtures are generated deterministically (seed=42) as CSV with ~0.5%
malformed rows; DuckDB reads the same files as the oracle.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from lambda_refarch_mapreduce_spark.plans.jobspec import JobSpec, run_jobspec
from lambda_refarch_mapreduce_spark.sources.readers import read_csv
from tests.conftest import canon

USERVISITS_SCHEMA = StructType(
    [
        StructField("sourceIP", StringType()),
        StructField("destURL", StringType()),
        StructField("visitDate", StringType()),
        StructField("adRevenue", DoubleType()),
        StructField("userAgent", StringType()),
        StructField("countryCode", StringType()),
        StructField("languageCode", StringType()),
        StructField("searchWord", StringType()),
        StructField("duration", IntegerType()),
    ]
)

RANKINGS_SCHEMA = StructType(
    [
        StructField("pageURL", StringType()),
        StructField("pageRank", IntegerType()),
        StructField("avgDuration", IntegerType()),
    ]
)


@pytest.fixture(scope="module")
def amplab_dir(tmp_path_factory):
    rng = random.Random(42)
    d = tmp_path_factory.mktemp("amplab")
    uv = d / "uservisits.csv"
    with uv.open("w") as f:
        for i in range(5000):
            ip = f"{rng.randint(10, 250)}.{rng.randint(0, 255)}.{rng.randint(0, 255)}.{rng.randint(0, 255)}"
            if rng.random() < 0.005:
                # malformed: too few fields / non-numeric revenue
                f.write(f"{ip},brokenrow\n" if rng.random() < 0.5 else f"{ip},u,2024-01-01,NOTANUMBER,a,US,en,w,1\n")
                continue
            rev = round(rng.uniform(0.01, 10.0), 4)
            f.write(
                f"{ip},url{i},2024-01-{1 + i % 28:02d},{rev},agent,US,en,word{i % 50},{rng.randint(1, 60)}\n"
            )
    rk = d / "rankings.csv"
    with rk.open("w") as f:
        for i in range(5000):
            # skewed so 1a (>1000) selects far fewer than 1b (>100)
            rank = int(rng.paretovariate(1.0) * 50)
            f.write(f"page{i},{rank},{rng.randint(1, 10)}\n")
    return d


@pytest.fixture(scope="module")
def amplab_duck(amplab_dir):
    con = duckdb.connect()
    # DuckDB as oracle with the same drop-malformed policy:
    # ignore_errors=true drops unparsable rows like the reference.
    # Materialized as TABLE (not VIEW): with ignore_errors, projection
    # pushdown changes which rows fail to parse (count(*) wouldn't
    # parse adRevenue at all), so a view's row set depends on the
    # query — a table parses every column exactly once.
    con.sql(
        f"""
        CREATE TABLE uservisits AS SELECT * FROM read_csv(
            '{amplab_dir}/uservisits.csv', header=false, ignore_errors=true,
            columns={{'sourceIP':'VARCHAR','destURL':'VARCHAR','visitDate':'VARCHAR',
                     'adRevenue':'DOUBLE','userAgent':'VARCHAR','countryCode':'VARCHAR',
                     'languageCode':'VARCHAR','searchWord':'VARCHAR','duration':'INTEGER'}})
        """
    )
    con.sql(
        f"""
        CREATE TABLE rankings AS SELECT * FROM read_csv(
            '{amplab_dir}/rankings.csv', header=false,
            columns={{'pageURL':'VARCHAR','pageRank':'INTEGER','avgDuration':'INTEGER'}})
        """
    )
    yield con
    con.close()


def _compare(sdf, duck, sql):
    srows = [tuple(r) for r in sdf.collect()]
    ores = duck.sql(sql)
    orows = ores.fetchall()
    ocols = [d[0] for d in ores.description]
    assert sorted(sdf.columns) == sorted(ocols)
    assert canon(srows, sdf.columns) == canon(orows, ocols)


def test_query_1a_scan_filter(spark, amplab_dir, amplab_duck):
    """1a: SELECT pageURL, pageRank FROM rankings WHERE pageRank > 1000
    (reference README.md:139-142; never shipped as code — capability
    restored here)."""
    spec = JobSpec(
        source={
            "format": "csv",
            "path": str(amplab_dir / "rankings.csv"),
            "schema": RANKINGS_SCHEMA,
        },
        filter="pageRank > 1000",
        select={"pageURL": "pageURL", "pageRank": "pageRank"},
    )
    sdf = run_jobspec(spark, spec)
    assert sdf.count() > 0
    _compare(sdf, amplab_duck, "SELECT pageURL, pageRank FROM rankings WHERE pageRank > 1000")


def test_query_1b_low_selectivity(spark, amplab_dir, amplab_duck):
    spec = JobSpec(
        source={
            "format": "csv",
            "path": str(amplab_dir / "rankings.csv"),
            "schema": RANKINGS_SCHEMA,
        },
        filter="pageRank > 100",
        select={"pageURL": "pageURL", "pageRank": "pageRank"},
    )
    sdf = run_jobspec(spark, spec)
    n_1b = sdf.count()
    assert n_1b > 0
    _compare(sdf, amplab_duck, "SELECT pageURL, pageRank FROM rankings WHERE pageRank > 100")


def test_query_2a_substr_groupby_sum(spark, amplab_dir, amplab_duck):
    """2a: SELECT SUBSTR(sourceIP,1,8), SUM(adRevenue) GROUP BY 1 —
    the reference's shipped mapper/reducer pair (mapper.py:51-54,
    reducer.py:52-56), with malformed rows dropped like the per-line
    try/except (mapper.py:49-57)."""
    spec = JobSpec(
        source={
            "format": "csv",
            "path": str(amplab_dir / "uservisits.csv"),
            "schema": USERVISITS_SCHEMA,
            # the query consumes sourceIP and adRevenue strictly, like
            # the reference's data[0]/data[3] (mapper.py:51-54)
            "required": ["sourceIP", "adRevenue"],
        },
        select={"src": "substring(sourceIP, 1, 8)", "rev": "adRevenue"},
        group_by=["src"],
        aggs={"sum_rev": "round(sum(rev), 4)"},
    )
    sdf = run_jobspec(spark, spec)
    _compare(
        sdf,
        amplab_duck,
        "SELECT substr(sourceIP,1,8) AS src, round(sum(adRevenue),4) AS sum_rev "
        "FROM uservisits GROUP BY 1",
    )


def test_malformed_rows_dropped_not_counted_in_result(spark, amplab_dir, amplab_duck):
    """Drop-and-count policy: malformed rows are excluded from results
    (reference silently drops via per-line try/except, mapper.py:49-57
    — short rows IndexError, bad numbers ValueError) while the raw
    line count stays observable (mapper.py:48 counts before parsing)."""
    from lambda_refarch_mapreduce_spark.sources.readers import raw_line_count

    path = str(amplab_dir / "uservisits.csv")
    total = raw_line_count(spark, path)
    assert total == 5000

    clean = read_csv(
        spark, path, USERVISITS_SCHEMA, required=["sourceIP", "adRevenue"]
    )
    n_clean = clean.count()
    assert n_clean < total  # fixture plants ~0.5% bad rows
    # same drop set as the DuckDB oracle's ignore_errors
    assert n_clean == amplab_duck.sql("SELECT count(*) FROM uservisits").fetchone()[0]
