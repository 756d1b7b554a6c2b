"""JobSpec layer: declarative jobs, UDF seams (the reference's
"edit the mapper/reducer" surface, SURVEY.md §2.2), sinks."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from lambda_refarch_mapreduce_spark.plans.jobspec import JobSpec, run_jobspec
from tests.conftest import SF_CORRECT


def test_declarative_groupby(spark, duck):
    spec = JobSpec(
        source={"format": "parquet", "path": f"{SF_CORRECT}/orders.parquet"},
        filter="o_totalprice > 1000",
        select={"prio": "o_orderpriority", "price": "o_totalprice"},
        group_by=["prio"],
        aggs={"n": "count(1)", "total": "round(sum(price), 2)"},
        order_by=["prio"],
    )
    rows = run_jobspec(spark, spec).collect()
    expect = duck.sql(
        "SELECT o_orderpriority prio, count(*) n, round(sum(o_totalprice),2) total "
        "FROM orders WHERE o_totalprice > 1000 GROUP BY 1 ORDER BY 1"
    ).fetchall()
    assert [(r.prio, r.n, r.total) for r in rows] == expect


def test_map_udf_seam(spark):
    """mapInPandas seam = the mapper's per-batch custom logic
    (reference mapper.py:36-57 'YOUR MAPPER LOGIC')."""

    def double_value(batches):
        for pdf in batches:
            yield pd.DataFrame({"user_id": pdf.user_id, "v2": pdf.value * 2})

    spec = JobSpec(
        source={"df": __import__(
            "lambda_refarch_mapreduce_spark.sources.readers", fromlist=["load_table"]
        ).load_table(spark, SF_CORRECT, "events")},
        select={"user_id": "user_id", "value": "value"},
        map_udf=double_value,
        map_udf_schema="user_id bigint, v2 double",
        group_by=["user_id"],
        aggs={"total": "round(sum(v2), 2)"},
    )
    out = run_jobspec(spark, spec)
    base = (
        __import__(
            "lambda_refarch_mapreduce_spark.sources.readers", fromlist=["load_table"]
        )
        .load_table(spark, SF_CORRECT, "events")
        .groupBy("user_id")
        .agg(F.round(F.sum(F.col("value") * 2), 2).alias("total"))
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, base.collect()))


def test_agg_udf_seam(spark):
    """applyInPandas seam = the reducer's custom merge logic
    (reference reducer.js:46 '/// YOUR REDUCER LOGIC ////')."""

    def span(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [pdf.event_type.iloc[0]],
                "value_span": [round(float(pdf.value.max() - pdf.value.min()), 2)],
            }
        )

    from lambda_refarch_mapreduce_spark.sources.readers import load_table

    spec = JobSpec(
        source={"df": load_table(spark, SF_CORRECT, "events")},
        select={"event_type": "event_type", "value": "value"},
        group_by=["event_type"],
        agg_udf=span,
        agg_udf_schema="event_type string, value_span double",
    )
    out = {r.event_type: r.value_span for r in run_jobspec(spark, spec).collect()}
    base = {
        r.event_type: round(r.mx - r.mn, 2)
        for r in load_table(spark, SF_CORRECT, "events")
        .groupBy("event_type")
        .agg(F.max("value").alias("mx"), F.min("value").alias("mn"))
        .collect()
    }
    assert out == base


def test_sink_roundtrip(spark, tmp_path):
    """Sink writes partitioned parquet readable back with identical
    contents (reference O12 S3 PUT analog)."""
    out_dir = str(tmp_path / "out")
    spec = JobSpec(
        source={"format": "parquet", "path": f"{SF_CORRECT}/nation.parquet"},
        select={"n_nationkey": "n_nationkey", "n_name": "n_name", "n_regionkey": "n_regionkey"},
        sink={"format": "parquet", "path": out_dir, "partition_by": ["n_regionkey"]},
    )
    run_jobspec(spark, spec)
    back = spark.read.parquet(out_dir)
    assert back.count() == 25
    assert {r.n_name for r in back.collect()} == {
        r.n_name for r in spark.read.parquet(f"{SF_CORRECT}/nation.parquet").collect()
    }
