"""Structured Streaming analog of the reference's incremental reduce
(SURVEY.md §2.9): file-source stream driven to completion with
availableNow, checked against the batch result — streaming and batch
must agree (the reference's tree reduction had the same invariant:
any arrival order gives the same final sums)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from lambda_refarch_mapreduce_spark.sources.readers import load_table
from lambda_refarch_mapreduce_spark.streaming.events import (
    incremental_sum,
    read_event_stream,
    windowed_agg,
)
from tests.conftest import SF_SMOKE


def _events_dir(spark, tmp_path, n_files=4):
    """Split the events table into several files to simulate
    incremental arrival (the reference's mapper outputs landing in
    S3 one by one)."""
    d = str(tmp_path / "events_stream")
    load_table(spark, SF_SMOKE, "events").repartition(n_files).write.parquet(d)
    return d


def _run_to_memory(sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_incremental_sum_matches_batch(spark, tmp_path):
    d = _events_dir(spark, tmp_path)
    schema = spark.read.parquet(d).schema
    stream = read_event_stream(spark, d, schema, max_files_per_trigger=1)
    name = f"t_{uuid.uuid4().hex[:8]}"
    _run_to_memory(incremental_sum(stream, "user_id", "value"), name)
    got = {
        r.user_id: round(r.total, 2)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        r.user_id: round(r.total, 2)
        for r in spark.read.parquet(d)
        .groupBy("user_id")
        .agg(F.sum("value").alias("total"))
        .collect()
    }
    assert got == want


def test_windowed_agg_matches_batch(spark, tmp_path):
    d = _events_dir(spark, tmp_path)
    schema = spark.read.parquet(d).schema
    stream = read_event_stream(spark, d, schema)
    out = windowed_agg(stream, "ts", "value", window="1 hour", watermark="2 hours")
    name = f"t_{uuid.uuid4().hex[:8]}"
    _run_to_memory(out, name)
    got = {
        (str(r.window_start), r.total and round(r.total, 2), r.n_events)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (str(r["window.start"]), round(r.total, 2), r.n_events)
        for r in spark.read.parquet(d)
        .groupBy(F.window("ts", "1 hour").alias("window"))
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window.start"), "total", "n_events")
        .collect()
    }
    assert got == want
