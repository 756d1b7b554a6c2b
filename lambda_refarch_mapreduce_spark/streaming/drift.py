"""Continuous distribution-drift monitoring: documents stream in, each
micro-batch folds its length-bin histogram into a committed running
histogram, and PSI against a FROZEN baseline is computable at any
moment from bin-sized state — the corpus itself is never retained or
rescanned.

This is the streaming twin of the catalog's corpus_drift_psi entry
(plans/catalog_llm.py) and shares its binning kernel
(operators.text.length_bin) — the two monitors are cross-validated in
tests/test_streaming.py: streaming PSI over snapshot-B arrivals equals
the batch entry's summed psi_contrib on the same fixture.

Idempotence under at-least-once foreachBatch follows corpus.py's
scheme: per-batch histogram rows land under ``hist/_batch_id=N/`` as
an overwrite, the commit log is appended LAST, and readers semi-join
the log — a replayed attempt can never double-count a batch.

Scale posture: per-batch state is |bins| rows (bytes); the running
histogram read at serve time is |bins| x |batches| rows — metadata,
not data-plane. The monitor adds one row-local projection + one
|bins|-row aggregate to each micro-batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_refarch_mapreduce_spark.operators.text import length_bin
from lambda_refarch_mapreduce_spark.streaming.corpus import (
    _committed,
    _read_or_empty,
)

_HIST_SCHEMA = "bin bigint, n bigint"


def baseline_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(bin, n) for a reference corpus — freeze this (collect or
    persist it) when the monitor is installed."""
    return (
        docs.select(length_bin(F.col(text_col)).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def ingest_length_histogram(
    stream_docs: DataFrame,
    index_dir: str,
    checkpoint: str,
    text_col: str = "text",
    available_now: bool = True,
):
    """foreachBatch pipeline: reduce the micro-batch to its |bins|-row
    length histogram and commit it idempotently. Returns the
    DataStreamWriter (caller starts it)."""
    hist_path = os.path.join(index_dir, "hist")
    commits_path = os.path.join(index_dir, "commits")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        commits = _committed(spark, commits_path)
        if commits.filter(F.col("batch_id") == batch_id).limit(1).count():
            return
        hist = (
            batch_df.select(length_bin(F.col(text_col)).alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        hist.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(hist_path, f"_batch_id={batch_id}")
        )
        spark.createDataFrame([(batch_id,)], "batch_id bigint").write.mode(
            "append"
        ).parquet(commits_path)

    writer = stream_docs.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer


def running_histogram(spark: SparkSession, index_dir: str) -> DataFrame:
    """(bin, n) summed over every COMMITTED micro-batch."""
    commits = _committed(spark, os.path.join(index_dir, "commits")).select(
        F.col("batch_id").alias("_batch_id")
    )
    hist = _read_or_empty(
        spark,
        os.path.join(index_dir, "hist"),
        _HIST_SCHEMA + ", _batch_id bigint",
    )
    return (
        hist.join(F.broadcast(commits), "_batch_id", "left_semi")
        .groupBy("bin")
        .agg(F.sum("n").alias("n"))
    )


def psi_against_baseline(
    observed: DataFrame,
    baseline: DataFrame,
    n_bins: int = 10,
) -> DataFrame:
    """Per-bin PSI contributions of an observed (bin, n) histogram
    against a baseline (bin, n) histogram — the same Laplace-smoothed
    (+0.5/bin over the FULL bin range, so absent bins still
    contribute) arithmetic as the batch corpus_drift_psi entry.
    Returns (bin, n_base, n_obs, psi_contrib); sum psi_contrib for the
    headline score (>0.2 is the conventional 'significant drift'
    alarm)."""
    spark = observed.sparkSession
    bins = spark.range(n_bins).select(F.col("id").alias("bin"))
    joined = (
        bins.join(baseline.withColumnRenamed("n", "n_base"), "bin", "left")
        .join(observed.withColumnRenamed("n", "n_obs"), "bin", "left")
        .fillna(0, ["n_base", "n_obs"])
    )
    totals = joined.agg(
        F.sum("n_base").alias("tb"), F.sum("n_obs").alias("to")
    )
    p_base = (F.col("n_base") + 0.5) / (F.col("tb") + 0.5 * n_bins)
    p_obs = (F.col("n_obs") + 0.5) / (F.col("to") + 0.5 * n_bins)
    return joined.crossJoin(F.broadcast(totals)).select(
        "bin",
        "n_base",
        "n_obs",
        F.round((p_obs - p_base) * F.log(p_obs / p_base), 6).alias(
            "psi_contrib"
        ),
    )
