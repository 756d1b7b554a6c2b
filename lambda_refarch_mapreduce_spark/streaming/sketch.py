"""Streaming count-min: per-micro-batch sketches that MERGE by cell
addition — the sketch module's mergeability claim exercised under
continuous ingestion.

Each micro-batch reduces to its own d x w cell frame
(operators.sketch.countmin_build — the only corpus-sized stage is one
map-side-combinable per-item count inside the batch) and lands under
``cells/_batch_id=N/`` with the corpus.py idempotence scheme
(overwrite + commit log appended LAST). The running sketch at any
moment is ``groupBy(d, bucket).sum(c)`` over committed cells — sketch
merge IS the aggregation, so per-batch / per-day / per-source sketches
union for free and the event log itself is never retained or
rescanned. Lookups serve from the merged alphabet-sized frame exactly
as the batch entry does (shared kernel, exact same estimates).

Lifecycle: batch-id-keyed commits share the checkpoint's lifecycle, so
this module adopts corpus.guard_checkpoint_epoch (the enforcement
introduced for the A/B monitor, VERDICT r7 #5): a fresh checkpoint
meeting a surviving index fails loudly instead of undercounting.

Scale posture: per-batch state is at most d*w integer cells; the
running frame is bounded by d*w x |batches| rows of integers —
metadata, not data-plane. The statistic's one-sided error contract
(never undercounts; overcount <= 2N/w with prob 1 - 2^-d) holds for
the merged sketch because merge is exact cell addition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_refarch_mapreduce_spark.operators.sketch import (
    bloom_bits,
    bloom_words,
    countmin_build,
    countmin_lookup,
)
from lambda_refarch_mapreduce_spark.streaming.corpus import (
    _committed,
    _read_or_empty,
    guard_checkpoint_epoch,
)

_CELLS_SCHEMA = "d int, bucket bigint, c bigint"


def ingest_countmin(
    stream_events: DataFrame,
    index_dir: str,
    checkpoint: str,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    available_now: bool = True,
):
    """foreachBatch pipeline: reduce the micro-batch to its count-min
    cell frame and commit it idempotently (epoch-guarded). Returns the
    DataStreamWriter (caller starts it)."""
    cells_path = os.path.join(index_dir, "cells")
    commits_path = os.path.join(index_dir, "commits")
    guarded: list[bool] = []

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not guarded:
            guard_checkpoint_epoch(spark, index_dir, checkpoint)
            guarded.append(True)
        if batch_df.isEmpty():
            return
        commits = _committed(spark, commits_path)
        if commits.filter(F.col("batch_id") == batch_id).limit(1).count():
            return
        cells = countmin_build(batch_df, item_col, depth, width)
        cells.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(cells_path, f"_batch_id={batch_id}")
        )
        spark.createDataFrame([(batch_id,)], "batch_id bigint").write.mode(
            "append"
        ).parquet(commits_path)

    writer = stream_events.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer


def running_sketch(spark: SparkSession, index_dir: str) -> DataFrame:
    """The merged sketch over every COMMITTED micro-batch: cell
    addition, which is exactly a groupBy sum — the count-min merge
    law as one aggregate."""
    commits = _committed(spark, os.path.join(index_dir, "commits")).select(
        F.col("batch_id").alias("_batch_id")
    )
    cells = _read_or_empty(
        spark,
        os.path.join(index_dir, "cells"),
        _CELLS_SCHEMA + ", _batch_id bigint",
    )
    return (
        cells.join(F.broadcast(commits), "_batch_id", "left_semi")
        .groupBy("d", "bucket")
        .agg(F.sum("c").alias("c"))
    )


def lookup_now(
    spark: SparkSession,
    index_dir: str,
    probes: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate probe items against the running merged sketch —
    identical arithmetic to the batch catalog entry (shared kernel)."""
    return countmin_lookup(
        running_sketch(spark, index_dir), probes, item_col, depth, width
    )


_BITS_SCHEMA = "pos bigint"


def ingest_bloom(
    stream_events: DataFrame,
    index_dir: str,
    checkpoint: str,
    key_col: str,
    n_bits: int = 1 << 13,
    k: int = 2,
    available_now: bool = True,
):
    """foreachBatch pipeline for a CONTINUOUS membership filter: each
    micro-batch reduces to its Bloom set-bit frame
    (operators.sketch.bloom_bits — at most min(k·|batch keys|, n_bits)
    rows) and commits it idempotently (epoch-guarded). The filter
    never forgets (bits only turn on), so this is the ingest-time
    "might we have seen this key before" index — the approximate fast
    path beside corpus.py's exact digest index. Returns the
    DataStreamWriter (caller starts it)."""
    bits_path = os.path.join(index_dir, "bits")
    commits_path = os.path.join(index_dir, "commits")
    guarded: list[bool] = []

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not guarded:
            guard_checkpoint_epoch(spark, index_dir, checkpoint)
            guarded.append(True)
        if batch_df.isEmpty():
            return
        commits = _committed(spark, commits_path)
        if commits.filter(F.col("batch_id") == batch_id).limit(1).count():
            return
        bits = bloom_bits(batch_df, key_col, n_bits, k)
        bits.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(bits_path, f"_batch_id={batch_id}")
        )
        spark.createDataFrame([(batch_id,)], "batch_id bigint").write.mode(
            "append"
        ).parquet(commits_path)

    writer = stream_events.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer


def running_bloom_bits(spark: SparkSession, index_dir: str) -> DataFrame:
    """The merged filter over every COMMITTED micro-batch as its
    set-bit frame: union + distinct on bit positions, which IS the
    Bloom merge law (bitwise OR of the packed words)."""
    commits = _committed(spark, os.path.join(index_dir, "commits")).select(
        F.col("batch_id").alias("_batch_id")
    )
    bits = _read_or_empty(
        spark,
        os.path.join(index_dir, "bits"),
        _BITS_SCHEMA + ", _batch_id bigint",
    )
    return (
        bits.join(F.broadcast(commits), "_batch_id", "left_semi")
        .select("pos")
        .distinct()
    )


def bloom_words_now(
    spark: SparkSession, index_dir: str, n_bits: int = 1 << 13
) -> list[int]:
    """Pack the running filter into its plan-literal word array —
    ready for operators.sketch.bloom_might_contain row-local probing
    (same serving shape as the batch bloom_prefilter_orders entry)."""
    return bloom_words(running_bloom_bits(spark, index_dir), n_bits)
