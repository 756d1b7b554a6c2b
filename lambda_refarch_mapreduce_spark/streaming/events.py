"""Structured Streaming analog of the reference's event-driven
incremental reduce (SURVEY.md §2.9).

The reference's only "streaming" is control-plane: S3 ObjectCreated
events fire a stateless coordinator that re-lists the bucket and
launches reducer waves until one output remains
(reducerCoordinator.py:107-189). The dataflow pattern it implements —
"partial results arrive incrementally; merge them by key as they
arrive" — is literally Structured Streaming's incremental hash
aggregate:

    readStream(files) → groupBy(key).sum(v) → outputMode("update")

plus the semantics the reference lacks entirely: event-time windows,
watermarks/late-data policy, session windows, streaming dedup.

All functions return unstarted streaming DataFrames / writers so tests
drive them with trigger(availableNow=True) against a memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of event files — the
    idiomatic version of "S3 object lands → process it"
    (lambdautils.py:78-104 event wiring)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def incremental_sum(stream: DataFrame, key: str, value: str) -> DataFrame:
    """The reference's merge-reduce as a streaming agg: running SUM per
    key, updated as files arrive (replaces the recursive reducer tree —
    state store does the merging the coordinator orchestrated)."""
    return stream.groupBy(key).agg(F.sum(value).alias("total"))


def windowed_agg(
    stream: DataFrame,
    ts_col: str,
    value: str,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    keys: list[str] | None = None,
) -> DataFrame:
    """Event-time tumbling/sliding window aggregate with a watermark.

    Late rows beyond ``watermark`` are dropped and their state evicted
    — bounded state at unbounded input, the property the reference's
    "keep re-listing the bucket" design could never have.
    """
    win = (
        F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    )
    gcols = [win] + [F.col(k) for k in (keys or [])]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*gcols)
        .agg(
            F.sum(value).alias("total"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *[F.col(k) for k in (keys or [])],
            "total",
            "n_events",
        )
    )


def stream_to_parquet(
    out: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """foreachBatch parquet sink: each micro-batch goes through the
    batch writer, so the full batch-writer surface (partitioning,
    manifests) applies — the idiomatic replacement for the reference
    reducers' "PUT an object per reduction wave" (reducer.py:67-71).
    Use with append-mode outputs (watermark-closed windows emit exactly
    once); the checkpoint tracks committed batch ids across restarts.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(path)

    writer = (
        out.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer
