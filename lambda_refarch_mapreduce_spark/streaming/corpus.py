"""Continuous corpus ingestion with incremental dedup.

The reference's whole architecture is "objects arrive, an event fires,
state advances" (reducerCoordinator.py:107-189 — S3 ObjectCreated →
re-list → invoke next wave). Structured Streaming's file source +
foreachBatch is the idiomatic Spark version of that pattern, and this
module applies it to the north-star workload: documents stream in,
every micro-batch is deduped against the ever-growing corpus WITHOUT
rescanning corpus text, survivors and their index rows are appended
transactionally (checkpoint tracks committed batch ids).

Scale posture per micro-batch at a 100 TB corpus: the batch is the
small side, so the digest/band indexes stream map-side against the
broadcast batch (see dedup.dedup_against_index); appends touch only
batch-sized data. Nothing ever shuffles the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lambda_refarch_mapreduce_spark.operators import dedup


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    if os.path.exists(path):
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)


def ingest_dedup_stream(
    stream_docs: DataFrame,
    corpus_dir: str,
    index_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    available_now: bool = True,
):
    """foreachBatch pipeline: within-batch exact dedup (keep lowest id)
    → annotate against the persisted corpus index (exact digest + LSH
    band collision) → append survivors to ``corpus_dir`` and their
    digest/band rows to ``index_dir``. Returns the DataStreamWriter
    (caller starts it; awaitTermination with availableNow drains all
    pending files)."""
    digest_path = os.path.join(index_dir, "digests")
    band_path = os.path.join(index_dir, "bands")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        # within-batch exact dedup, keep-first by id
        w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
        batch = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        digests = _read_or_empty(spark, digest_path, "digest string")
        band_idx = _read_or_empty(spark, band_path, "band int, bkey string")
        verdicts = dedup.dedup_against_index(
            batch, digests, band_idx, id_col, text_col, n, k, bands
        )
        keep_ids = verdicts.filter(F.col("keep")).select(
            F.col("id").alias(id_col)
        )
        survivors = batch.join(F.broadcast(keep_ids), id_col)
        # localCheckpoint: materialize survivors BEFORE the appends so
        # the index append doesn't re-read corpus_dir mid-write
        survivors = survivors.localCheckpoint()
        survivors.write.mode("append").parquet(corpus_dir)
        new_digests, new_bands = dedup.build_dedup_index(
            survivors, id_col, text_col, n, k, bands
        )
        new_digests.write.mode("append").parquet(digest_path)
        new_bands.write.mode("append").parquet(band_path)

    writer = (
        stream_docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer
