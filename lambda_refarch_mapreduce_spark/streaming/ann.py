"""Continuous ANN index ingestion: embeddings stream in, each
micro-batch is IVF-assigned and PQ-encoded against FROZEN
centroids/codebooks, and the m-byte code rows are appended
idempotently to a parquet index. Searching reads ONLY committed code
rows — raw vectors are never rescanned.

This is the similarity-tier twin of streaming/corpus.py (same
reference lineage: objects arrive → event fires → state advances,
reducerCoordinator.py:107-189) and the streaming completion of the
build-once/serve-many split the batch tier already exposes
(similarity.ivfadc_encode / ivfadc_search):

- TRAIN once, offline: ivf_centroids + pq_codebooks on a bootstrap
  sample. The quantizers must be frozen for the index layout to be
  stable — re-training would re-bucket history (the standard IVF
  operating model; re-train + re-encode is a batch job, not a stream).
- INGEST continuously: each micro-batch is one ivfadc_encode
  projection (row-local; the only shuffle is the partitioned write).
- SERVE anytime: ivfadc_search over the committed code rows.

Idempotence under at-least-once foreachBatch follows corpus.py's
scheme exactly: per-batch overwrite into ``codes/_batch_id=N/`` plus a
commit log appended LAST, with readers semi-joining the log so a
crashed attempt's partial rows are invisible.

Scale posture: the index grows by batch-sized appends only;
``codes/`` is partitioned by ``list_id``, so a search that probes
n_probe of n_centroids lists prunes ~(1 - n_probe/n_centroids) of the
index FILES at planning time (partition pruning on the directory
layout) before any row is read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_refarch_mapreduce_spark.operators import similarity
from lambda_refarch_mapreduce_spark.streaming.corpus import (
    _committed,
    _read_or_empty,
)

_CODES_SCHEMA = "neighbor_id bigint, list_id int, codes array<int>"


def ingest_embedding_stream(
    stream_vecs: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
    index_dir: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
):
    """foreachBatch pipeline: encode the micro-batch with the frozen
    quantizers (similarity.ivfadc_encode, broadcast strategy — the
    streaming plan is built once per batch, so plan-literal blowup
    would be paid per micro-batch) and write
    ``codes/_batch_id=N/list_id=.../`` as an idempotent overwrite,
    then append the batch id to the commit log. Returns the
    DataStreamWriter (caller starts it)."""
    codes_path = os.path.join(index_dir, "codes")
    commits_path = os.path.join(index_dir, "commits")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        commits = _committed(spark, commits_path)
        if commits.filter(F.col("batch_id") == batch_id).limit(1).count():
            return  # already fully committed; replay is a no-op
        coded = similarity.ivfadc_encode(
            batch_df,
            centroids,
            codebooks,
            id_col,
            vec_col,
            codebook_strategy="broadcast",
        )
        (
            coded.write.mode("overwrite")
            .partitionBy("list_id")
            .parquet(os.path.join(codes_path, f"_batch_id={batch_id}"))
        )
        # commit LAST: the batch becomes visible atomically
        spark.createDataFrame([(batch_id,)], "batch_id bigint").write.mode(
            "append"
        ).parquet(commits_path)

    writer = stream_vecs.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer


def read_committed_codes(spark: SparkSession, index_dir: str) -> DataFrame:
    """The committed code rows (neighbor_id, list_id, codes): rows from
    replayed-but-uncommitted attempts are filtered by a broadcast
    semi-join on the commit log."""
    commits = _committed(spark, os.path.join(index_dir, "commits")).select(
        F.col("batch_id").alias("_batch_id")
    )
    codes = _read_or_empty(
        spark,
        os.path.join(index_dir, "codes"),
        _CODES_SCHEMA + ", _batch_id bigint",
    )
    return codes.join(F.broadcast(commits), "_batch_id", "left_semi").select(
        "neighbor_id", "list_id", "codes"
    )


def search_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """IVFADC top-k against everything ingested so far: committed code
    rows only, probe-list pruning, ADC scoring, WindowGroupLimit —
    identical semantics to similarity.ivfadc_topk over the same
    corpus (pinned by tests/test_streaming.py)."""
    coded = read_committed_codes(spark, index_dir)
    return similarity.ivfadc_search(
        coded,
        queries,
        centroids,
        codebooks,
        id_col,
        vec_col,
        k,
        n_probe,
        codebook_strategy="broadcast",
    )
