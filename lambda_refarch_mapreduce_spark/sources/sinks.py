"""Sinks with a run-stats manifest (reference operator O12).

The reference's sink is an S3 PUT that carries stats as object
user-metadata — linecount, processingtime, memoryUsage
(mapper.py:22-23,63-72; reducer.py:73-79) — a side channel the driver
later reads for its cost report (driver.py:216-255). The Spark-native
version: ``df.observe`` accumulates exact row/value metrics during the
write action itself (no second scan), and the manifest lands as a JSON
file next to the data, where any downstream job can read it without
S3-metadata APIs.

``observe`` metrics are computed by the executors inline with the
write — at 100TB this costs nothing extra; a post-hoc ``count()``
would be a second full scan.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

MANIFEST_NAME = "_manifest.json"


def write_with_manifest(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    extra_metrics: dict[str, "F.Column"] | None = None,
) -> dict:
    """Write ``df`` and a ``_manifest.json`` stats sidecar; return the
    manifest dict.

    Manifest contents: rows_written (exact, via observe — the
    reference's ``linecount``), wall_secs (``processingtime``), schema,
    format, bytes_written (local filesystems only), plus any
    ``extra_metrics`` aggregate expressions (e.g. a sum to checksum
    against downstream loads).
    """
    obs = Observation("sink_stats")
    metrics = {"rows_written": F.count(F.lit(1))}
    if extra_metrics:
        metrics.update(extra_metrics)
    observed = df.observe(obs, *[m.alias(k) for k, m in metrics.items()])

    t0 = time.monotonic()
    writer = observed.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    getattr(writer, fmt)(path)
    wall = time.monotonic() - t0

    manifest = {
        "format": fmt,
        "path": path,
        "wall_secs": round(wall, 3),
        "schema": df.schema.jsonValue(),
        **obs.get,
    }
    if os.path.isdir(path):  # local fs: account bytes like the S3 PUT size
        manifest["bytes_written"] = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _dirs, files in os.walk(path)
            for f in files
            if not f.startswith("_")
        )
    with open(os.path.join(path, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh, indent=2, default=str)
    return manifest


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST_NAME)) as fh:
        return json.load(fh)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) table.

    Bucketing pre-partitions data by key at WRITE time, so every later
    join/aggregation on the bucket key runs with ZERO exchange — the
    single biggest shuffle eliminator for repeated joins on the same
    key at 100TB (pay the shuffle once, reuse it forever). Spark only
    supports bucketing through the table catalog (saveAsTable), not
    path-based writes.
    """
    writer = df.write.mode(mode).format(fmt).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def shuffle_key(col, seed: int = 42):
    """Deterministic pseudo-random sort key: md5 over a seeded id
    rendering. Portable (same bytes in any engine) and stable across
    runs — re-running the job reproduces the exact shuffle order."""
    return F.md5(F.concat(F.lit(f"shuf{seed}:"), col.cast("string")))


def write_shuffled_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int = 32,
    seed: int = 42,
):
    """The terminal step of a pretraining data pipeline: deterministic
    global shuffle + fixed shard count, written so each shard is one
    file internally ordered by the shuffle key.

    Plan shape: shard assignment is a row-local pmod over a portable
    hash; ``repartition(n, shard)`` is ONE hash exchange of the corpus
    (unavoidable — a shuffle is the product); ``sortWithinPartitions
    (shard, sort_key)`` orders each shard with no global range
    exchange AND already satisfies the partitioned writer's required
    ordering, so the write inserts no second (order-destroying) sort.
    The sort key stays in the output for downstream order audits.
    Rerunning with the same seed reproduces identical shards.
    """
    key = shuffle_key(F.col(id_col), seed)
    shard = F.pmod(
        F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint"), F.lit(n_shards)
    ).cast("int")
    (
        df.withColumn("sort_key", key)
        .withColumn("shard", shard)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "sort_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
