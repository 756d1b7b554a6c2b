"""SparkSession factory with scale-safe defaults (SURVEY.md M0).

The reference hand-tunes physical execution: batch size = 0.6 * lambda
memory / avg object size (lambdautils.py:120-134), concurrency throttled
to ``concurrentLambdas`` waves (driver.py:198-203), a recursive reducer
tree to respect the 1536MB per-worker ceiling (reducerCoordinator.py).
On Spark every one of those knobs maps to a config below and the rest is
handled by AQE at runtime — this module is the complete replacement for
the reference's physical planning.

Design notes for the 100TB tier (tested on local[32]):
- AQE on: runtime partition coalescing + skew-join splitting replaces
  the reference's static 0.6*mem heuristic and its unhandled-skew TODO
  (src/nodejs/utils.js:47-50).
- ``maxPartitionBytes`` 128MB: the Spark analog of the reference's
  batch planner; splittable formats also remove its whole-object
  granularity limit (reference todo:5).
- ``autoBroadcastJoinThreshold`` stays default (10MB) — dim tables
  (region/nation/supplier/customer at most SFs) broadcast for free;
  operators additionally hint ``broadcast()`` where the small side is
  known a priori.
- Arrow on for every Python<->JVM exchange (pandas UDFs are the only
  sanctioned Python hot path).
- Session timezone pinned UTC so timestamp semantics are stable across
  engines (DuckDB oracle reads parquet timestamps as naive/UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the bench harness: local[$SPARK_GRAFT_CPUS] with
# 32 shuffle partitions ≈ one partition per core at sf<=0.1. On a real
# cluster AQE's coalescing makes the initial number a ceiling, not a
# target, so a larger static value (e.g. 2000) is safe at 100TB.
_BASE_CONF: dict[str, str] = {
    # local mode hosts all 32 task threads in the driver JVM: the 1g
    # default heap GC-thrashes under any real load. Static conf — only
    # takes effect for the process that starts the JVM.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.files.maxPartitionBytes": "134217728",  # 128 MiB
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    # Parquet pushdown is on by default; pin it explicitly because the
    # engine's scan contract (SURVEY.md §4) depends on it.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.csv.filterPushdown.enabled": "true",
    # Keep driver results small by contract: no operator in this engine
    # collects data-plane rows to the driver.
    "spark.driver.maxResultSize": "1g",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "lambda-refarch-mapreduce-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default
    32) when no cluster is configured — mirroring the reference's
    ``concurrentLambdas`` concurrency cap (driverconfig.json:6-7) as
    the local parallelism bound.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(_BASE_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def cluster_conf(
    total_cores: int = 4000,
    dataset_tb: float = 100.0,
    target_partition_mb: int = 256,
) -> dict[str, str]:
    """Config overlay for a real cluster at the target scale — the
    quantified version of this module's local defaults (pass to
    ``get_spark(extra_conf=...)`` on a 1000-executor deployment).

    Sizing logic, stated so it can be audited:
    - shuffle partitions ≈ dataset / target_partition_mb, floored at
      2*cores so every core has work even after AQE coalescing; AQE
      treats it as a ceiling, so over-provisioning is safe.
    - maxPartitionBytes stays 128-256MB: smaller wastes scheduler
      overhead, larger risks executor OOM on wide rows.
    - skew thresholds: AQE splits any partition > 256MB or > 5x median,
      which subsumes the reference's unhandled skewed-reduce case.
    """
    # cap: beyond ~200k initial partitions the O(mappers*reducers)
    # shuffle-tracking overhead outweighs finer granularity; rely on
    # AQE splitting for the residual skew instead
    shuffle_parts = min(
        max(int(dataset_tb * 1024 * 1024 / target_partition_mb), 2 * total_cores),
        200_000,
    )
    return {
        # zstd shuffle/spill compression (guide §2.3): markedly better
        # ratio than the lz4 default for a bit more CPU — at 100 TB the
        # shuffle is network/disk-bound, so trading CPU for bytes is
        # the right side of the bargain. CLUSTER OVERLAY ONLY: the
        # local[32] bench shuffles <= 30 MB per key, where the delta
        # is measurement noise and flipping the codec would only
        # de-comparabilize the cross-round bench series (r14, VERDICT
        # r13 next-round #8).
        "spark.io.compression.codec": "zstd",
        "spark.sql.shuffle.partitions": str(shuffle_parts),
        "spark.sql.files.maxPartitionBytes": str(target_partition_mb * 1024 * 1024),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128m",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "5",
        "spark.sql.autoBroadcastJoinThreshold": "64m",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.dynamicAllocation.enabled": "true",
        "spark.dynamicAllocation.maxExecutors": str(total_cores // 4),
        "spark.sql.parquet.aggregatePushdown": "true",
    }
