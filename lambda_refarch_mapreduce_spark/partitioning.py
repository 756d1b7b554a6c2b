"""Partitioning utilities: parallelism guards and skew salting.

The reference plans partitions statically from object sizes
(lambdautils.py:120-134) and explicitly punts on skew
(src/nodejs/utils.js:47-50 "corner cases in your dataset ... skewed
reduce"). On Spark, scan parallelism comes from file splits and
shuffle parallelism from AQE — but two gaps remain, closed here:

1. **CPU-bound operators over few splits.** A small/compacted input
   (one parquet file) yields one task, so per-row-expensive work
   (shingling, hashing, vector math) runs on one core no matter how
   many the cluster has. ``ensure_parallelism`` repartitions only
   when the scan's parallelism is below the session default — a no-op
   at 100TB (thousands of splits) and the difference between 1 and
   32 cores on a compacted extract.

2. **Hot keys in aggregations.** AQE splits skewed *join* partitions
   but a skewed groupBy key still lands on one reducer. Salting
   splits each key into ``n_salts`` subkeys, aggregates partially per
   subkey, then merges — two small shuffles instead of one hot one.
   Works for any algebraic aggregate (sum/count/min/max).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan's current parallelism is
    below ``min_partitions`` (default: the session's default
    parallelism). Returns ``df`` unchanged when the input is already
    parallel enough, so large multi-split scans pay nothing.
    """
    spark = df.sparkSession
    if min_partitions is None:
        min_partitions = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min_partitions:
        return df
    return df.repartition(min_partitions)


def with_salt(
    df: DataFrame,
    n_salts: int,
    salt_col: str = "__salt",
    deterministic: bool = True,
) -> DataFrame:
    """Append a per-row salt in [0, n_salts).

    Default mode hashes the whole row (monotonically_increasing_id is
    NOT deterministic across retries; a content hash is), so retried
    tasks salt identically — required for exactly-once sinks.

    LIMITATION of the deterministic mode: byte-identical rows get the
    same salt, so a hot key whose rows are exact duplicates (the
    nastiest skew case) still lands on one reducer. For at-least-once
    paths where that skew pattern is real, pass
    ``deterministic=False`` to use a uniform random salt instead —
    spreads every row, but retried tasks may salt differently.
    """
    if not deterministic:
        return df.withColumn(
            salt_col, F.floor(F.rand() * n_salts).cast("int")
        )
    # pmod, not abs(hash) % n: abs(Integer.MIN_VALUE) overflows negative
    # (~1 row in 4e9), which would put the salt outside [0, n_salts).
    h = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    return df.withColumn(salt_col, h)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output column -> (partial_agg_expr, merge_agg_expr),
    e.g. ``{"total": (F.sum("v"), F.sum("total"))}``: phase 1 groups by
    (keys + salt) and applies the partial; phase 2 groups by keys and
    merges. For non-decomposable aggregates (exact percentile) use the
    built-in path and let AQE handle what it can.

    Note Spark's own hash aggregate already does partial aggregation
    per *map task*; salting additionally bounds the per-reducer key
    width in the merge shuffle, which matters when one key dominates
    (the reference's unhandled "skewed reduce" case).
    """
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[p.alias(out) for out, (p, _m) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[m.alias(out) for out, (_p, m) in aggs.items()]
    )


def z_value(a, b, bits: int = 10):
    """Morton/Z-order key: interleave the low ``bits`` bits of two
    non-negative integer columns (a -> even bit positions, b -> odd).

    Sorting/range-partitioning a table by this key co-locates rows
    that are close in BOTH dimensions, so per-file min/max column
    statistics become tight on both columns at once — the multi-
    dimensional data-skipping layout (Z-ordering) that single-column
    sort can only give one dimension. Row-local bit arithmetic, fully
    inside codegen; the layout job itself is one range exchange.
    """
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for j in range(bits):
        z = z + F.shiftright(a, j).bitwiseAND(F.lit(1)).cast("long") * F.lit(
            1 << (2 * j)
        )
        z = z + F.shiftright(b, j).bitwiseAND(F.lit(1)).cast("long") * F.lit(
            1 << (2 * j + 1)
        )
    return z
