"""Round-9 scaling checks: the interval-overlap join's growth curve
and its skew story (VERDICT r8 "next round" #3 — the one r8 operator
that landed without an at-scale measurement).

Claims under test (operators/relational.py interval_overlap_join):
- growth: with per-key interval density held constant and the KEY
  ALPHABET growing with the rows (the realistic 100 TB shape — more
  customers, not denser customers), wall and shuffle grow ~linearly:
  the plan is one co-keyed exchange on (key, bucket) and the exploded
  row count is fan-out * rows, fan-out ~2 at width ~ interval length.
- skew: a hot key whose intervals pile into a few time buckets
  concentrates rows in a few (key, bucket) shuffle cells. The
  docstring claims "skewed hot buckets split by AQE" — that is a
  JOIN-side claim, so it must show up as OptimizeSkewedJoin marking
  the SMJ with skew=true. AQE only fires past its size thresholds
  (256 MB partition / 5x median by default), which sf0.1-scale cells
  never reach: the experiment measures the skewed layout under
  default thresholds (documenting that they do NOT fire at this
  size) and then under aggressive thresholds to prove the mechanism
  engages on exactly this plan shape when cells are big enough to
  matter.

Broadcast is pinned OFF (static + adaptive) for every variant so the
join regime is SMJ at all scales — the regime the skew claim is
about, and the only one where the curve is comparable across sizes.

Usage: python tools/scaling_round9.py [workdir] [measure_key]
Prints one JSON line per experiment. With a measure_key (e.g.
``uniform_10x``) only that variant is measured — run ONE variant per
process (fresh JVM, UI on) so AQE exchange reuse and warm caches
can't flatter a variant (the round-6 MeasuredRun lesson).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lambda_refarch_mapreduce_spark import get_spark  # noqa: E402
from lambda_refarch_mapreduce_spark.metrics import MeasuredRun  # noqa: E402
from lambda_refarch_mapreduce_spark.operators.relational import (  # noqa: E402
    interval_overlap_join,
)

BASE_ROWS = 150_000  # ~ sf0.1 orders
ROWS_PER_KEY = 15
KEY_WINDOW = 400  # each key's intervals live in a 400-unit window
BUCKET_W = 16  # ~ typical interval length (10..29)
HOT_FRAC = 0.005  # skew: 0.5% of all rows on ONE key...
HOT_BUCKETS = 10  # ...piled into 10 time buckets


def _measure(spark, df) -> dict:
    with MeasuredRun(spark) as m:
        n = df.count()
    row = {"wall_s": round(m.stats.wall_secs, 2), "pairs": n}
    if m.stats.bytes_measured:
        row["shuffle_mb"] = round(m.stats.shuffle_bytes / 1e6, 2)
        row["n_stages"] = m.stats.extra.get("n_stages")
    return row


def _write_once(df, path):
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df.repartition(32).write.mode("overwrite").parquet(path)
    return path


def _intervals(spark, scale: int, hot: bool):
    """Deterministic synthetic intervals: n = BASE_ROWS*scale rows over
    k = n/ROWS_PER_KEY keys, each key's ~15 intervals uniform in its
    own 400-unit window (so per-key overlap density — and therefore
    output pairs per key — is scale-invariant). ``hot`` reassigns
    HOT_FRAC of all rows to key 0 with starts in HOT_BUCKETS buckets."""
    n = BASE_ROWS * scale
    n_keys = n // ROWS_PER_KEY
    base = spark.range(n).select(
        F.col("id"),
        F.pmod(F.col("id"), F.lit(n_keys)).alias("key"),
        F.pmod(F.xxhash64("id"), F.lit(KEY_WINDOW)).alias("off"),
        (10 + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(20))).alias("len"),
    )
    ivl = base.select(
        "id",
        "key",
        (F.col("key") * 1000 + F.col("off")).alias("s"),
        (F.col("key") * 1000 + F.col("off") + F.col("len")).alias("e"),
    )
    if hot:
        n_hot = int(n * HOT_FRAC)
        span = HOT_BUCKETS * BUCKET_W
        ivl = ivl.select(
            "id",
            F.when(F.col("id") < n_hot, F.lit(0))
            .otherwise(F.col("key"))
            .alias("key"),
            F.when(
                F.col("id") < n_hot,
                F.pmod(F.xxhash64("id", F.lit(2)), F.lit(span)),
            )
            .otherwise(F.col("s"))
            .alias("s"),
            F.when(
                F.col("id") < n_hot,
                F.pmod(F.xxhash64("id", F.lit(2)), F.lit(span))
                + F.col("e")
                - F.col("s"),
            )
            .otherwise(F.col("e"))
            .alias("e"),
        )
    return ivl


def _pairs(spark, path):
    df = spark.read.parquet(path)
    left = df.select(
        "key", F.col("id").alias("ka"), F.col("s").alias("sa"),
        F.col("e").alias("ea"),
    )
    right = df.select(
        "key", F.col("id").alias("kb"), F.col("s").alias("sb"),
        F.col("e").alias("eb"),
    )
    return interval_overlap_join(
        left, right, ["key"], "sa", "ea", "sb", "eb", BUCKET_W
    ).filter(F.col("ka") < F.col("kb"))


def growth(spark, workdir: str) -> dict:
    out = {"exp": "interval_overlap_growth", "bucket_w": BUCKET_W}
    for scale in (1, 10, 100):
        path = _write_once(
            _intervals(spark, scale, hot=False),
            os.path.join(workdir, f"ivl_uniform_{scale}x"),
        )
        if _wanted(f"uniform_{scale}x"):
            out[f"uniform_{scale}x"] = _measure(spark, _pairs(spark, path))
    return out


def skew(spark, workdir: str) -> dict:
    """Same 10x row count, hot-key layout, three regimes:
    default AQE thresholds (documenting they do NOT fire at this
    cell size), aggressive thresholds (forcing OptimizeSkewedJoin to
    engage on this plan shape), and the uniform layout as control."""
    out = {
        "exp": "interval_overlap_skew",
        "hot_frac": HOT_FRAC,
        "hot_buckets": HOT_BUCKETS,
    }
    path = _write_once(
        _intervals(spark, 10, hot=True),
        os.path.join(workdir, "ivl_hot_10x"),
    )
    if _wanted("skew_default"):
        df = _pairs(spark, path)
        out["skew_default"] = _measure(spark, df)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out["skew_default"]["aqe_skew_split"] = "skew=true" in plan
    if _wanted("skew_aggressive"):
        old = {
            k: spark.conf.get(k, None)
            for k in (
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            )
        }
        try:
            spark.conf.set(
                "spark.sql.adaptive.skewJoin."
                "skewedPartitionThresholdInBytes",
                "256k",
            )
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k"
            )
            df = _pairs(spark, path)
            out["skew_aggressive"] = _measure(spark, df)
            plan = df._jdf.queryExecution().executedPlan().toString()
            out["skew_aggressive"]["aqe_skew_split"] = "skew=true" in plan
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
    return out


_ONLY = None


def _wanted(key: str) -> bool:
    return _ONLY is None or key == _ONLY


def main():
    global _ONLY
    workdir = (
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scaling_r9"
    )
    _ONLY = sys.argv[2] if len(sys.argv) > 2 else None
    os.makedirs(workdir, exist_ok=True)
    spark = get_spark(
        extra_conf={
            "spark.ui.enabled": "true",
            # SMJ regime at every scale: the curve and the skew claim
            # are about the shuffled join, not broadcast
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        }
    )
    spark.sparkContext.setLogLevel("ERROR")
    for fn in (growth, skew):
        row = fn(spark, workdir)
        if len(row) > 2:
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
