"""Scaling check for incremental_agg_update: FIXED changelog volume,
base table grown 1x/10x/100x of sf0.1 orders. The claim under test is
"MV refresh at change cost, not table cost" — refresh shuffle must
stay flat while the base grows, because the compaction window, delta
aggregates and view merge are all changelog-sized; the only
table-sized stage is the old-row key semi-join probe, a parallel scan.

Usage: python tools/scaling_incremental_mv.py [workdir]
Prints one JSON line {scale: {"wall_s", "rows", "base_rows",
"shuffle_mb"}}. Measured round-5 result (SCALING.md): shuffle flat at
~1.5 MB across two decades of base growth.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lambda_refarch_mapreduce_spark import get_spark, load_table  # noqa: E402
from lambda_refarch_mapreduce_spark.metrics import MeasuredRun  # noqa: E402
from lambda_refarch_mapreduce_spark.operators import analytics  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = (1, 10, 100)


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_incr"
    spark = get_spark(
        "scaling-incremental-mv", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for scale in SCALES:
        p = os.path.join(workdir, f"base_{scale}x")
        if not os.path.exists(os.path.join(p, "_SUCCESS")):
            base0 = load_table(spark, SF_DIR, "orders").select(
                "o_orderkey", "o_custkey", "o_totalprice"
            )
            reps = [
                base0.select(
                    (F.col("o_orderkey") + r * 10_000_000).alias("o_orderkey"),
                    "o_custkey",
                    "o_totalprice",
                )
                for r in range(scale)
            ]
            big = reps[0]
            for rep in reps[1:]:
                big = big.unionByName(rep)
            big.repartition(32).write.mode("overwrite").parquet(p)
        base = spark.read.parquet(p).withColumn(
            "segment", (F.col("o_custkey") % 50).cast("int")
        )
        # the stored view is materialized OUTSIDE the refresh timer —
        # production reads it, it doesn't recompute it
        mvp = os.path.join(workdir, f"mv_{scale}x")
        if not os.path.exists(os.path.join(mvp, "_SUCCESS")):
            base.groupBy("segment").agg(
                F.sum("o_totalprice").alias("revenue"),
                F.count(F.lit(1)).alias("n_orders"),
            ).write.mode("overwrite").parquet(mvp)
        mv = spark.read.parquet(mvp)
        # FIXED change volume: only the first replica's keys change
        k = F.col("o_orderkey")
        first = base.filter(k < 10_000_000)
        upd = first.filter(k % 7 == 0).select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
            F.lit(1).alias("seq"),
            F.lit("U").alias("op"),
            "segment",
        )
        dele = first.filter(k % 14 == 0).select(
            "o_orderkey", "o_custkey", "o_totalprice",
            F.lit(2).alias("seq"), F.lit("D").alias("op"), "segment",
        )
        changes = upd.unionByName(dele)
        with MeasuredRun(spark) as m:
            n = analytics.incremental_agg_update(
                mv, base, changes,
                ["o_orderkey"], "seq", "op", ["segment"],
                "o_totalprice", "revenue", "n_orders",
            ).count()
        row = {
            "wall_s": round(m.stats.wall_secs, 2),
            "rows": n,
            "base_rows": base.count(),
        }
        if m.stats.bytes_measured:
            row["shuffle_mb"] = round(m.stats.shuffle_bytes / 1e6, 1)
        out[f"{scale}x"] = row
        print(f"  {scale}x: {row}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
