"""Round-6 scaling checks: the distributed prefix-sum CDF (KS test),
the apriori-pruned market-basket pair join, and the merge-on-read MV
refresh (the streaming maintainer's per-batch plan) at 1x/10x/100x.

Claims under test:
- prefix_sums keeps the KS CDF computation distributed: wall and
  shuffle grow ~linearly in the distinct-value count, and the naive
  `sum() over (order by v)` single-partition window (measured at
  1x/10x only) loses by a growing factor because every grouped row
  funnels through one reducer.
- market_basket_part_pairs: shuffle tracks the (basket, item) volume
  linearly; the pair aggregate never explodes because the self-join
  is co-keyed on the basket id and capped baskets bound the fan-out.
- the continuous MV maintainer's per-batch refresh — view refresh
  against apply_cdc(base0, overlay) with a FIXED overlay and batch —
  stays change-cost as the base grows 100x: the overlay anti-join
  adds a broadcast probe, never a base shuffle (the plan
  tests/test_scale_plans.py pins), so refresh shuffle stays flat.

Usage: python tools/scaling_round6.py [workdir]
Prints one JSON line per experiment.
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
from lambda_refarch_mapreduce_spark.operators.relational import (  # noqa: E402
    prefix_sums,
)
from lambda_refarch_mapreduce_spark.plans.catalog_analytics import (  # noqa: E402
    BASKET_MAX_ITEMS,
    BASKET_MIN_SUPPORT,
    BASKET_PAIR_TOP_N,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = (1, 10, 100)


def _measure(spark, df) -> dict:
    with MeasuredRun(spark) as m:
        n = df.count()
    row = {"wall_s": round(m.stats.wall_secs, 2), "rows": n}
    if m.stats.bytes_measured:
        row["shuffle_mb"] = round(m.stats.shuffle_bytes / 1e6, 1)
    return row


def ks_cdf(spark, workdir: str) -> dict:
    out = {}
    for scale in SCALES:
        p = os.path.join(workdir, f"ks_{scale}x")
        if not os.path.exists(os.path.join(p, "_SUCCESS")):
            e0 = load_table(spark, SF_DIR, "events").select(
                "event_type", "value"
            ).filter(F.col("event_type").isin("click", "error"))
            reps = [
                # per-replica value perturbation so the distinct-value
                # (grouped CDF) frame actually grows with scale
                e0.select(
                    "event_type", (F.col("value") + r * 1e-4).alias("value")
                )
                for r in range(scale)
            ]
            big = reps[0]
            for rep in reps[1:]:
                big = big.unionByName(rep)
            big.repartition(32).write.mode("overwrite").parquet(p)
        e = spark.read.parquet(p)
        g = e.groupBy(F.col("value").alias("v")).agg(
            F.sum((F.col("event_type") == "click").cast("long")).alias("ca"),
            F.sum((F.col("event_type") == "error").cast("long")).alias("cb"),
        )
        cum = prefix_sums(g, [F.col("v")], ["ca", "cb"])
        totals = g.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
        d = F.abs(F.col("ca_cum") / F.col("na") - F.col("cb_cum") / F.col("nb"))
        distributed = cum.crossJoin(F.broadcast(totals)).agg(
            F.max(d).alias("d")
        )
        row = {"prefix_sums": _measure(spark, distributed)}
        if scale <= 10:
            from pyspark.sql.window import Window

            w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
            naive = (
                g.select(
                    F.sum("ca").over(w).alias("cca"),
                    F.sum("cb").over(w).alias("ccb"),
                )
                .crossJoin(F.broadcast(totals))
                .agg(F.max(F.abs(F.col("cca") / F.col("na")
                                 - F.col("ccb") / F.col("nb"))).alias("d"))
            )
            row["single_partition_window"] = _measure(spark, naive)
        out[f"{scale}x"] = row
        print(f"  ks {scale}x: {row}", file=sys.stderr)
    return out


def basket(spark, workdir: str) -> dict:
    out = {}
    for scale in SCALES:
        p = os.path.join(workdir, f"basket_{scale}x")
        if not os.path.exists(os.path.join(p, "_SUCCESS")):
            li0 = load_table(spark, SF_DIR, "lineitem").select(
                "l_orderkey", "l_partkey"
            )
            reps = [
                li0.select(
                    (F.col("l_orderkey") + r * 10_000_000).alias("o"),
                    F.col("l_partkey").alias("p"),
                )
                for r in range(scale)
            ]
            big = reps[0]
            for rep in reps[1:]:
                big = big.unionByName(rep)
            big.repartition(32).write.mode("overwrite").parquet(p)
        li = spark.read.parquet(p).distinct()
        sized = (
            li.groupBy("o").agg(F.count(F.lit(1)).alias("__sz"))
            .filter(F.col("__sz") <= BASKET_MAX_ITEMS).select("o")
        )
        kept = li.join(sized, "o", "left_semi")
        freq = (
            kept.groupBy("p").agg(F.count(F.lit(1)).alias("__sup"))
            .filter(F.col("__sup") >= BASKET_MIN_SUPPORT * scale).select("p")
        )
        fi = kept.join(F.broadcast(freq), "p", "left_semi")
        a = fi.select("o", F.col("p").alias("p_a"))
        b = fi.select("o", F.col("p").alias("p_b"))
        pairs = (
            a.join(b, "o").filter(F.col("p_a") < F.col("p_b"))
            .groupBy("p_a", "p_b").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), "p_a", "p_b")
            .limit(BASKET_PAIR_TOP_N)
        )
        row = _measure(spark, pairs)
        out[f"{scale}x"] = row
        print(f"  basket {scale}x: {row}", file=sys.stderr)
    return out


def mv_overlay_refresh(spark, workdir: str) -> dict:
    """The maintainer's steady-state per-batch plan: refresh against
    the merge-on-read effective base (base0 + FIXED overlay) with a
    FIXED batch, base grown 1x/10x/100x."""
    out = {}
    for scale in SCALES:
        p = os.path.join(workdir, f"base_{scale}x")  # shared with the
        # round-5 incremental-MV layout when run in the same workdir
        if not os.path.exists(os.path.join(p, "_SUCCESS")):
            base0 = load_table(spark, SF_DIR, "orders").select(
                "o_orderkey", "o_custkey", "o_totalprice"
            )
            reps = [
                base0.select(
                    (F.col("o_orderkey") + r * 10_000_000).alias("o_orderkey"),
                    "o_custkey", "o_totalprice",
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
        mvp = os.path.join(workdir, f"mv_{scale}x")
        if not os.path.exists(os.path.join(mvp, "_SUCCESS")):
            base.groupBy("segment").agg(
                F.sum("o_totalprice").alias("revenue"),
                F.count(F.lit(1)).alias("n_orders"),
            ).write.mode("overwrite").parquet(mvp)
        mv = spark.read.parquet(mvp)
        k = F.col("o_orderkey")
        first = base.filter(k < 10_000_000)
        # FIXED overlay (an earlier batch's winners) and FIXED batch
        overlay = first.filter(k % 7 == 0).select(
            "o_orderkey", "o_custkey",
            F.round(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
            "segment", F.lit(1).cast("long").alias("seq"),
            F.lit("U").alias("op"),
        )
        ovp = os.path.join(workdir, f"overlay_{scale}x")
        if not os.path.exists(os.path.join(ovp, "_SUCCESS")):
            overlay.write.mode("overwrite").parquet(ovp)
        ov = spark.read.parquet(ovp)
        batch = first.filter(k % 14 == 0).select(
            "o_orderkey", "o_custkey",
            F.round(F.col("o_totalprice") * 0.9, 2).alias("o_totalprice"),
            "segment", F.lit(2).cast("long").alias("seq"),
            F.lit("U").alias("op"),
        )
        eff = analytics.apply_cdc(
            base, ov.select(*base.columns, "seq", "op"), ["o_orderkey"], "seq"
        )
        refreshed = analytics.incremental_agg_update(
            mv, eff, batch, ["o_orderkey"], "seq", "op",
            ["segment"], "o_totalprice", "revenue", "n_orders",
        )
        row = _measure(spark, refreshed)
        row["base_rows"] = base.count()
        out[f"{scale}x"] = row
        print(f"  mv-overlay {scale}x: {row}", file=sys.stderr)
    return out


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_r6"
    spark = get_spark(
        "scaling-round6", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps({"ks_cdf": ks_cdf(spark, workdir)}))
    print(json.dumps({"market_basket": basket(spark, workdir)}))
    print(json.dumps({"mv_overlay_refresh": mv_overlay_refresh(spark, workdir)}))


if __name__ == "__main__":
    main()
