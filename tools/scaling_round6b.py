"""Round-6b scaling checks: the statistical-inference tier's plans at
1x/10x/100x input growth.

Claims under test:
- gini (global_rank machinery): the range exchange carries the grouped
  per-customer frame, so wall/shuffle grow ~linearly in the KEY count
  (customers), never superlinearly, and the closing Gini aggregate is
  map-side combinable — no single-partition window anywhere.
- pareto (global_rank + prefix_sums chained): same range-exchange
  shape twice over the per-part frame; linear in |parts|.
- ols (closed-form normal equations): ONE aggregate pass — shuffle is
  a single row of moment sums at EVERY scale (flat, ~KB), wall grows
  only with the scan.
- mann_whitney: the grouped frame is keyed on the value alphabet
  (exact integer cents), so past the scale where every distinct value
  has been seen, shuffle SATURATES at O(|alphabet|) while the input
  grows — the map-side combine absorbs the rows.

Usage: python tools/scaling_round6b.py [workdir]
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
from lambda_refarch_mapreduce_spark.operators.relational import (  # noqa: E402
    global_rank,
    prefix_sums,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = (1, 10, 100)


def _measure(spark, df) -> dict:
    with MeasuredRun(spark) as m:
        n = df.count()
    row = {"wall_s": round(m.stats.wall_secs, 2), "rows": n}
    if m.stats.bytes_measured:
        row["shuffle_mb"] = round(m.stats.shuffle_bytes / 1e6, 2)
    return row


def _replicated(spark, workdir, stem, build):
    """Write the N-x replica table once per scale, read it back (plans
    estimated from parquet stats, not LocalRelation — lesson: in-memory
    frames defeat join-size estimation)."""
    paths = {}
    for scale in SCALES:
        p = os.path.join(workdir, f"{stem}_{scale}x")
        if not os.path.exists(os.path.join(p, "_SUCCESS")):
            big = build(scale)
            big.repartition(32).write.mode("overwrite").parquet(p)
        paths[scale] = p
    return paths


def rank_gini(spark, workdir: str) -> dict:
    def build(scale):
        o0 = load_table(spark, SF_DIR, "orders").select(
            "o_custkey", "o_totalprice"
        )
        reps = [
            o0.select(
                (F.col("o_custkey") + r * 10_000_000).alias("o_custkey"),
                "o_totalprice",
            )
            for r in range(scale)
        ]
        big = reps[0]
        for rep in reps[1:]:
            big = big.unionByName(rep)
        return big

    out = {}
    for scale, p in _replicated(spark, workdir, "gini", build).items():
        o = spark.read.parquet(p)
        g = o.groupBy("o_custkey").agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
        ranked = global_rank(
            g, [F.col("cents"), F.col("o_custkey")], rank_col="i"
        )
        gini = ranked.agg(
            F.round(
                F.lit(2.0)
                * F.sum(F.col("i") * F.col("cents"))
                / (F.count(F.lit(1)) * F.sum("cents"))
                - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1)),
                6,
            ).alias("gini")
        )
        out[f"{scale}x"] = _measure(spark, gini)
        print(f"  gini {scale}x: {out[f'{scale}x']}", file=sys.stderr)
    return out


def pareto(spark, workdir: str) -> dict:
    def build(scale):
        li0 = load_table(spark, SF_DIR, "lineitem").select(
            "l_partkey", "l_extendedprice"
        )
        reps = [
            li0.select(
                (F.col("l_partkey") + r * 10_000_000).alias("p"),
                F.col("l_extendedprice"),
            )
            for r in range(scale)
        ]
        big = reps[0]
        for rep in reps[1:]:
            big = big.unionByName(rep)
        return big

    out = {}
    for scale, p in _replicated(spark, workdir, "pareto", build).items():
        li = spark.read.parquet(p)
        g = li.groupBy("p").agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "cents"
            )
        )
        ranked = global_rank(
            g, [F.col("cents").desc(), F.col("p")], rank_col="rnk"
        )
        cum = prefix_sums(ranked, [F.col("rnk")], ["cents"])
        tot = g.agg(
            F.sum("cents").alias("total"), F.count(F.lit(1)).alias("__n")
        )
        deciles = (
            cum.crossJoin(F.broadcast(tot))
            .select(
                F.expr("cast(((rnk - 1) * 10) div __n + 1 as int)").alias(
                    "decile"
                ),
                "cents_cum",
                "total",
            )
            .groupBy("decile")
            .agg(
                F.count(F.lit(1)).alias("n_parts"),
                F.round(F.max("cents_cum") * 1.0 / F.max("total"), 6).alias(
                    "share"
                ),
            )
        )
        out[f"{scale}x"] = _measure(spark, deciles)
        print(f"  pareto {scale}x: {out[f'{scale}x']}", file=sys.stderr)
    return out


def ols(spark, workdir: str) -> dict:
    def build(scale):
        li0 = load_table(spark, SF_DIR, "lineitem").select(
            "l_quantity", "l_discount", "l_extendedprice"
        )
        reps = [li0 for _ in range(scale)]
        big = reps[0]
        for rep in reps[1:]:
            big = big.unionByName(rep)
        return big

    from lambda_refarch_mapreduce_spark.plans.catalog_analytics import (
        _OLS_B0,
        _OLS_B1,
        _OLS_B2,
        _OLS_R2,
    )

    out = {}
    for scale, p in _replicated(spark, workdir, "ols", build).items():
        li = spark.read.parquet(p)
        s = li.select(
            F.col("l_quantity").cast("long").alias("q"),
            F.round(F.col("l_discount") * 100).cast("long").alias("d"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        )
        a = s.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("q").cast("double").alias("sq"),
            F.sum("d").cast("double").alias("sd"),
            F.sum("y").cast("double").alias("sy"),
            F.sum(F.col("q") * F.col("q")).cast("double").alias("sqq"),
            F.sum(F.col("d") * F.col("d")).cast("double").alias("sdd"),
            F.sum(F.col("q") * F.col("d")).cast("double").alias("sqd"),
            F.sum(F.col("q") * F.col("y")).cast("double").alias("sqy"),
            F.sum(F.col("d") * F.col("y")).cast("double").alias("sdy"),
            F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
            .cast("double")
            .alias("syy"),
        )
        fit = a.selectExpr(
            f"round({_OLS_B0} / 100.0, 4) AS b0",
            f"round({_OLS_B1} / 100.0, 4) AS b1",
            f"round({_OLS_B2} / 100.0, 4) AS b2",
            f"round({_OLS_R2}, 6) AS r2",
        )
        out[f"{scale}x"] = _measure(spark, fit)
        print(f"  ols {scale}x: {out[f'{scale}x']}", file=sys.stderr)
    return out


def mann_whitney(spark, workdir: str) -> dict:
    def build(scale):
        e0 = load_table(spark, SF_DIR, "events").select(
            "event_type", "value"
        ).filter(F.col("event_type").isin("purchase", "click"))
        reps = [e0 for _ in range(scale)]
        big = reps[0]
        for rep in reps[1:]:
            big = big.unionByName(rep)
        return big

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        MW_Z_EXPR as _MW_Z,
    )

    out = {}
    for scale, p in _replicated(spark, workdir, "mw", build).items():
        e = spark.read.parquet(p)
        g = e.groupBy(
            F.round(F.col("value") * 100).cast("long").alias("v")
        ).agg(
            F.sum((F.col("event_type") == "purchase").cast("long")).alias(
                "cp"
            ),
            F.sum((F.col("event_type") == "click").cast("long")).alias("cc"),
        )
        cum = prefix_sums(g, [F.col("v")], ["cc"])
        t = F.col("cp") + F.col("cc")
        a = cum.agg(
            F.sum("cp").alias("n1"),
            F.sum("cc").alias("n2"),
            F.sum(
                F.col("cp")
                * (2 * (F.col("cc_cum") - F.col("cc")) + F.col("cc"))
            ).alias("u2"),
            F.sum(t * t * t - t).alias("ties"),
        ).selectExpr(
            "round(u2 / (2e0 * n1 * n2), 6) AS auc", f"round({_MW_Z}, 6) AS z"
        )
        out[f"{scale}x"] = _measure(spark, a)
        print(f"  mw {scale}x: {out[f'{scale}x']}", file=sys.stderr)
    return out


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_r6b"
    os.makedirs(workdir, exist_ok=True)
    spark = get_spark(
        "scaling-round6b", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in [
        ("rank_gini", rank_gini),
        ("pareto", pareto),
        ("ols", ols),
        ("mann_whitney", mann_whitney),
        ("geo_radius", geo_radius),
    ]:
        print(json.dumps({"experiment": name, "scales": fn(spark, workdir)}))


if __name__ == "__main__":
    main()


def geo_radius(spark, workdir: str) -> dict:
    """Radius join at 1x/10x/100x points with radius shrunk by
    sqrt(scale): expected PAIR OUTPUT stays ~constant (pair count per
    area ~ density^2 * R^2), so the measurement isolates the grid
    machinery — point placement, 9x key explode, cell equi-join —
    which must scale ~linearly in points. The quadratic term the plan
    does NOT pay is candidate volume across cells (bounded per-cell)."""
    import math as _math

    from lambda_refarch_mapreduce_spark.operators.geo import (
        radius_self_join,
    )

    def build(scale):
        c0 = load_table(spark, SF_DIR, "customer").select("c_custkey")
        reps = [
            c0.select(
                (F.col("c_custkey") + r * 10_000_000).alias("id")
            )
            for r in range(scale)
        ]
        big = reps[0]
        for rep in reps[1:]:
            big = big.unionByName(rep)
        return big.selectExpr(
            "id",
            "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT) AS ulat",
            "CAST(conv(substring(md5(CAST(id AS STRING)), 9, 8), 16, 10)"
            " AS BIGINT) AS ulon",
        ).selectExpr(
            "id",
            "(25 + 24 * (ulat / 4294967296e0)) AS lat",
            "(-124 + 57 * (ulon / 4294967296e0)) AS lon",
        )

    out = {}
    for scale, p in _replicated(spark, workdir, "geo", build).items():
        pts = spark.read.parquet(p)
        r_km = 50.0 / _math.sqrt(scale)
        pairs = radius_self_join(
            pts, "id", "lat", "lon", r_km, max_abs_lat=49.0
        )
        out[f"{scale}x"] = {"radius_km": round(r_km, 2), **_measure(spark, pairs)}
        print(f"  geo {scale}x: {out[f'{scale}x']}", file=sys.stderr)
    return out
