"""Round-8 scaling checks: the Bloom prefilter's shuffle elimination
and the survival/experiment tier's alphabet saturation at 1x/10x/100x
input growth.

Claims under test:
- bloom_prefilter: in the no-broadcast regime (the 100 TB scenario the
  sketch exists for — a build side past the broadcast budget), a plain
  SMJ semi-join shuffles the PROBE CORPUS, linear in probe rows; the
  bloom path tests membership row-locally inside the probe scan, so
  only the ~|matches| (+ the bounded false-positive overhead)
  survivors reach the exchange — probe-side shuffle saturates at the
  match size while input grows.
- log_rank: subjects collapse map-side into the (group x time)
  alphabet before any exchange. Replicating order ROWS (same
  customers, same dates) grows the scan 100x while the post-collapse
  frame — and therefore shuffle — stays put.
- cuped: one user-keyed collapse + one single-row moment exchange;
  with a fixed user population, shuffle saturates at |users| rows
  under any row growth.

Usage: python tools/scaling_round8.py [workdir] [measure_key]
Prints one JSON line per experiment. With a measure_key (e.g.
``bloom_plain_10x``) only that variant is measured — the intended
harness runs ONE variant per process (fresh JVM, UI on for stage
metrics) so AQE exchange reuse and warm caches can't flatter a
variant (the round-6 MeasuredRun lesson).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lambda_refarch_mapreduce_spark import get_spark, load_table  # noqa: E402
from lambda_refarch_mapreduce_spark.metrics import MeasuredRun  # noqa: E402
from lambda_refarch_mapreduce_spark.operators import (  # noqa: E402
    analytics,
    sketch,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _measure(spark, df) -> dict:
    with MeasuredRun(spark) as m:
        n = df.count()
    row = {"wall_s": round(m.stats.wall_secs, 2), "rows": n}
    if m.stats.bytes_measured:
        row["shuffle_mb"] = round(m.stats.shuffle_bytes / 1e6, 2)
    return row


def _write_once(df, path):
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df.repartition(32).write.mode("overwrite").parquet(path)
    return path


def bloom_prefilter(spark, workdir: str) -> dict:
    """Probe at 1x/10x against a fixed 50k-key build side, broadcast
    pinned OFF (static and adaptive) so the exact join must SMJ —
    plain semi vs bloom-prefiltered semi."""
    n_keys, key_space = 50_000, 5_000_000
    n_bits, k = 1 << 20, 2
    keys_path = _write_once(
        spark.range(n_keys).select((F.col("id") * 97).alias("k")),
        os.path.join(workdir, "bloom_keys"),
    )
    probes = {}
    for scale in (1, 10):
        o = load_table(spark, SF_DIR, "orders")
        reps = [
            o.select(
                F.pmod(
                    F.xxhash64(F.col("o_orderkey") + F.lit(r * 1_000_000)),
                    F.lit(key_space),
                ).alias("pk"),
                "o_totalprice",
            )
            for r in range(scale)
        ]
        big = reps[0]
        for rdf in reps[1:]:
            big = big.unionAll(rdf)
        probes[scale] = _write_once(
            big, os.path.join(workdir, f"bloom_probe_{scale}x")
        )

    keys = spark.read.parquet(keys_path)
    words = sketch.bloom_words(
        sketch.bloom_bits(keys, "k", n_bits, k), n_bits
    )
    out = {"exp": "bloom_prefilter", "n_keys": n_keys, "n_bits": n_bits}
    old_static = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        for scale, path in probes.items():
            probe = spark.read.parquet(path)
            plain = probe.join(
                keys, probe["pk"] == keys["k"], "left_semi"
            ).agg(F.sum(F.round(F.col("o_totalprice") * 100)).alias("s"))
            bloomed = (
                probe.filter(
                    sketch.bloom_might_contain(
                        F.col("pk"), words, n_bits, k
                    )
                )
                .join(keys, F.col("pk") == keys["k"], "left_semi")
                .agg(
                    F.sum(F.round(F.col("o_totalprice") * 100)).alias("s")
                )
            )
            if _wanted(f"bloom_plain_{scale}x"):
                out[f"plain_{scale}x"] = _measure(spark, plain)
            if _wanted(f"bloom_bloom_{scale}x"):
                out[f"bloom_{scale}x"] = _measure(spark, bloomed)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_static)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    return out


def _orders_replicated(spark, workdir, scale):
    """Row growth WITHOUT key growth: same customers, same dates, the
    per-key collapse must absorb every replica map-side."""
    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderdate"
    )
    reps = [o] * scale
    big = reps[0]
    for rdf in reps[1:]:
        big = big.unionAll(rdf)
    return _write_once(
        big, os.path.join(workdir, f"orders_rep_{scale}x")
    )


def log_rank_saturation(spark, workdir: str) -> dict:
    seg = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    out = {"exp": "log_rank_saturation"}
    for scale in (1, 10, 100):
        path = _orders_replicated(spark, workdir, scale)
        o = spark.read.parquet(path).select(
            "o_custkey", F.to_date("o_orderdate").alias("d")
        )
        pu = o.groupBy("o_custkey").agg(
            F.min("d").alias("f"), F.max("d").alias("l")
        )
        hz = o.agg(F.max("d").alias("h"))
        subj = (
            pu.join(seg, "o_custkey")
            .crossJoin(F.broadcast(hz))
            .select(
                (F.datediff("l", "f") + 1).cast("long").alias("t"),
                (F.datediff("h", "l") >= 365).cast("int").alias("event"),
                F.col("c_mktsegment").alias("g"),
            )
        )
        df = analytics.log_rank_from_subjects(
            subj, "t", "event", "g", "BUILDING", "MACHINERY"
        )
        if _wanted(f"logrank_{scale}x"):
            out[f"{scale}x"] = _measure(spark, df)
    return out


def cuped_saturation(spark, workdir: str) -> dict:
    out = {"exp": "cuped_saturation"}
    for scale in (1, 10, 100):
        e0 = load_table(spark, SF_DIR, "events").select(
            "user_id",
            F.to_date("ts").alias("dd"),
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        reps = [e0] * scale
        big = reps[0]
        for rdf in reps[1:]:
            big = big.unionAll(rdf)
        path = _write_once(
            big, os.path.join(workdir, f"events_rep_{scale}x")
        )
        e = spark.read.parquet(path)
        mn = e.agg(F.min("dd").alias("m"))
        pre = F.datediff("dd", "m") < 15
        pu = (
            e.crossJoin(F.broadcast(mn))
            .groupBy("user_id")
            .agg(
                F.sum(F.when(pre, F.col("cents")).otherwise(0)).alias("x"),
                F.sum(
                    F.when(
                        (~pre) & (F.col("event_type") == "purchase"),
                        F.col("cents"),
                    ).otherwise(0)
                ).alias("y"),
            )
        )
        units = pu.select(
            "y",
            "x",
            F.when(F.pmod(F.col("user_id"), F.lit(2)) == 0, F.lit("a"))
            .otherwise(F.lit("b"))
            .alias("g"),
        )
        df = analytics.cuped_adjusted_diff(units, "y", "x", "g", "a", "b")
        if _wanted(f"cuped_{scale}x"):
            out[f"{scale}x"] = _measure(spark, df)
    return out


_ONLY = None


def _wanted(key: str) -> bool:
    return _ONLY is None or key == _ONLY


def main():
    global _ONLY
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scaling_r8"
    _ONLY = sys.argv[2] if len(sys.argv) > 2 else None
    os.makedirs(workdir, exist_ok=True)
    # UI on: MeasuredRun reads per-stage shuffle bytes from the REST API
    spark = get_spark(extra_conf={"spark.ui.enabled": "true"})
    for fn in (bloom_prefilter, log_rank_saturation, cuped_saturation):
        row = fn(spark, workdir)
        if len(row) > (3 if row["exp"] == "bloom_prefilter" else 1):
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
