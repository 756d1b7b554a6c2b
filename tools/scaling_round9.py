"""Round-9 scaling checks: the interval-overlap join's growth curve
and its skew story (VERDICT r8 "next round" #3 — the one r8 operator
that landed without an at-scale measurement).

Claims under test (operators/relational.py interval_overlap_join):
- growth: with per-key interval density held constant and the KEY
  ALPHABET growing with the rows (the realistic 100 TB shape — more
  customers, not denser customers), wall and shuffle grow ~linearly:
  the plan is one co-keyed exchange on (key, bucket) and the exploded
  row count is fan-out * rows, fan-out ~2 at width ~ interval length.
- skew, and what "AQE splits hot buckets" actually means here. Two
  distinct hot-cell regimes exist and the experiment separates them:
  (a) SELF-JOIN hot cell — a hot key piles intervals into a few time
  buckets on BOTH sides. The pressure is quadratic join OUTPUT per
  cell, not input partition bytes (the exploded hot rows are a few
  MB), so AQE's skew-join — which triggers on INPUT partition size —
  correctly does not fire, and cannot help: no input split shrinks
  an |L_cell| x |R_cell| product. The mitigations are semantic
  (narrower bucket_width, the max_fanout tripwire). Measured: 7.4x
  output concentration costs ~1% wall at 10x scale.
  (b) ASYMMETRIC hot cell — a big probe side piles rows into a hot
  (key, bucket) while the other side stays thin (events x
  maintenance-windows shape). Here the input partition IS skewed,
  OptimizeSkewedJoin's split-and-replicate is exactly right, and the
  experiment proves it engages on this plan shape (skew=true in the
  final SMJ) under thresholds proportionate to the data — the
  defaults (256 MB / 5x median) are sized for clusters, so the
  sf0.1-scale run documents no-fire under defaults and fire under
  scaled-down thresholds.

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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BASE_ROWS = 150_000  # ~ sf0.1 orders
ROWS_PER_KEY = 15
KEY_WINDOW = 400  # each key's intervals live in a 400-unit window
BUCKET_W = 16  # ~ typical interval length (10..29)
HOT_FRAC = 0.005  # skew: 0.5% of all rows on ONE key...
HOT_BUCKETS = 10  # ...piled into 10 time buckets


_LAST_PLAN = ""


def _measure(spark, df) -> dict:
    """Count rows through the df's OWN QueryExecution (df.count()
    would spawn a fresh one, so the AQE-final plan — where skew=true
    markers live — would never be observable); the executed final
    plan lands in _LAST_PLAN for the caller."""
    global _LAST_PLAN
    counted = df.agg(F.count(F.lit(1)).alias("n"))
    with MeasuredRun(spark) as m:
        n = counted.collect()[0]["n"]
    _LAST_PLAN = counted._jdf.queryExecution().executedPlan().toString()
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


def _asym_tables(spark, workdir):
    """The asymmetric shape: a 1.5M-row probe side with HALF its rows
    on key 0 inside a 10-bucket hot window (the exploded hot cells
    are ~2.5x the median shuffle partition), joined to the plain
    150k-row uniform side (thin in the hot cells)."""
    n = BASE_ROWS * 10
    n_hot = n // 2
    span = HOT_BUCKETS * BUCKET_W
    probe = _intervals(spark, 10, hot=False).select(
        "id",
        F.when(F.col("id") < n_hot, F.lit(0)).otherwise(F.col("key")).alias(
            "key"
        ),
        F.when(
            F.col("id") < n_hot,
            F.pmod(F.xxhash64("id", F.lit(3)), F.lit(span)),
        )
        .otherwise(F.col("s"))
        .alias("s"),
        F.when(
            F.col("id") < n_hot,
            F.pmod(F.xxhash64("id", F.lit(3)), F.lit(span))
            + F.col("e")
            - F.col("s"),
        )
        .otherwise(F.col("e"))
        .alias("e"),
    )
    ppath = _write_once(probe, os.path.join(workdir, "ivl_asym_probe"))
    wpath = _write_once(
        _intervals(spark, 1, hot=False),
        os.path.join(workdir, "ivl_asym_windows"),
    )
    return ppath, wpath


def _asym_pairs(spark, ppath, wpath):
    p = spark.read.parquet(ppath)
    w = spark.read.parquet(wpath)
    left = p.select(
        "key", F.col("id").alias("ka"), F.col("s").alias("sa"),
        F.col("e").alias("ea"),
    )
    right = w.select(
        "key", F.col("id").alias("kb"), F.col("s").alias("sb"),
        F.col("e").alias("eb"),
    )
    return interval_overlap_join(
        left, right, ["key"], "sa", "ea", "sb", "eb", BUCKET_W
    )


def skew(spark, workdir: str) -> dict:
    """Hot-cell regimes (module docstring): the self-join hot cell
    under default AQE conf (output-bound — skew split correctly
    no-fires), then the asymmetric hot cell under default and
    scaled-down thresholds (input-bound — skew split must engage)."""
    out = {
        "exp": "interval_overlap_skew",
        "hot_frac": HOT_FRAC,
        "hot_buckets": HOT_BUCKETS,
    }
    if _ONLY is None or _ONLY.startswith("selfjoin"):
        path = _write_once(
            _intervals(spark, 10, hot=True),
            os.path.join(workdir, "ivl_hot_10x"),
        )
    if _wanted("selfjoin_hot"):
        out["selfjoin_hot"] = _measure(spark, _pairs(spark, path))
        out["selfjoin_hot"]["aqe_skew_split"] = "skew=true" in _LAST_PLAN
    if _ONLY is None or _ONLY.startswith("asym"):
        ppath, wpath = _asym_tables(spark, workdir)
    if _wanted("asym_default"):
        out["asym_default"] = _measure(spark, _asym_pairs(spark, ppath, wpath))
        out["asym_default"]["aqe_skew_split"] = "skew=true" in _LAST_PLAN
    if _wanted("asym_scaled_thresholds"):
        old = {
            k: spark.conf.get(k, None)
            for k in (
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            )
        }
        try:
            # the cluster defaults (256 MB / 5x) scaled to sf0.1-size
            # partitions: threshold ~ a few MB, factor 2, 1 MB target
            # split size — proportionate, not exotic
            spark.conf.set(
                "spark.sql.adaptive.skewJoin."
                "skewedPartitionThresholdInBytes",
                "2m",
            )
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m"
            )
            out["asym_scaled_thresholds"] = _measure(
                spark, _asym_pairs(spark, ppath, wpath)
            )
            out["asym_scaled_thresholds"]["aqe_skew_split"] = (
                "skew=true" in _LAST_PLAN
            )
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
    return out


def _events_replicated(spark, workdir, scale):
    """Row growth WITHOUT alphabet growth: same users, same days, same
    value distribution — the collapse stages must absorb replicas."""
    from lambda_refarch_mapreduce_spark import load_table

    e = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_type", "value", "event_id"
    )
    reps = [e] * scale
    big = reps[0]
    for rdf in reps[1:]:
        big = big.unionAll(rdf)
    return _write_once(
        big, os.path.join(workdir, f"events_rep_{scale}x")
    )


def spearman_growth(spark, workdir: str) -> dict:
    """Spearman (operators.analytics.spearman_rho): the rank-building
    side (per-distinct-value counts + prefix_sums) saturates at the
    VALUE ALPHABET under row replication, while the rank join-back is
    the honest linear term — the corpus rides one co-keyed shuffle to
    meet its ranks. Expect shuffle growth well below 10x under 10x
    rows (the alphabet frames are fixed; only the join-back rows
    replicate)."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        spearman_rho,
    )

    out = {"exp": "spearman_growth"}
    for scale in (1, 10, 100):
        path = _events_replicated(spark, workdir, scale)
        e = spark.read.parquet(path).select(
            F.pmod(F.col("user_id"), F.lit(97)).alias("x"),
            F.round(F.col("value") * 100).cast("long").alias("y"),
        )
        if _wanted(f"spearman_{scale}x"):
            out[f"spearman_{scale}x"] = _measure(
                spark, spearman_rho(e, "x", "y")
            )
    return out


def sprt_growth(spark, workdir: str) -> dict:
    """SPRT daily walk: rows collapse map-side into the DAY alphabet
    before the prefix-sum exchange — shuffle must saturate at |days|
    under any row growth (the log_rank posture, SCALING.md r8)."""
    out = {"exp": "sprt_growth"}
    for scale in (1, 10, 100):
        path = _events_replicated(spark, workdir, scale)
        if not _wanted(f"sprt_{scale}x"):
            continue
        from lambda_refarch_mapreduce_spark.operators.relational import (
            prefix_sums,
        )

        day = (
            spark.read.parquet(path)
            .filter(F.col("event_type").isin("purchase", "click"))
            .select(
                F.datediff(
                    F.to_date("ts"), F.lit("1970-01-01").cast("date")
                )
                .cast("long")
                .alias("dd"),
                F.when(F.col("event_type") == "purchase", 1)
                .otherwise(0)
                .alias("is_x"),
            )
            .groupBy("dd")
            .agg(F.sum("is_x").alias("x"), F.count(F.lit(1)).alias("m"))
        )
        cum = prefix_sums(day, [F.col("dd")], ["x", "m"])
        walk = cum.select(
            "dd",
            (
                F.col("x_cum") * 223144
                + (F.col("m_cum") - F.col("x_cum")) * (-182322)
            ).alias("v"),
        )
        out[f"sprt_{scale}x"] = _measure(spark, walk)
    return out


def _measure_values(spark, df) -> dict:
    """Collect the df's ACTUAL rows (bounded output only). The
    count-based _measure lets Catalyst prune unreferenced value
    columns — for attribution that pruned credit, the windows, and
    the whole user-keyed exchange (0.01 MB "shuffle"), measuring an
    empty plan. Collecting the real values makes every column load-
    bearing."""
    global _LAST_PLAN
    with MeasuredRun(spark) as m:
        rows = df.collect()
    _LAST_PLAN = df._jdf.queryExecution().executedPlan().toString()
    out = {"wall_s": round(m.stats.wall_secs, 2), "pairs": len(rows)}
    if m.stats.bytes_measured:
        out["shuffle_mb"] = round(m.stats.shuffle_bytes / 1e6, 2)
        out["n_stages"] = m.stats.extra.get("n_stages")
    return out


def attribution_growth(spark, workdir: str) -> dict:
    """Position-based attribution: ONE user-keyed window pass over the
    corpus — rows replicate with a FIXED user population, so shuffle
    is honestly LINEAR (every event rides the journey window); the
    question measured is the constant factor and that the plan stays
    a single co-keyed exchange at every size."""
    from pyspark.sql.window import Window

    out = {"exp": "attribution_growth"}
    for scale in (1, 10, 100):
        path = _events_replicated(spark, workdir, scale)
        if not _wanted(f"attribution_{scale}x"):
            continue
        e = spark.read.parquet(path)
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        wk = Window.partitionBy("user_id")
        j = e.select(
            F.col("event_type").alias("channel"),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wk).alias("k"),
        )
        cr = j.select(
            "channel",
            F.when(F.col("k") == 1, F.lit(10000000000))
            .when(F.col("k") == 2, F.lit(5000000000))
            .when(
                (F.col("rn") == 1) | (F.col("rn") == F.col("k")),
                F.lit(4000000000),
            )
            .otherwise(F.expr("2000000000 div (k - 2)"))
            .alias("credit"),
        )
        out[f"attribution_{scale}x"] = _measure_values(
            spark, cr.groupBy("channel").agg(F.sum("credit").alias("c"))
        )
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
    for fn in (growth, skew, spearman_growth, sprt_growth, attribution_growth):
        row = fn(spark, workdir)
        if any(isinstance(v, dict) for v in row.values()):
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
