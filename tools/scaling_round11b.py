"""Round-11 second-wave scaling checks: the eight newly pre-staged
statistics kernels, each measured on its claimed scale axis.

Claims under test:
- JONCKHEERE-TERPSTRA, CORPUS GROWTH: rows collapse map-side into the
  (group, value) alphabet before the grid is built — 100x rows at a
  fixed alphabet moves wall only by the scan term, post-collapse
  bytes not at all (the Kruskal-Wallis posture; same monitor frame).
- JONCKHEERE-TERPSTRA, ALPHABET GROWTH (the adversarial axis): the
  grid is |values| x k cells and both windows partition perfectly
  (by group, by value) — expect linear wall/shuffle in the alphabet.
- RUNS TEST, SERIES GROWTH: median via prefix_sums, signs via
  global_rank, boundaries via a shift-by-one equi-join — every stage
  linear in the day alphabet, no sequential walk.
- LJUNG-BOX, SERIES GROWTH: the lag join is |days| x max_lag rows of
  metadata — linear in days at fixed lags.
- GEHAN-WILCOXON, TIME-ALPHABET GROWTH: the dense risk table and
  prefix_sums are linear in distinct event times (the log-rank
  shape; the integer-weighted numerator adds no exchange).
- PAGE'S L, BLOCK GROWTH: shares friedman's within-block rank windows
  (measured flat-wall/linear-shuffle to 100k blocks in round 11);
  the position join is a k-row broadcast — expect the same curve.
- McNEMAR, ROW GROWTH: ONE map-side four-counter aggregation — the
  cheapest kernel in the module; wall = scan term only.

Outputs are COLLECTED in full (not counted) — a count() lets Catalyst
prune the value columns and with them the computation itself (the
round-9 attribution lesson).

Usage: python tools/scaling_round11b.py MEASURE_KEY
One variant per process (fresh JVM, UI on). Keys:
  jt_rows_1x jt_rows_10x jt_rows_100x
  jt_alpha_1k jt_alpha_10k jt_alpha_100k
  runs_days_10k runs_days_100k runs_days_1m
  lb_days_10k lb_days_100k lb_days_1m
  gehan_times_1k gehan_times_10k gehan_times_100k
  page_blocks_1x page_blocks_10x page_blocks_100x
  mcnemar_rows_1m mcnemar_rows_10m mcnemar_rows_100m
  wsr_rows_1m wsr_rows_10m wsr_rows_100m   (|d| alphabet fixed at
    ~20k: the signed-rank collapse saturates like the MW family)
  cq_blocks_1x cq_blocks_10x cq_blocks_100x  (blocks x 5 binary
    treatments: two alphabet aggregates, no windows)
  kuiper_alpha_1k kuiper_alpha_10k kuiper_alpha_100k
  cvm_alpha_1k cvm_alpha_10k cvm_alpha_100k  (both on the KS family's
    10M-row frame: one prefix_sums exchange, linear in the alphabet)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lambda_refarch_mapreduce_spark import get_spark  # noqa: E402
from lambda_refarch_mapreduce_spark.metrics import MeasuredRun  # noqa: E402
from lambda_refarch_mapreduce_spark.operators.analytics import (  # noqa: E402
    cochran_q_from_blocks,
    cvm_from_value_counts,
    gehan_wilcoxon_from_counts,
    kuiper_from_value_counts,
    jonckheere_terpstra_from_counts,
    ljung_box_from_series,
    mcnemar_from_pairs,
    page_l_from_blocks,
    runs_test_from_series,
    wilcoxon_signed_rank_from_pairs,
)

JT_BASE_ROWS = 1_000_000
JT_ROWS_ALPHA = 10_000
JT_ALPHA_ROWS = 10_000_000


def _measure(spark, df) -> dict:
    with MeasuredRun(spark) as m:
        rows = df.collect()
    out = {"wall_s": round(m.stats.wall_secs, 2), "out_rows": len(rows)}
    if m.stats.bytes_measured:
        out["shuffle_mb"] = round(m.stats.shuffle_bytes / 1e6, 2)
        out["n_stages"] = m.stats.extra.get("n_stages")
    return out


def _jt_counts(spark, n_rows: int, alphabet: int):
    rows = spark.range(n_rows).select(
        F.pmod(F.col("id"), F.lit(5)).cast("string").alias("g"),
        F.pmod(F.xxhash64("id"), F.lit(alphabet)).alias("v"),
    )
    return rows.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))


def _day_series(spark, n_days: int):
    return spark.range(n_days).select(
        F.col("id").alias("t"),
        (
            1000
            + F.pmod(F.col("id"), F.lit(7)) * 10
            + F.pmod(F.xxhash64("id"), F.lit(100))
        ).alias("v"),
    )


def main() -> None:
    key = sys.argv[1]
    spark = get_spark(
        f"scaling-r11b-{key}", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    if key.startswith("jt_rows_"):
        scale = int(key.removeprefix("jt_rows_").removesuffix("x"))
        n = JT_BASE_ROWS * scale
        df = jonckheere_terpstra_from_counts(
            _jt_counts(spark, n, JT_ROWS_ALPHA)
        )
        row = _measure(spark, df)
        row["n_rows"] = n
    elif key.startswith("jt_alpha_"):
        alpha = {"1k": 1_000, "10k": 10_000, "100k": 100_000}[
            key.removeprefix("jt_alpha_")
        ]
        df = jonckheere_terpstra_from_counts(
            _jt_counts(spark, JT_ALPHA_ROWS, alpha)
        )
        row = _measure(spark, df)
        row["alphabet"] = alpha
        row["grid_cells"] = alpha * 5
    elif key.startswith("runs_days_") or key.startswith("lb_days_"):
        n = {"10k": 10_000, "100k": 100_000, "1m": 1_000_000}[
            key.rsplit("_", 1)[1]
        ]
        series = _day_series(spark, n)
        if key.startswith("runs_"):
            df = runs_test_from_series(series, "t", "v")
        else:
            df = ljung_box_from_series(series, "t", "v", 7)
        row = _measure(spark, df)
        row["n_days"] = n
    elif key.startswith("gehan_times_"):
        nt = {"1k": 1_000, "10k": 10_000, "100k": 100_000}[
            key.removeprefix("gehan_times_")
        ]
        # ~100 subjects per distinct time split across two arms, a
        # late hazard bump on arm b so the statistic is non-trivial
        per_gt = spark.range(nt * 2).select(
            F.when(F.pmod("id", F.lit(2)) == 0, "a")
            .otherwise("b")
            .alias("g"),
            (F.col("id") / 2).cast("long").alias("t"),
            (
                40
                + F.pmod(F.xxhash64("id"), F.lit(20))
                + F.when(
                    (F.pmod("id", F.lit(2)) == 1)
                    & (F.col("id") > nt),
                    10,
                ).otherwise(0)
            ).alias("d"),
            (10 + F.pmod(F.xxhash64("id", "id"), F.lit(10))).alias("c"),
        )
        df = gehan_wilcoxon_from_counts(per_gt)
        row = _measure(spark, df)
        row["n_times"] = nt
    elif key.startswith("page_blocks_"):
        scale = int(key.removeprefix("page_blocks_").removesuffix("x"))
        nb = 1_000 * scale
        k = 5
        cells = spark.range(nb * k).select(
            (F.col("id") / k).cast("long").alias("b"),
            F.pmod(F.col("id"), F.lit(k)).cast("string").alias("t"),
            (
                1000
                + F.pmod(F.col("id"), F.lit(k)) * 3
                + F.pmod(F.xxhash64("id"), F.lit(50))
            ).alias("x"),
        )
        df = page_l_from_blocks(cells, "b", "t", "x")
        row = _measure(spark, df)
        row["n_blocks"] = nb
    elif key.startswith("mcnemar_rows_"):
        n = {"1m": 1_000_000, "10m": 10_000_000, "100m": 100_000_000}[
            key.removeprefix("mcnemar_rows_")
        ]
        pairs = spark.range(n).select(
            (F.pmod(F.xxhash64("id"), F.lit(10)) < 4).alias("a"),
            (F.pmod(F.xxhash64("id", "id"), F.lit(10)) < 3).alias("b"),
        )
        df = mcnemar_from_pairs(pairs)
        row = _measure(spark, df)
        row["n_rows"] = n
    elif key.startswith("wsr_rows_"):
        n = {"1m": 1_000_000, "10m": 10_000_000, "100m": 100_000_000}[
            key.removeprefix("wsr_rows_")
        ]
        pairs = spark.range(n).select(
            F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("a"),
            F.pmod(F.xxhash64("id", "id"), F.lit(10_500)).alias("b"),
        )
        df = wilcoxon_signed_rank_from_pairs(pairs)
        row = _measure(spark, df)
        row["n_rows"] = n
    elif key.startswith("cq_blocks_"):
        scale = int(key.removeprefix("cq_blocks_").removesuffix("x"))
        nb = 1_000 * scale
        k = 5
        cells = spark.range(nb * k).select(
            (F.col("id") / k).cast("long").alias("b"),
            F.pmod(F.col("id"), F.lit(k)).cast("string").alias("t"),
            (F.pmod(F.xxhash64("id"), F.lit(10)) < 3 + F.pmod("id", F.lit(k)))
            .cast("long")
            .alias("x"),
        )
        df = cochran_q_from_blocks(cells, "b", "t", "x")
        row = _measure(spark, df)
        row["n_blocks"] = nb
    elif key.startswith("kuiper_alpha_") or key.startswith("cvm_alpha_"):
        alpha = {"1k": 1_000, "10k": 10_000, "100k": 100_000}[
            key.rsplit("_", 1)[1]
        ]
        rows = spark.range(10_000_000).select(
            F.pmod(F.xxhash64("id"), F.lit(alpha)).alias("v"),
            F.pmod(F.col("id"), F.lit(2)).alias("side"),
        )
        counts = rows.groupBy("v").agg(
            F.sum((F.col("side") == 0).cast("long")).alias("ca"),
            F.sum((F.col("side") == 1).cast("long")).alias("cb"),
        )
        kern = (
            kuiper_from_value_counts
            if key.startswith("kuiper_")
            else cvm_from_value_counts
        )
        df = kern(counts)
        row = _measure(spark, df)
        row["alphabet"] = alpha
    else:
        raise SystemExit(f"unknown key {key!r}")
    row["key"] = key
    print(json.dumps(row, sort_keys=True))


if __name__ == "__main__":
    main()
