"""Round-11 scaling checks for the new statistics shapes: the Pettitt
pair->difference-array changepoint, the Kruskal-Wallis pooled-CDF
rank collapse, and the 3-state Holt-Winters backtest fold.

Claims under test:
- PETTITT, SERIES GROWTH (the adversarial axis): the pair set is
  QUADRATIC in the time alphabet by definition (every i<j pair), so
  wall/shuffle grow ~n^2 — acceptable because calendar series are
  metadata-sized (a decade of days = 3.7k points = 6.7M pairs), and
  the DIFFERENCE ARRAY keeps the split dimension free: U_t for every
  t costs one prefix sum, never the naive n^3 pair-times-split
  explosion. Measured so the n^2 coefficient and the practical
  ceiling are numbers.
- KRUSKAL-WALLIS, CORPUS GROWTH: rows collapse map-side into the
  (group, value) alphabet before any exchange — 100x rows at a fixed
  alphabet should move wall only by the scan term and post-collapse
  bytes not at all.
- KRUSKAL-WALLIS, ALPHABET GROWTH: the pooled-CDF prefix_sums and
  the count frame are linear in the value alphabet.
- HW BACKTEST, KEY GROWTH: same collapsed-row linearity as the r10
  HW fold (shuffle = collapsed rows exactly); the 3-method
  accumulator is a CPU constant, not a shuffle term — byte parity
  with holt_winters_from_series at every K.

Outputs are COLLECTED in full (not counted) — a count() lets
Catalyst prune the value columns and with them the fold/join itself
(the round-9 attribution lesson).

Usage: python tools/scaling_round11.py MEASURE_KEY
One variant per process (fresh JVM, UI on). Keys:
  pt_series_1x pt_series_4x pt_series_16x
  kw_rows_1x kw_rows_10x kw_rows_100x
  kw_alpha_1k kw_alpha_10k kw_alpha_100k
  hwbt_keys_1x hwbt_keys_10x hwbt_keys_100x
  hw_keys_ref_100x   (byte-parity reference: the r10 HW fold at 100x)
  fd_blocks_1x fd_blocks_10x fd_blocks_100x  (pre-staged Friedman:
    blocks x 5 treatments; within-block windows partition perfectly,
    expect linear)
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
    holt_winters_from_series,
    kruskal_wallis_from_counts,
    pettitt_changepoint,
    rolling_backtest_hw,
)

PT_BASE_DAYS = 1_000
KW_BASE_ROWS = 1_000_000
KW_ROWS_ALPHA = 10_000
KW_ALPHA_ROWS = 10_000_000
HWBT_BASE_KEYS = 1_000
SERIES_DAYS = 360


def _measure(spark, df) -> dict:
    with MeasuredRun(spark) as m:
        rows = df.collect()
    out = {"wall_s": round(m.stats.wall_secs, 2), "out_rows": len(rows)}
    if m.stats.bytes_measured:
        out["shuffle_mb"] = round(m.stats.shuffle_bytes / 1e6, 2)
        out["n_stages"] = m.stats.extra.get("n_stages")
    return out


def _single_series(spark, n_days: int):
    return spark.range(n_days).select(
        F.col("id").alias("t"),
        (
            1000
            + F.pmod(F.col("id"), F.lit(7)) * 10
            + F.pmod(F.xxhash64("id"), F.lit(100))
            # a level shift mid-series so the located changepoint is
            # real, not a tie-break artifact
            + F.when(F.col("id") * 2 > n_days, 500).otherwise(0)
        ).alias("v"),
    )


def _kw_counts(spark, n_rows: int, alphabet: int):
    rows = spark.range(n_rows).select(
        F.pmod(F.col("id"), F.lit(5)).cast("string").alias("g"),
        F.pmod(F.xxhash64("id"), F.lit(alphabet)).alias("v"),
    )
    return rows.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))


def _series_by_keys(spark, n_keys: int):
    n = n_keys * SERIES_DAYS
    return spark.range(n).select(
        F.pmod(F.col("id"), F.lit(n_keys)).alias("k"),
        (F.col("id") / F.lit(n_keys)).cast("long").alias("t"),
        (
            1000
            + F.pmod(F.col("id"), F.lit(7)) * 10
            + F.pmod(F.xxhash64("id"), F.lit(100))
        ).alias("v"),
    )


def main() -> None:
    key = sys.argv[1]
    spark = get_spark(
        f"scaling-r11-{key}", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    if key.startswith("pt_series_"):
        scale = int(key.removeprefix("pt_series_").removesuffix("x"))
        n = PT_BASE_DAYS * scale
        df = pettitt_changepoint(_single_series(spark, n), "t", "v")
        row = _measure(spark, df)
        row["n_days"] = n
        row["n_pairs"] = n * (n - 1) // 2
    elif key.startswith("kw_rows_"):
        scale = int(key.removeprefix("kw_rows_").removesuffix("x"))
        n = KW_BASE_ROWS * scale
        df = kruskal_wallis_from_counts(
            _kw_counts(spark, n, KW_ROWS_ALPHA)
        )
        row = _measure(spark, df)
        row["n_rows"] = n
    elif key.startswith("kw_alpha_"):
        alpha = {"1k": 1_000, "10k": 10_000, "100k": 100_000}[
            key.removeprefix("kw_alpha_")
        ]
        df = kruskal_wallis_from_counts(
            _kw_counts(spark, KW_ALPHA_ROWS, alpha)
        )
        row = _measure(spark, df)
        row["alphabet"] = alpha
    elif key.startswith("hwbt_keys_"):
        scale = int(key.removeprefix("hwbt_keys_").removesuffix("x"))
        df = rolling_backtest_hw(
            _series_by_keys(spark, HWBT_BASE_KEYS * scale),
            ["k"],
            ["t"],
            "v",
        )
        row = _measure(spark, df)
        row["n_keys"] = HWBT_BASE_KEYS * scale
    elif key.startswith("fd_blocks_"):
        from lambda_refarch_mapreduce_spark.operators.analytics import (
            friedman_from_blocks,
        )

        scale = int(key.removeprefix("fd_blocks_").removesuffix("x"))
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
        df = friedman_from_blocks(cells, "b", "t", "x")
        row = _measure(spark, df)
        row["n_blocks"] = nb
    elif key == "hw_keys_ref_100x":
        df = holt_winters_from_series(
            _series_by_keys(spark, HWBT_BASE_KEYS * 100),
            ["k"],
            ["t"],
            "v",
        )
        row = _measure(spark, df)
        row["n_keys"] = HWBT_BASE_KEYS * 100
    else:
        raise SystemExit(f"unknown key {key!r}")
    row["key"] = key
    print(json.dumps(row, sort_keys=True))


if __name__ == "__main__":
    main()
