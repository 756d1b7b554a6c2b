"""Round-10 scaling checks for the new statistics shapes: the
sorted-array fold tier (holt_winters_from_series /
rolling_backtest_holt) and the isotonic minimax kernel.

Claims under test:
- FOLD, KEY GROWTH (the realistic 100 TB axis — more series, not
  longer ones): holt_winters_from_series over K keys x 360 days is
  one map-side day collapse + one hash exchange of the collapsed
  (key, day) rows + an embarrassingly parallel per-key fold; wall and
  shuffle grow ~linearly in K and nothing concentrates on one
  reducer.
- FOLD, SERIES GROWTH (the adversarial axis): one key's whole series
  sits in ONE aggregation buffer (collect_list + array_sort), so a
  single group's cost grows superlinearly in series length and is
  memory-bounded — fine for any calendar series (a CENTURY of daily
  points is 36.5k doubles ~ 300 KB), wrong tool for per-event
  sequences; measured to put a number on where that stops being
  academic. rolling_backtest_holt shares the exact shape (one
  spot-check at the top size).
- ISOTONIC, ALPHABET GROWTH: isotonic_fit_binned explodes
  O(n^3/6) spanned-segment rows in the BIN alphabet n. The corpus
  collapse dominates at real alphabets (n <= a few hundred); the
  cubic term is measured at n = 10 / 50 / 200 over a fixed 10M-row
  corpus so the documented "use PAVA proper past n ~ thousands"
  cutoff is a number, not a guess.
- BH/FDR, CORPUS GROWTH: the family is fixed (7 tests), so corpus
  growth only grows the map-side collapse; post-collapse bytes are
  flat.

Outputs are COLLECTED in full (not counted): a count() lets Catalyst
prune every value column and with it the fold itself (the round-9
attribution lesson).

Pre-staged round-11 kernels measured on the same axes:
- DECOMPOSE, KEY GROWTH: one window pass + two alphabet aggregates +
  a broadcast join back — expect the HW-key linearity without the
  rotating-array constant.
- CHANGEPOINT, SERIES GROWTH: prefix_sums + one max-struct — linear.
- AD, ALPHABET GROWTH: the per-value term list folds in ONE agg
  buffer; measured to bound the sorted-fold alphabet cost.

Usage: python tools/scaling_round10.py MEASURE_KEY
One variant per process (fresh JVM, UI on) so AQE exchange reuse and
warm caches can't flatter later variants. Keys:
  hw_keys_1x hw_keys_10x hw_keys_100x
  hw_series_1x hw_series_10x hw_series_100x
  backtest_keys_100x
  iso_bins_10 iso_bins_50 iso_bins_200
  bh_rows_1x bh_rows_100x
  dc_keys_1x dc_keys_10x dc_keys_100x
  cp_series_1x cp_series_10x cp_series_100x
  ad_alpha_1k ad_alpha_10k ad_alpha_100k
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
    anderson_darling_from_value_counts,
    bh_fdr_from_z,
    bh_thresholds,
    cusum_changepoint,
    holt_winters_from_series,
    isotonic_fit_binned,
    rolling_backtest_holt,
    seasonal_decompose_additive,
    TWO_PROP_Z_EXPR,
)

BASE_KEYS = 1_000
SERIES_DAYS = 360
BASE_DAYS = 36_500  # a century of daily points, single key
ISO_ROWS = 10_000_000
BH_ROWS = 1_000_000


def _measure(spark, df) -> dict:
    with MeasuredRun(spark) as m:
        rows = df.collect()
    out = {"wall_s": round(m.stats.wall_secs, 2), "out_rows": len(rows)}
    if m.stats.bytes_measured:
        out["shuffle_mb"] = round(m.stats.shuffle_bytes / 1e6, 2)
        out["n_stages"] = m.stats.extra.get("n_stages")
    return out


def _series_by_keys(spark, n_keys: int):
    """n_keys keys x SERIES_DAYS days, integer values with a weekly
    wobble — per-key length fixed, key alphabet grows."""
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


def _series_single_key(spark, n_days: int):
    return spark.range(n_days).select(
        F.lit(0).alias("k"),
        F.col("id").alias("t"),
        (
            1000
            + F.pmod(F.col("id"), F.lit(7)) * 10
            + F.pmod(F.xxhash64("id"), F.lit(100))
        ).alias("v"),
    )


def _iso_corpus(spark, n_bins: int):
    """ISO_ROWS binomial rows over n_bins ordered bins: the corpus
    collapses map-side to n_bins (w, x) rows before the cubic term."""
    rows = spark.range(ISO_ROWS).select(
        F.pmod(F.xxhash64("id"), F.lit(n_bins)).alias("bin"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100)) < 40)
        .cast("long")
        .alias("is_s"),
    )
    return rows.groupBy("bin").agg(
        F.count(F.lit(1)).alias("w"), F.sum("is_s").alias("x")
    )


def _bh_corpus(spark, n_rows: int):
    rows = spark.range(n_rows).select(
        F.pmod(F.col("id"), F.lit(7)).alias("dow"),
        (F.pmod(F.xxhash64("id"), F.lit(100)) < 30).cast("long").alias(
            "is_p"
        ),
    )
    g = rows.groupBy("dow").agg(
        F.count(F.lit(1)).alias("nd"), F.sum("is_p").alias("xd")
    )
    tot = g.agg(F.sum("nd").alias("nt"), F.sum("xd").alias("xt"))
    z = g.crossJoin(F.broadcast(tot)).selectExpr(
        "dow", "nd", "xd", f"{TWO_PROP_Z_EXPR} AS z"
    )
    return bh_fdr_from_z(z, ["dow"], "z", bh_thresholds(7, 0.05))


def main() -> None:
    key = sys.argv[1]
    spark = get_spark(
        f"scaling-r10-{key}", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    if key.startswith("hw_keys_"):
        scale = int(key.removeprefix("hw_keys_").removesuffix("x"))
        df = holt_winters_from_series(
            _series_by_keys(spark, BASE_KEYS * scale),
            ["k"],
            ["t"],
            "v",
        )
        row = _measure(spark, df)
        row["n_keys"] = BASE_KEYS * scale
    elif key.startswith("hw_series_"):
        scale = int(key.removeprefix("hw_series_").removesuffix("x"))
        df = holt_winters_from_series(
            _series_single_key(spark, BASE_DAYS * scale),
            ["k"],
            ["t"],
            "v",
        )
        row = _measure(spark, df)
        row["n_days"] = BASE_DAYS * scale
    elif key == "backtest_keys_100x":
        df = rolling_backtest_holt(
            _series_by_keys(spark, BASE_KEYS * 100), ["k"], ["t"], "v"
        )
        row = _measure(spark, df)
        row["n_keys"] = BASE_KEYS * 100
    elif key.startswith("iso_bins_"):
        n_bins = int(key.removeprefix("iso_bins_"))
        df = isotonic_fit_binned(
            _iso_corpus(spark, n_bins), "bin", "w", "x"
        )
        row = _measure(spark, df)
        row["n_bins"] = n_bins
        row["span_rows_est"] = n_bins ** 3 // 6
    elif key.startswith("dc_keys_"):
        scale = int(key.removeprefix("dc_keys_").removesuffix("x"))
        df = seasonal_decompose_additive(
            _series_by_keys(spark, BASE_KEYS * scale), ["k"], "t", "v"
        )
        row = _measure(spark, df)
        row["n_keys"] = BASE_KEYS * scale
    elif key.startswith("cp_series_"):
        scale = int(key.removeprefix("cp_series_").removesuffix("x"))
        df = cusum_changepoint(
            _series_single_key(spark, BASE_DAYS * scale), "t", "v"
        )
        row = _measure(spark, df)
        row["n_days"] = BASE_DAYS * scale
    elif key.startswith("ad_alpha_"):
        n_vals = int(key.removeprefix("ad_alpha_").removesuffix("k")) * 1000
        rows = spark.range(10_000_000).select(
            F.pmod(F.xxhash64("id"), F.lit(n_vals)).alias("v"),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(2)) == 0)
            .cast("long")
            .alias("ia"),
        )
        counts = rows.groupBy("v").agg(
            F.sum("ia").alias("ca"),
            F.sum(F.lit(1) - F.col("ia")).alias("cb"),
        )
        df = anderson_darling_from_value_counts(counts)
        row = _measure(spark, df)
        row["n_values"] = n_vals
    elif key.startswith("bh_rows_"):
        scale = int(key.removeprefix("bh_rows_").removesuffix("x"))
        df = _bh_corpus(spark, BH_ROWS * scale)
        row = _measure(spark, df)
        row["n_rows"] = BH_ROWS * scale
    else:
        raise SystemExit(f"unknown key {key!r}")

    row["key"] = key
    print(json.dumps(row))


if __name__ == "__main__":
    main()
