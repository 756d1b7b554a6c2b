"""Round-12 scaling checks: the three registered kernels whose curves
were previously claimed by posture-inheritance only (SCALING.md r11
noted "Mood / G-test / kappa ride already-measured postures") now get
their own adversarial measurements, closing the record for the
classical-statistics tier at its closure (COVERAGE.md r12).

Claims under test:
- MOOD'S MEDIAN, CORPUS GROWTH (fixed ~10k-cents alphabet, 5 groups):
  rows collapse map-side into the (group, value) alphabet before the
  pooled-median prefix sums — 100x rows moves wall by the scan term
  only, post-collapse bytes not at all (the Kruskal-Wallis posture;
  same monitor frame).
- MOOD'S MEDIAN, ALPHABET GROWTH (the adversarial axis): the pooled
  prefix_sums exchange and the broadcast median join are linear in
  the value alphabet; the per-group 2xk table is k rows regardless.
- G-TEST, CORPUS GROWTH (fixed 5x7 cells): one map-side contingency
  collapse; wall = scan term (the chi2_event_dow posture).
- G-TEST, CELL-ALPHABET GROWTH: the dense margin cross is |A| x |B|
  METADATA cells (grid build + left join + fold) — linear in cells,
  never corpus-sized; 100x cells at fixed rows must not move the
  corpus-side stages.
- COHEN'S KAPPA, CORPUS GROWTH (fixed 3x3 labels): one map-side
  (label_a, label_b) collapse + two margin aggregates + one
  label-keyed equi-join — the mcnemar posture, wall = scan term.
- COHEN'S KAPPA, LABEL-ALPHABET GROWTH: cells are |A| x |B|; the
  pe-term join (ra JOIN cb ON label) is an EQUI-join on the label
  alphabet — linear, no cross.

Outputs are COLLECTED in full (not counted) — a count() lets Catalyst
prune the value columns and with them the computation itself (the
round-9 attribution lesson).

Usage: python tools/scaling_round12.py MEASURE_KEY
One variant per process (fresh JVM, UI on). Keys:
  mood_rows_1m mood_rows_10m mood_rows_100m
  mood_alpha_1k mood_alpha_10k mood_alpha_100k
  gtest_rows_1m gtest_rows_10m gtest_rows_100m
  gtest_cells_35 gtest_cells_3500 gtest_cells_350k
  kappa_rows_1m kappa_rows_10m kappa_rows_100m
  kappa_labels_3 kappa_labels_30 kappa_labels_300  (|A| = |B| = N ->
    N^2 cells: 9 / 900 / 90k)
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
    cohens_kappa_from_pairs,
    contingency_counts,
    g_test_from_contingency,
    mood_median_from_counts,
)

MOOD_ROWS_ALPHA = 10_000
MOOD_ALPHA_ROWS = 10_000_000
GTEST_ALPHA_ROWS = 10_000_000
KAPPA_ALPHA_ROWS = 10_000_000


def _measure(spark, df) -> dict:
    with MeasuredRun(spark) as m:
        rows = df.collect()
    out = {"wall_s": round(m.stats.wall_secs, 2), "out_rows": len(rows)}
    if m.stats.bytes_measured:
        out["shuffle_mb"] = round(m.stats.shuffle_bytes / 1e6, 2)
        out["n_stages"] = m.stats.extra.get("n_stages")
    return out


def _mood_counts(spark, n_rows: int, alphabet: int):
    # a mild per-group location shift so the 2xk table is non-trivial
    rows = spark.range(n_rows).select(
        F.pmod(F.col("id"), F.lit(5)).cast("string").alias("g"),
        (
            F.pmod(F.xxhash64("id"), F.lit(alphabet))
            + F.pmod(F.col("id"), F.lit(5)) * (alphabet // 100 + 1)
        ).alias("v"),
    )
    return rows.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))


def _gtest_frame(spark, n_rows: int, ka: int, kb: int):
    return spark.range(n_rows).select(
        F.pmod(F.xxhash64("id"), F.lit(ka)).cast("string").alias("a"),
        # a weak dependence between a and b so G is non-trivial
        F.pmod(
            F.xxhash64("id", "id") + F.pmod(F.col("id"), F.lit(ka)),
            F.lit(kb),
        ).alias("b"),
    )


def _kappa_pairs(spark, n_rows: int, n_labels: int):
    # rater b agrees with rater a ~60% of the time
    a = F.pmod(F.xxhash64("id"), F.lit(n_labels))
    return spark.range(n_rows).select(
        a.cast("string").alias("a"),
        F.when(F.pmod(F.xxhash64("id", "id"), F.lit(10)) < 6, a)
        .otherwise(F.pmod(F.xxhash64("id", "id", "id"), F.lit(n_labels)))
        .cast("string")
        .alias("b"),
    )


def main() -> None:
    key = sys.argv[1]
    spark = get_spark(
        f"scaling-r12-{key}", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    if key.startswith("mood_rows_"):
        n = {"1m": 1_000_000, "10m": 10_000_000, "100m": 100_000_000}[
            key.removeprefix("mood_rows_")
        ]
        df = mood_median_from_counts(_mood_counts(spark, n, MOOD_ROWS_ALPHA))
        row = _measure(spark, df)
        row["n_rows"] = n
    elif key.startswith("mood_alpha_"):
        alpha = {"1k": 1_000, "10k": 10_000, "100k": 100_000}[
            key.removeprefix("mood_alpha_")
        ]
        df = mood_median_from_counts(
            _mood_counts(spark, MOOD_ALPHA_ROWS, alpha)
        )
        row = _measure(spark, df)
        row["alphabet"] = alpha
    elif key.startswith("gtest_rows_"):
        n = {"1m": 1_000_000, "10m": 10_000_000, "100m": 100_000_000}[
            key.removeprefix("gtest_rows_")
        ]
        cells = contingency_counts(_gtest_frame(spark, n, 5, 7), "a", "b")
        df = g_test_from_contingency(cells)
        row = _measure(spark, df)
        row["n_rows"] = n
        row["cells"] = 35
    elif key.startswith("gtest_cells_"):
        ka, kb = {
            "35": (5, 7),
            "3500": (50, 70),
            "350k": (500, 700),
        }[key.removeprefix("gtest_cells_")]
        cells = contingency_counts(
            _gtest_frame(spark, GTEST_ALPHA_ROWS, ka, kb), "a", "b"
        )
        df = g_test_from_contingency(cells)
        row = _measure(spark, df)
        row["cells"] = ka * kb
    elif key.startswith("kappa_rows_"):
        n = {"1m": 1_000_000, "10m": 10_000_000, "100m": 100_000_000}[
            key.removeprefix("kappa_rows_")
        ]
        df = cohens_kappa_from_pairs(_kappa_pairs(spark, n, 3))
        row = _measure(spark, df)
        row["n_rows"] = n
    elif key.startswith("kappa_labels_"):
        nl = int(key.removeprefix("kappa_labels_"))
        df = cohens_kappa_from_pairs(
            _kappa_pairs(spark, KAPPA_ALPHA_ROWS, nl)
        )
        row = _measure(spark, df)
        row["n_labels"] = nl
        row["cells_max"] = nl * nl
    else:
        raise SystemExit(f"unknown key {key!r}")

    row["key"] = key
    print(json.dumps(row, sort_keys=True))


if __name__ == "__main__":
    main()
