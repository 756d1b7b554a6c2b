"""Round-10 pre-staging validator: the four kernels built this round
WITHOUT catalog entries (the driver window was full at 8 new + 42
re-samples) each get their DuckDB oracle recipe validated against the
kernel output NOW, so registering them next round is mechanical —
the round-9 lesson ("verify the struct_pack-class pitfalls on a toy
BEFORE the round that needs them") applied to whole oracles.

Validated pairs (exact tuple equality at 6dp rounding, sf0.001 and
sf0.01):
- seasonal_decompose_additive  <- _DECOMPOSE_SQL  (per-type daily counts)
- cusum_changepoint            <- _CHANGEPOINT_SQL (daily revenue cents)
- anderson_darling_from_value_counts <- _AD_SQL   (purchase vs click)
- seasonal_mann_kendall        <- _SEASONAL_MK_SQL (daily revenue)

Usage: python tools/validate_prestaged_oracles.py [sf_dir]
Prints one PASS/FAIL line per pair; exit 0 iff all pass.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lambda_refarch_mapreduce_spark import get_spark, load_table  # noqa: E402
from lambda_refarch_mapreduce_spark.operators.analytics import (  # noqa: E402
    AD_CRIT_05,
    CUSUM_CP_K_EXPR,
    MANN_KENDALL_Z_EXPR,
    anderson_darling_from_value_counts,
    cusum_changepoint,
    group_value_counts,
    kolmogorov_critical,
    seasonal_decompose_additive,
    seasonal_mann_kendall,
)

_DECOMPOSE_SQL = """
WITH day AS (SELECT event_type,
                    date_diff('day', DATE '1970-01-01', ts::DATE)::BIGINT AS t,
                    count(*)::BIGINT AS x
             FROM events GROUP BY 1, 2),
w AS (SELECT event_type, t, x,
             sum(x) OVER win AS wsum,
             count(*) OVER win AS wcnt,
             max(t) OVER win - min(t) OVER win AS wspan
      FROM day
      WINDOW win AS (PARTITION BY event_type ORDER BY t
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
tr AS (SELECT event_type, t, x,
              CASE WHEN wcnt = 7 AND wspan = 6 THEN wsum END AS tsum,
              (t % 7 + 7) % 7 AS phase
       FROM w),
sea AS (SELECT event_type, phase,
               sum(7 * x - tsum)::BIGINT AS sj,
               count(*)::BIGINT AS cj
        FROM tr WHERE tsum IS NOT NULL GROUP BY 1, 2),
sea2 AS (SELECT event_type, phase, sj * 1e0 / (cj * 7e0) AS raw FROM sea),
cent AS (SELECT event_type,
                list_reduce(list_prepend(0e0, list(raw ORDER BY phase)),
                            (acc, v) -> acc + v) / 7e0 AS cbar
         FROM sea2 GROUP BY 1),
sfin AS (SELECT sea2.event_type, phase, raw - cbar AS season
         FROM sea2 JOIN cent ON sea2.event_type = cent.event_type)
SELECT tr.event_type, tr.t, tr.x AS n_ev,
       round(tr.tsum / 7e0, 6) AS trend,
       round(sfin.season, 6) AS seasonal,
       round(tr.x - tr.tsum / 7e0 - sfin.season, 6) AS remainder
FROM tr LEFT JOIN sfin ON tr.event_type = sfin.event_type
                      AND tr.phase = sfin.phase
"""


def _changepoint_sql() -> str:
    crit = kolmogorov_critical(0.05)
    return f"""
WITH day AS (SELECT date_diff('day', DATE '1970-01-01',
                              o_orderdate::DATE)::BIGINT AS x,
                    sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS y
             FROM orders GROUP BY 1),
cum AS (SELECT x, y,
               sum(y) OVER (ORDER BY x)::BIGINT AS ycum,
               row_number() OVER (ORDER BY x) AS i
        FROM day),
tot AS (SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS s,
               sum(y::HUGEINT * y)::DOUBLE AS q
        FROM day),
d AS (SELECT x, i, ycum,
             (n::HUGEINT * ycum - i::HUGEINT * s) AS dd
      FROM cum CROSS JOIN tot),
best AS (SELECT abs(dd)::DOUBLE AS absd, i, x AS t, ycum AS s_i
         FROM d ORDER BY abs(dd) DESC, i ASC LIMIT 1),
one AS (SELECT n, s, q, absd, i, t, s_i FROM best CROSS JOIN tot)
SELECT n::BIGINT AS n_obs, i::BIGINT AS cp_index, t::BIGINT AS cp_t,
       round(s_i * 1e0 / i, 6) AS mean_before,
       CASE WHEN n > i THEN round((s - s_i) * 1e0 / (n - i), 6)
           END AS mean_after,
       round({CUSUM_CP_K_EXPR}, 6) AS k_stat,
       CASE WHEN {CUSUM_CP_K_EXPR} IS NOT NULL
            THEN {CUSUM_CP_K_EXPR} > {crit:.17e} END AS significant
FROM one
"""


def _ad_sql() -> str:
    return f"""
WITH s AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                      END AS ia,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0
                      END AS ib
           FROM events WHERE event_type IN ('purchase', 'click')),
g AS (SELECT v, sum(ia)::BIGINT AS ca, sum(ib)::BIGINT AS cb
      FROM s GROUP BY 1),
cum AS (SELECT v, ca, cb,
               sum(ca) OVER (ORDER BY v)::BIGINT AS ma,
               sum(ca + cb) OVER (ORDER BY v)::BIGINT AS bj
        FROM g),
tot AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM g),
j AS (SELECT v, ca + cb AS w, bj, ma, na, nb, na + nb AS nn
      FROM cum CROSS JOIN tot),
terms AS (SELECT v, na, nb,
                 (w * 1e0 / nn) * (1e0 / na + 1e0 / nb)
                 * ((nn::HUGEINT * ma - na::HUGEINT * bj)::DOUBLE
                    * (nn::HUGEINT * ma - na::HUGEINT * bj)::DOUBLE)
                 / (bj * 1e0 * (nn - bj)) AS term
          FROM j WHERE bj < nn),
agg AS (SELECT max(na) AS na, max(nb) AS nb,
               list_reduce(list_prepend(0e0, list(term ORDER BY v)),
                           (acc, x) -> acc + x) AS a2
        FROM terms)
SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, round(a2, 6) AS a2,
       (a2 > {float(AD_CRIT_05):.17e}) AS significant
FROM agg
"""


def _seasonal_mk_sql() -> str:
    return f"""
WITH day AS (SELECT date_diff('day', DATE '1970-01-01',
                              o_orderdate::DATE)::BIGINT AS x,
                    sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS y
             FROM orders GROUP BY 1),
ph AS (SELECT x, y, ((x % 7) + 7) % 7 AS p,
              row_number() OVER (PARTITION BY ((x % 7) + 7) % 7
                                 ORDER BY x) AS r
       FROM day),
pairs AS (SELECT sum(CASE WHEN b.y > a.y THEN 1
                          WHEN b.y < a.y THEN -1
                          ELSE 0 END)::BIGINT AS s_raw
          FROM ph a JOIN ph b ON a.p = b.p AND b.r > a.r),
tie AS (SELECT coalesce(sum(c * (c - 1) * (2 * c + 5)), 0)::BIGINT
                   AS tie_term
        FROM (SELECT count(*)::BIGINT AS c FROM ph GROUP BY p, y)),
np AS (SELECT sum(np_ * (np_ - 1) * (2 * np_ + 5))::BIGINT AS nvar_term,
              sum(np_)::BIGINT AS n, count(*)::BIGINT AS k_phases
       FROM (SELECT count(*)::BIGINT AS np_ FROM ph GROUP BY p)),
z AS (SELECT n AS n_obs, k_phases AS n_phases,
             coalesce(s_raw, 0)::BIGINT AS s_mk,
             (nvar_term * 1e0 - tie_term) / 18e0 AS var_s
      FROM pairs, tie, np)
SELECT n_obs, n_phases, s_mk, round(var_s, 6) AS var_s,
       round({MANN_KENDALL_Z_EXPR}, 6) AS z_mk,
       CASE WHEN abs({MANN_KENDALL_Z_EXPR}) <= 1.96e0 THEN 'no_trend'
            WHEN s_mk > 0 THEN 'increasing' ELSE 'decreasing'
       END AS trend
FROM z
"""


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("validate-prestaged")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )

    epoch_day = (
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("x")
    )
    rev_day = (
        load_table(spark, sf, "orders")
        .select(
            epoch_day,
            F.round(F.col("o_totalprice") * 100).cast("long").alias(
                "cents"
            ),
        )
        .groupBy("x")
        .agg(F.sum("cents").alias("y"))
    )
    ev_day = (
        load_table(spark, sf, "events")
        .groupBy(
            F.col("event_type"),
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("t"),
        )
        .agg(F.count(F.lit(1)).alias("n_ev"))
    )

    checks = [
        (
            "seasonal_decompose",
            seasonal_decompose_additive(
                ev_day, ["event_type"], "t", "n_ev"
            ),
            _DECOMPOSE_SQL,
        ),
        (
            "cusum_changepoint",
            cusum_changepoint(rev_day, "x", "y"),
            _changepoint_sql(),
        ),
        (
            "anderson_darling",
            anderson_darling_from_value_counts(
                group_value_counts(
                    load_table(spark, sf, "events"), "purchase", "click"
                )
            ),
            _ad_sql(),
        ),
        (
            "seasonal_mann_kendall",
            seasonal_mann_kendall(rev_day, "x", "y", 7),
            _seasonal_mk_sql(),
        ),
    ]
    failed = 0
    for name, df, sql in checks:
        got = sorted(tuple(r) for r in df.collect())
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        ok = got == want
        failed += not ok
        print(f"{'PASS' if ok else 'FAIL'} {name}: {len(got)} rows")
        if not ok:
            bad = [(a, b) for a, b in zip(got, want) if a != b][:3]
            print("   first mismatches:", bad)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
