"""Round-11 pre-staging validator for the round-12 window (the
round-10 move repeated: kernels built WITHOUT catalog entries get
their DuckDB oracle recipes validated against the kernel output NOW,
so next round's registration is mechanical).

STATUS (round 12): all 17 pairs below are REGISTERED as catalog
entries in plans/catalog_analytics.py (the round-12 section) —
frames and SQL lifted verbatim. This validator stays as the
registration's provenance record and as a standalone re-check. With
these the classical-statistics tier is CLOSED (COVERAGE.md r12); no
further pre-staging of hypothesis tests.

Validated pairs (exact tuple equality, sf0.001 and sf0.01):
- friedman_from_blocks          <- _FRIEDMAN_SQL  (days x event types
  x daily counts — the repeated-measures rank test with the day
  effect cancelled)
- brown_forsythe_from_counts    <- _BF_PRIORITY_SQL (order price
  cents across order priorities — the clause-mode frame, so the r12
  jobspec_brown_forsythe entry's oracle is already proven)
- cochran_armitage_trend        <- _CA_VALUEBIN_SQL (purchase share
  across $50 value-bin scores — a second CA frame for the clause
  entry)
- jonckheere_terpstra_from_counts <- _JT_WEEK_SQL (event value cents
  across epoch-week order — the ordered-alternative k-sample test,
  KW's direction-aware sibling)
- ljung_box_from_series         <- _LB_REVENUE_SQL (daily revenue,
  lags 1..7 — the portmanteau white-noise test riding the acf entry's
  exact lag-join frames)
- cliffs_delta_from_value_counts <- _CLIFFS_SQL (purchase-vs-click
  value effect size with Romano magnitude bands — the "does it
  matter" reading beside the Mann-Whitney entry)
- runs_test_from_series         <- _RUNS_REVENUE_SQL (daily revenue
  around its median — the Wald-Wolfowitz randomness diagnostic)
- mcnemar_from_pairs            <- _MCNEMAR_SQL (paired click-vs-
  purchase flags per user-day — the within-subject marginal test)
- cohens_kappa_from_pairs       <- _KAPPA_SQL (two rule-based document
  length raters — chance-corrected agreement, Landis-Koch bands)
- gehan_wilcoxon_from_counts    <- _GEHAN_SQL (the log-rank entry's
  churn frame reweighted by the at-risk count — the early-difference
  member of the survival pair)
- page_l_from_blocks            <- _PAGE_SQL (the Friedman block frame
  with the treatment order as the hypothesis — ordered repeated
  measures, completing the trend-family square)
- cochran_q_from_blocks         <- _CQ_SQL (did-user-do-type flags on
  a dense user x event-type grid, week one — the k-sample McNemar)
- wilcoxon_signed_rank_from_pairs <- _WSR_SQL (per-user event value,
  second half vs first half of the window — the paired-numeric member
  beside McNemar)
- kuiper_from_value_counts      <- _KUIPER_SQL (purchase-vs-click on
  the cliffs frame — the cyclic-sensitive V = D+ + D-)
- cvm_from_value_counts         <- _CVM_SQL (same frame — the plain
  integral of the squared CDF gap, completing the family)
- g_test_from_contingency       <- _G_TEST_SQL (the chi2 entry's
  event-type x day-of-week cells — the log-likelihood-ratio twin,
  = 2*N*MI, bridging the association and information tiers)
- mood_median_from_counts       <- _MOOD_SQL (value cents by event
  type — the one-bit outlier-proof member of the k-sample family)

Round-12 registration plan (window math): 17 validated recipes
above; after the r11 window the stalest green block is the 48-entry
r6 set, so a 50-slot driver window takes all 17 new entries plus the
33 stalest r6 re-samples (the r6 block completes in r13). Each
registration is mechanical: lift the Spark frame and the SQL string
from this file into an @register entry (alias columns are already
aligned), add the bench key only if the entry is headline-worthy.
The jobspec stats_test clause already serves every kernel below
(modes: cliffs_delta, jonckheere, friedman, page, cochran_q,
mcnemar, wilcoxon_signed_rank, cohens_kappa, runs, ljung_box,
kuiper, cvm, g_test) — clause-mode entries can reuse these recipes
with the mode's frame, the r11 jobspec_kruskal pattern.

Usage: python tools/validate_prestaged_r12.py [sf_dir]
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
    ANOVA_F_EXPR,
    ANOVA_GROUP_TERM,
    CA_Z_EXPR,
    ACF_EXPR,
    CLIFFS_D_EXPR,
    COCHRAN_Q_EXPR,
    FRIEDMAN_T_EXPR,
    GEHAN_V_TERM,
    GEHAN_Z_EXPR,
    JT_Z_EXPR,
    KAPPA_EXPR,
    MI_CELL_TERM,
    MCNEMAR_CHI2_EXPR,
    MW_Z_EXPR,
    PAGE_Z_EXPR,
    RUNS_Z_EXPR,
    WH_CHI2_Z,
    WSR_Z_EXPR,
    brown_forsythe_from_counts,
    cochran_armitage_trend,
    friedman_from_blocks,
    cliffs_delta_from_value_counts,
    cochran_q_from_blocks,
    cvm_from_value_counts,
    cohens_kappa_from_pairs,
    g_test_from_contingency,
    gehan_wilcoxon_from_counts,
    jonckheere_terpstra_from_counts,
    kuiper_critical,
    kuiper_from_value_counts,
    mcnemar_from_pairs,
    mood_median_from_counts,
    ljung_box_from_series,
    page_l_from_blocks,
    runs_test_from_series,
    wilcoxon_signed_rank_from_pairs,
)

_FRIEDMAN_SQL = f"""
WITH cell AS (SELECT event_type AS t,
                     date_diff('day', DATE '1970-01-01',
                               ts::DATE)::BIGINT AS b,
                     count(*)::BIGINT AS x
              FROM events GROUP BY 1, 2),
kk AS (SELECT count(DISTINCT t)::BIGINT AS k FROM cell),
bsz AS (SELECT b, count(*)::BIGINT AS n,
               count(DISTINCT t)::BIGINT AS dt
        FROM cell GROUP BY 1),
complete AS (SELECT cell.* FROM cell
             JOIN bsz USING (b) CROSS JOIN kk
             WHERE n = k AND dt = k),
bv AS (SELECT b, x, count(*)::BIGINT AS c FROM complete GROUP BY 1, 2),
wc AS (SELECT b, x,
              (2 * sum(c) OVER (PARTITION BY b ORDER BY x)
               - c + 1)::BIGINT AS r2
       FROM bv),
rk AS (SELECT complete.b, complete.t, wc.r2
       FROM complete JOIN wc ON complete.b = wc.b
                            AND complete.x = wc.x),
pt AS (SELECT t, sum(r2)::BIGINT AS rs2 FROM rk GROUP BY 1),
a2 AS (SELECT coalesce(sum(r2::HUGEINT * r2), 0)::DOUBLE AS a2_sum
       FROM rk),
bc AS (SELECT count(DISTINCT b)::BIGINT AS b FROM complete),
cent AS (SELECT coalesce(sum((rs2 - b * (k + 1))::HUGEINT
                             * (rs2 - b * (k + 1))), 0)::DOUBLE AS sr2
         FROM pt CROSS JOIN bc CROSS JOIN kk),
one AS (SELECT k, b, sr2, a2_sum AS a2
        FROM cent CROSS JOIN a2 CROSS JOIN bc CROSS JOIN kk),
flat AS (SELECT k AS k_treatments, b AS n_blocks,
                round({FRIEDMAN_T_EXPR}, 6) AS t1_stat,
                (k - 1) * 1e0 AS dof,
                {FRIEDMAN_T_EXPR} AS chi2
         FROM one)
SELECT k_treatments, n_blocks, t1_stat,
       CASE WHEN chi2 IS NOT NULL AND k_treatments >= 2
            THEN round({WH_CHI2_Z}, 6) END AS z_wh,
       CASE WHEN chi2 IS NOT NULL AND k_treatments >= 2
            THEN ({WH_CHI2_Z} > 1.645e0) END AS significant
FROM flat
"""

_BF_PRIORITY_SQL = f"""
WITH s AS (SELECT o_orderpriority AS g,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS v
           FROM orders),
cnt AS (SELECT g, v, count(*)::BIGINT AS c FROM s GROUP BY 1, 2),
cum AS (SELECT g, v, c,
               sum(c) OVER (PARTITION BY g ORDER BY v)::BIGINT AS cm
        FROM cnt),
ng AS (SELECT g, sum(c)::BIGINT AS nn FROM cnt GROUP BY 1),
med AS (SELECT cum.g, min(v)::BIGINT AS md
        FROM cum JOIN ng ON cum.g = ng.g
        WHERE cm >= (nn + 1) // 2 GROUP BY 1),
dev AS (SELECT cnt.g, abs(v - md)::BIGINT AS z, c
        FROM cnt JOIN med ON cnt.g = med.g),
grp AS (SELECT g, sum(c)::BIGINT AS n, sum(c * z)::BIGINT AS s,
               sum(c::HUGEINT * z * z) AS q
        FROM dev GROUP BY 1),
f AS (SELECT count(*) AS k, sum(n) AS nt,
             sum(s)::DOUBLE AS st, sum(q)::DOUBLE AS qt,
             list_reduce(list_prepend(0e0,
                 list({ANOVA_GROUP_TERM} ORDER BY g)),
                 (acc, x) -> acc + x) AS sbp
      FROM grp),
r AS (SELECT k::BIGINT AS k_groups, nt::BIGINT AS n_total,
             {ANOVA_F_EXPR} AS f_stat
      FROM f),
z AS (SELECT k_groups, n_total, round(f_stat, 6) AS f_stat,
             (k_groups - 1) * 1e0 AS dof,
             (k_groups - 1) * f_stat AS chi2
      FROM r)
SELECT k_groups, n_total, f_stat,
       CASE WHEN chi2 IS NOT NULL AND k_groups >= 2
            THEN round({WH_CHI2_Z}, 6) END AS z_wh,
       CASE WHEN chi2 IS NOT NULL AND k_groups >= 2
            THEN ({WH_CHI2_Z} > 1.645e0) END AS significant
FROM z
"""

_CA_VALUEBIN_SQL = f"""
WITH s AS (SELECT floor(value / 50)::BIGINT AS sc,
                  CASE WHEN event_type = 'purchase' THEN 1
                       ELSE 0 END AS is_p
           FROM events),
grp AS (SELECT sc AS s, sum(is_p)::BIGINT AS x,
               count(*)::BIGINT AS n
        FROM s GROUP BY 1),
agg AS (SELECT count(*)::BIGINT AS k,
               coalesce(sum(n), 0)::BIGINT AS nt,
               coalesce(sum(x), 0)::BIGINT AS xt,
               coalesce(sum(s::HUGEINT * n), 0)::DOUBLE AS sn,
               coalesce(sum(s::HUGEINT * x), 0)::DOUBLE AS sx,
               coalesce(sum(s::HUGEINT * s * n), 0)::DOUBLE AS ssn
        FROM grp)
SELECT k AS n_groups, nt AS n_total, xt AS n_success,
       round({CA_Z_EXPR}, 6) AS z_ca,
       CASE
         WHEN {CA_Z_EXPR} IS NULL THEN NULL
         WHEN abs({CA_Z_EXPR}) <= 1.96e0 THEN 'no_trend'
         WHEN {CA_Z_EXPR} > 0 THEN 'increasing'
         ELSE 'decreasing'
       END AS trend
FROM agg
"""


_JT_WEEK_SQL = f"""
WITH s AS (SELECT (date_diff('day', DATE '1970-01-01',
                             ts::DATE) // 7)::BIGINT AS g,
                  CAST(round(value * 100) AS BIGINT) AS v
           FROM events),
cnt AS (SELECT g, v, count(*)::BIGINT AS c FROM s GROUP BY 1, 2),
grps AS (SELECT g, sum(c)::BIGINT AS ng FROM cnt GROUP BY 1),
vals AS (SELECT v, sum(c)::BIGINT AS tv FROM cnt GROUP BY 1),
grid AS (SELECT b.v, b.g, coalesce(c, 0)::BIGINT AS c
         FROM (SELECT vals.v, grps.g
               FROM vals CROSS JOIN grps) b
         LEFT JOIN cnt ON b.v = cnt.v AND b.g = cnt.g),
t1 AS (SELECT v, g, c,
              (2 * sum(c) OVER (PARTITION BY g ORDER BY v)
               - c)::BIGINT AS t
       FROM grid),
t2 AS (SELECT v, g, c,
              coalesce(sum(t) OVER (PARTITION BY v ORDER BY g
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0)::BIGINT AS pre
       FROM t1),
j2t AS (SELECT coalesce(sum(c::HUGEINT * pre), 0)::DOUBLE AS j2
        FROM t2),
gm AS (SELECT count(*)::BIGINT AS k,
              coalesce(sum(ng), 0)::BIGINT AS nt,
              coalesce(sum(ng::HUGEINT * ng), 0)::DOUBLE AS sn2,
              coalesce(sum(ng::HUGEINT * (ng - 1) * (2 * ng + 5)),
                       0)::DOUBLE AS gt1,
              coalesce(sum(ng::HUGEINT * (ng - 1) * (ng - 2)),
                       0)::DOUBLE AS gt2,
              coalesce(sum(ng::HUGEINT * (ng - 1)), 0)::DOUBLE AS gt3
       FROM grps),
vm AS (SELECT coalesce(sum(tv::HUGEINT * (tv - 1) * (2 * tv + 5)),
                       0)::DOUBLE AS vt1,
              coalesce(sum(tv::HUGEINT * (tv - 1) * (tv - 2)),
                       0)::DOUBLE AS vt2,
              coalesce(sum(tv::HUGEINT * (tv - 1)), 0)::DOUBLE AS vt3
       FROM vals),
one AS (SELECT * FROM gm CROSS JOIN vm CROSS JOIN j2t)
SELECT CAST(k AS BIGINT) AS k_groups, CAST(nt AS BIGINT) AS n_total,
       CASE WHEN nt * 1e0 * nt - sn2 > 0e0
            THEN round(j2 / (nt * 1e0 * nt - sn2), 6) END AS jt_auc,
       round({JT_Z_EXPR}, 6) AS z_jt,
       CASE
         WHEN {JT_Z_EXPR} IS NULL THEN NULL
         WHEN abs({JT_Z_EXPR}) <= 1.96e0 THEN 'no_trend'
         WHEN {JT_Z_EXPR} > 0 THEN 'increasing'
         ELSE 'decreasing'
       END AS trend
FROM one
"""


_LB_MAX_LAG = 7

_LB_REVENUE_SQL = f"""
WITH daily AS (SELECT o_orderdate AS d,
                      sum(round(o_totalprice * 100)::BIGINT)
                          ::BIGINT AS y
               FROM orders GROUP BY 1),
idx AS (SELECT y, row_number() OVER (ORDER BY d) AS t FROM daily),
tot AS (SELECT count(*) AS n, sum(y)::BIGINT AS s,
               sum(y::HUGEINT * y)::DOUBLE AS q
        FROM idx),
lags AS (SELECT unnest(range(1, {_LB_MAX_LAG} + 1)) AS lag),
j AS (SELECT lags.lag, a.y AS ya, b.y AS yb
      FROM idx a CROSS JOIN lags
      JOIN idx b ON b.t = a.t - lags.lag),
p AS (SELECT lag, count(*) AS cnt,
             sum(ya::HUGEINT * yb)::DOUBLE AS pk,
             sum(ya)::BIGINT AS sa, sum(yb)::BIGINT AS sb
      FROM j GROUP BY 1),
terms AS (SELECT lag,
                 CASE WHEN q * 1e0 - s * 1e0 * s / n > 0e0
                      THEN ({ACF_EXPR}) * ({ACF_EXPR})
                           / (n * 1e0 - lag)
                 END AS term
          FROM p CROSS JOIN tot),
folded AS (SELECT count(*)::BIGINT AS h,
                  list_reduce(list_prepend(0e0,
                      list(term ORDER BY lag)),
                      (acc, x) -> acc + x) AS ssum
           FROM terms),
flat AS (SELECT CAST(n AS BIGINT) AS n_obs,
                CAST(h AS BIGINT) AS n_lags,
                CASE WHEN h >= 1
                     THEN n * (n + 2e0) * ssum END AS chi2,
                h * 1e0 AS dof
         FROM folded CROSS JOIN tot)
SELECT n_obs, n_lags,
       round(chi2, 6) AS q_stat,
       CASE WHEN chi2 IS NOT NULL AND n_lags >= 1
            THEN round({WH_CHI2_Z}, 6) END AS z_wh,
       CASE WHEN chi2 IS NOT NULL AND n_lags >= 1
            THEN ({WH_CHI2_Z} > 1.645e0) END AS significant
FROM flat
"""


_CLIFFS_SQL = f"""
WITH s AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                      END AS ip,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0
                      END AS ic
           FROM events
           WHERE event_type IN ('purchase', 'click')),
g AS (SELECT v, sum(ip) AS cp, sum(ic) AS cc FROM s GROUP BY 1),
c AS (SELECT v, cp, cc, sum(cc) OVER (ORDER BY v) AS cc_cum FROM g),
a AS (SELECT sum(cp) AS n1, sum(cc) AS n2,
             sum(cp::HUGEINT * (2 * (cc_cum - cc) + cc)) AS u2,
             sum((cp + cc)::HUGEINT * (cp + cc) * (cp + cc)
                 - (cp + cc)) AS ties
      FROM c)
SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
       round({CLIFFS_D_EXPR}, 6) AS delta,
       CASE
         WHEN {CLIFFS_D_EXPR} IS NULL THEN NULL
         WHEN abs({CLIFFS_D_EXPR}) < 0.147e0 THEN 'negligible'
         WHEN abs({CLIFFS_D_EXPR}) < 0.33e0 THEN 'small'
         WHEN abs({CLIFFS_D_EXPR}) < 0.474e0 THEN 'medium'
         ELSE 'large'
       END AS magnitude,
       round({MW_Z_EXPR}, 6) AS z,
       (abs({MW_Z_EXPR}) > 1.96e0) AS significant
FROM a
"""


_RUNS_REVENUE_SQL = f"""
WITH daily AS (SELECT o_orderdate AS d,
                      sum(round(o_totalprice * 100)::BIGINT)
                          ::BIGINT AS y
               FROM orders GROUP BY 1),
w AS (SELECT y, count(*)::BIGINT AS c FROM daily GROUP BY 1),
cum AS (SELECT y, c, sum(c) OVER (ORDER BY y)::BIGINT AS cm FROM w),
nt AS (SELECT count(*)::BIGINT AS n FROM daily),
med AS (SELECT min(y)::BIGINT AS med
        FROM cum CROSS JOIN nt WHERE 2 * cm >= n + 1),
marked AS (SELECT d, CASE WHEN y > med THEN 1 ELSE 0 END AS s
           FROM daily CROSS JOIN med WHERE y != med),
idx AS (SELECT s, row_number() OVER (ORDER BY d) AS t FROM marked),
bounds AS (SELECT coalesce(sum(CASE WHEN a.s != b.s
                                    THEN 1 ELSE 0 END),
                           0)::BIGINT AS sw
           FROM idx a JOIN idx b ON a.t = b.t + 1),
per AS (SELECT coalesce(sum(s), 0)::BIGINT AS n1,
               coalesce(sum(1 - s), 0)::BIGINT AS n0,
               count(*)::BIGINT AS nn
        FROM idx),
one AS (SELECT n1 AS n_above, n0 AS n_below,
               (CASE WHEN nn > 0 THEN sw + 1 ELSE 0 END)::BIGINT
                   AS n_runs
        FROM per CROSS JOIN bounds)
SELECT n_above, n_below, n_runs,
       round({RUNS_Z_EXPR}, 6) AS z_runs,
       CASE
         WHEN {RUNS_Z_EXPR} IS NULL THEN NULL
         WHEN {RUNS_Z_EXPR} < -1.96e0 THEN 'clustered'
         WHEN {RUNS_Z_EXPR} > 1.96e0 THEN 'alternating'
         ELSE 'random'
       END AS verdict
FROM one
"""


_MCNEMAR_SQL = f"""
WITH subj AS (SELECT user_id, ts::DATE AS d,
                     max(CASE WHEN event_type = 'click'
                              THEN 1 ELSE 0 END) AS a,
                     max(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS b
              FROM events GROUP BY 1, 2),
cells AS (SELECT count(*)::BIGINT AS n_pairs,
                 coalesce(sum(CASE WHEN a = 1 AND b = 1
                                   THEN 1 END), 0)::BIGINT AS n_both,
                 coalesce(sum(CASE WHEN a = 1 AND b = 0
                                   THEN 1 END), 0)::BIGINT AS n_only_a,
                 coalesce(sum(CASE WHEN a = 0 AND b = 1
                                   THEN 1 END), 0)::BIGINT AS n_only_b,
                 coalesce(sum(CASE WHEN a = 0 AND b = 0
                                   THEN 1 END), 0)::BIGINT AS n_neither
          FROM subj)
SELECT n_pairs, n_both, n_only_a, n_only_b, n_neither,
       round({MCNEMAR_CHI2_EXPR}, 6) AS chi2_cc,
       CASE WHEN {MCNEMAR_CHI2_EXPR} IS NOT NULL
            THEN ({MCNEMAR_CHI2_EXPR} > 3.841e0) END AS significant,
       CASE
         WHEN {MCNEMAR_CHI2_EXPR} IS NULL THEN NULL
         WHEN NOT ({MCNEMAR_CHI2_EXPR} > 3.841e0) THEN 'none'
         WHEN n_only_a > n_only_b THEN 'a_over_b'
         ELSE 'b_over_a'
       END AS direction
FROM cells
"""

_KAPPA_SQL = f"""
WITH lab AS (SELECT CASE WHEN n_chars < 200 THEN 'short'
                         WHEN n_chars < 400 THEN 'mid'
                         ELSE 'long' END AS a,
                    CASE WHEN len(string_split(text, ' ')) < 36
                         THEN 'short'
                         WHEN len(string_split(text, ' ')) < 72
                         THEN 'mid'
                         ELSE 'long' END AS b
             FROM documents),
cells AS (SELECT a, b, count(*)::BIGINT AS n FROM lab GROUP BY 1, 2),
ra AS (SELECT a, sum(n)::BIGINT AS ra FROM cells GROUP BY 1),
cb AS (SELECT b, sum(n)::BIGINT AS cb FROM cells GROUP BY 1),
tot AS (SELECT coalesce(sum(n), 0)::BIGINT AS n_items,
               coalesce(sum(CASE WHEN a = b THEN n END), 0)::BIGINT
                   AS po_num
        FROM cells),
pe AS (SELECT coalesce(sum(ra.ra::HUGEINT * cb.cb), 0)::DOUBLE
                  AS pe_num
       FROM ra JOIN cb ON ra.a = cb.b),
one AS (SELECT * FROM tot CROSS JOIN pe)
SELECT CAST(n_items AS BIGINT) AS n_items,
       CASE WHEN n_items > 0
            THEN round(po_num * 1e0 / n_items, 6) END AS po,
       CASE WHEN n_items > 0
            THEN round(pe_num / (n_items * 1e0 * n_items), 6)
       END AS pe,
       round({KAPPA_EXPR}, 6) AS kappa,
       CASE
         WHEN {KAPPA_EXPR} IS NULL THEN NULL
         WHEN {KAPPA_EXPR} < 0e0 THEN 'poor'
         WHEN {KAPPA_EXPR} < 0.2e0 THEN 'slight'
         WHEN {KAPPA_EXPR} < 0.4e0 THEN 'fair'
         WHEN {KAPPA_EXPR} < 0.6e0 THEN 'moderate'
         WHEN {KAPPA_EXPR} < 0.8e0 THEN 'substantial'
         ELSE 'almost_perfect'
       END AS agreement
FROM one
"""


_GEHAN_GAP_DAYS = 365
_GEHAN_SEG_A = "BUILDING"
_GEHAN_SEG_B = "MACHINERY"

_GEHAN_SQL = f"""
WITH pu AS (SELECT o_custkey,
                   min(o_orderdate::DATE) AS f,
                   max(o_orderdate::DATE) AS l
            FROM orders GROUP BY 1),
hz AS (SELECT max(o_orderdate::DATE) AS h FROM orders),
subj AS (SELECT (date_diff('day', f, l) + 1)::BIGINT AS t,
                CASE WHEN date_diff('day', l, h)
                          >= {_GEHAN_GAP_DAYS}
                     THEN 1 ELSE 0 END AS ev,
                CASE WHEN c_mktsegment = '{_GEHAN_SEG_A}'
                     THEN 'a' ELSE 'b' END AS g
         FROM pu
         JOIN customer ON c_custkey = o_custkey
         CROSS JOIN hz
         WHERE c_mktsegment IN ('{_GEHAN_SEG_A}',
                                '{_GEHAN_SEG_B}')),
per AS (SELECT t,
               sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END)::BIGINT
                   AS dca,
               sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END)::BIGINT
                   AS dcb,
               sum(CASE WHEN g = 'a' THEN ev ELSE 0 END)::BIGINT
                   AS da,
               sum(CASE WHEN g = 'b' THEN ev ELSE 0 END)::BIGINT
                   AS db
        FROM subj GROUP BY 1),
tot AS (SELECT sum(dca)::BIGINT AS na, sum(dcb)::BIGINT AS nb
        FROM per),
cum AS (SELECT t, da, db, dca, dcb,
               sum(dca) OVER (ORDER BY t)::BIGINT AS ca,
               sum(dcb) OVER (ORDER BY t)::BIGINT AS cb
        FROM per),
risk AS (SELECT t, da, db,
                (na - (ca - dca))::BIGINT AS nat,
                (nb - (cb - dcb))::BIGINT AS nbt,
                na, nb
         FROM cum CROSS JOIN tot),
evt AS (SELECT t, da, (da + db)::BIGINT AS dt, nat, nbt,
               (nat + nbt)::BIGINT AS nt, na, nb
        FROM risk WHERE da + db > 0),
fin AS (SELECT max(na)::BIGINT AS n_a, max(nb)::BIGINT AS n_b,
               coalesce(sum(nt::HUGEINT * da - dt::HUGEINT * nat),
                        0)::DOUBLE AS u1,
               list_reduce(
                   list_prepend(0e0,
                       list({GEHAN_V_TERM} ORDER BY t)),
                   (acc, x) -> acc + x) AS v1
        FROM evt)
SELECT n_a, n_b, round(u1, 6) AS u_gehan,
       round({GEHAN_Z_EXPR}, 6) AS z_gehan,
       CASE WHEN {GEHAN_Z_EXPR} IS NOT NULL
            THEN (abs({GEHAN_Z_EXPR}) > 1.96e0) END AS significant
FROM fin
"""


_PAGE_SQL = f"""
WITH cell AS (SELECT event_type AS t,
                     date_diff('day', DATE '1970-01-01',
                               ts::DATE)::BIGINT AS b,
                     count(*)::BIGINT AS x
              FROM events GROUP BY 1, 2),
kk AS (SELECT count(DISTINCT t)::BIGINT AS k FROM cell),
bsz AS (SELECT b, count(*)::BIGINT AS n,
               count(DISTINCT t)::BIGINT AS dt
        FROM cell GROUP BY 1),
complete AS (SELECT cell.* FROM cell
             JOIN bsz USING (b) CROSS JOIN kk
             WHERE n = k AND dt = k),
bv AS (SELECT b, x, count(*)::BIGINT AS c FROM complete GROUP BY 1, 2),
wc AS (SELECT b, x,
              (2 * sum(c) OVER (PARTITION BY b ORDER BY x)
               - c + 1)::BIGINT AS r2
       FROM bv),
rk AS (SELECT complete.b, complete.t, wc.r2
       FROM complete JOIN wc ON complete.b = wc.b
                            AND complete.x = wc.x),
pos AS (SELECT t, row_number() OVER (ORDER BY t)::BIGINT AS pos
        FROM (SELECT DISTINCT t FROM rk) dt),
cells AS (SELECT rk.b, rk.r2, pos.pos
          FROM rk JOIN pos ON rk.t = pos.t),
l2t AS (SELECT coalesce(sum(pos::HUGEINT * r2), 0)::DOUBLE AS l2
        FROM cells),
sr2t AS (SELECT coalesce(sum((r2 - (k + 1))::HUGEINT
                             * (r2 - (k + 1))), 0)::DOUBLE AS sr2
         FROM cells CROSS JOIN kk),
sc4t AS (SELECT coalesce(sum((2 * pos - (k + 1))::HUGEINT
                             * (2 * pos - (k + 1))), 0)::DOUBLE AS sc4
         FROM pos CROSS JOIN kk),
bc AS (SELECT count(DISTINCT b)::BIGINT AS b FROM complete),
one AS (SELECT k::BIGINT AS k, b::BIGINT AS b, l2, sr2, sc4
        FROM l2t CROSS JOIN sr2t CROSS JOIN sc4t
        CROSS JOIN bc CROSS JOIN kk)
SELECT k AS k_treatments, b AS n_blocks,
       CASE WHEN b >= 1 THEN round(l2 / 2e0, 6) END AS l_stat,
       round({PAGE_Z_EXPR}, 6) AS z_page,
       CASE
         WHEN {PAGE_Z_EXPR} IS NULL THEN NULL
         WHEN abs({PAGE_Z_EXPR}) <= 1.96e0 THEN 'no_trend'
         WHEN {PAGE_Z_EXPR} > 0 THEN 'increasing'
         ELSE 'decreasing'
       END AS trend
FROM one
"""


_CQ_SQL = f"""
WITH cell AS (SELECT user_id AS b, event_type AS t,
                     CASE WHEN count(*) > 0 THEN 1 ELSE 0 END AS x
              FROM events
              WHERE ts::DATE < DATE '2024-01-08'
              GROUP BY 1, 2),
uhz AS (SELECT DISTINCT user_id AS b FROM events
        WHERE ts::DATE < DATE '2024-01-08'),
thz AS (SELECT DISTINCT event_type AS t FROM events
        WHERE ts::DATE < DATE '2024-01-08'),
grid AS (SELECT uhz.b, thz.t, coalesce(cell.x, 0)::BIGINT AS x
         FROM uhz CROSS JOIN thz
         LEFT JOIN cell ON cell.b = uhz.b AND cell.t = thz.t),
kk AS (SELECT count(DISTINCT t)::BIGINT AS k FROM grid),
tj AS (SELECT t, sum(x)::BIGINT AS tj FROM grid GROUP BY 1),
st2t AS (SELECT coalesce(sum(tj::HUGEINT * tj), 0)::DOUBLE AS st2
         FROM tj),
ui AS (SELECT b, sum(x)::BIGINT AS ui FROM grid GROUP BY 1),
blocks AS (SELECT count(*)::BIGINT AS b,
                  coalesce(sum(ui), 0)::BIGINT AS nsucc,
                  coalesce(sum(ui::HUGEINT * ui), 0)::DOUBLE AS su2
           FROM ui),
one AS (SELECT k::BIGINT AS k, b::BIGINT AS b,
               nsucc::BIGINT AS nsucc, st2, su2
        FROM blocks CROSS JOIN st2t CROSS JOIN kk),
flat AS (SELECT k AS k_treatments, b AS n_blocks,
                nsucc AS n_success,
                round({COCHRAN_Q_EXPR}, 6) AS q_stat,
                (k - 1) * 1e0 AS dof,
                {COCHRAN_Q_EXPR} AS chi2
         FROM one)
SELECT k_treatments, n_blocks, n_success, q_stat,
       CASE WHEN chi2 IS NOT NULL AND k_treatments >= 2
            THEN round({WH_CHI2_Z}, 6) END AS z_wh,
       CASE WHEN chi2 IS NOT NULL AND k_treatments >= 2
            THEN ({WH_CHI2_Z} > 1.645e0) END AS significant
FROM flat
"""


_WSR_SQL = f"""
WITH per AS (SELECT user_id,
                    sum(CASE WHEN ts::DATE < DATE '2024-01-16'
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS v1,
                    sum(CASE WHEN ts::DATE >= DATE '2024-01-16'
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS v2
             FROM events GROUP BY 1),
d AS (SELECT (v2 - v1)::BIGINT AS d FROM per),
np AS (SELECT count(*)::BIGINT AS n_pairs FROM d),
byv AS (SELECT abs(d)::BIGINT AS ad,
               sum(CASE WHEN d > 0 THEN 1 ELSE 0 END)::BIGINT AS cpos,
               count(*)::BIGINT AS ct
        FROM d WHERE d != 0 GROUP BY 1),
cum AS (SELECT cpos, ct,
               (2 * sum(ct) OVER (ORDER BY ad) - ct + 1)::BIGINT AS r2
        FROM byv),
agg AS (SELECT coalesce(sum(ct), 0)::BIGINT AS nn,
               coalesce(sum(cpos::HUGEINT * r2), 0)::DOUBLE AS w2p,
               coalesce(sum(ct::HUGEINT * ct * ct - ct), 0)::DOUBLE
                   AS ties
        FROM cum),
one AS (SELECT * FROM agg CROSS JOIN np)
SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(nn AS BIGINT) AS n_nonzero,
       CASE WHEN nn >= 1 THEN round(w2p / 2e0, 6) END AS w_plus,
       round({WSR_Z_EXPR}, 6) AS z_wsr,
       CASE WHEN {WSR_Z_EXPR} IS NOT NULL
            THEN (abs({WSR_Z_EXPR}) > 1.96e0) END AS significant,
       CASE
         WHEN {WSR_Z_EXPR} IS NULL THEN NULL
         WHEN NOT (abs({WSR_Z_EXPR}) > 1.96e0) THEN 'none'
         WHEN {WSR_Z_EXPR} > 0 THEN 'a_over_b'
         ELSE 'b_over_a'
       END AS direction
FROM one
"""


_KUIPER_CRIT = kuiper_critical(0.05)

_KUIPER_SQL = f"""
WITH s AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                      END AS ip,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0
                      END AS ic
           FROM events
           WHERE event_type IN ('purchase', 'click')),
g AS (SELECT v, sum(ip) AS ca, sum(ic) AS cc FROM s GROUP BY 1),
t AS (SELECT sum(ca)::BIGINT AS na, sum(cc)::BIGINT AS nb FROM g),
c AS (SELECT v, sum(ca) OVER (ORDER BY v)::BIGINT AS cca,
             sum(cc) OVER (ORDER BY v)::BIGINT AS ccb
      FROM g),
m AS (SELECT max(nb::HUGEINT * cca - na::HUGEINT * ccb)::DOUBLE
                 AS dpos,
             max(-(nb::HUGEINT * cca - na::HUGEINT * ccb))::DOUBLE
                 AS dneg,
             max(na) AS na, max(nb) AS nb
      FROM c CROSS JOIN t)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CASE WHEN na > 0 AND nb > 0
            THEN round((dpos + dneg)
                       / (CAST(na AS DOUBLE) * nb), 6)
       END AS kuiper_v,
       CASE WHEN na > 0 AND nb > 0
            THEN ((dpos + dneg) / (CAST(na AS DOUBLE) * nb)
                  * sqrt(CAST(na AS DOUBLE) * nb / (na + nb))
                  > {_KUIPER_CRIT:.17e})
       END AS significant
FROM m
"""

_CVM_SQL = f"""
WITH s AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                      END AS ip,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0
                      END AS ic
           FROM events
           WHERE event_type IN ('purchase', 'click')),
g AS (SELECT v, sum(ip) AS ca, sum(ic) AS cc FROM s GROUP BY 1),
t AS (SELECT sum(ca)::BIGINT AS na, sum(cc)::BIGINT AS nb FROM g),
c AS (SELECT v, ca, cc,
             sum(ca) OVER (ORDER BY v)::BIGINT AS cca,
             sum(cc) OVER (ORDER BY v)::BIGINT AS ccb
      FROM g),
j AS (SELECT v, (ca + cc)::BIGINT AS w,
             (nb::HUGEINT * cca - na::HUGEINT * ccb)::DOUBLE AS dj,
             na, nb, (na + nb)::BIGINT AS nn
      FROM c CROSS JOIN t),
terms AS (SELECT v, na, nb,
                 CASE WHEN na > 0 AND nb > 0
                      THEN w * (dj * dj)
                           / (CAST(na AS DOUBLE) * nb * nn * nn)
                 END AS term
          FROM j),
agg AS (SELECT max(na) AS na, max(nb) AS nb,
               list_reduce(list_prepend(0e0,
                   list(term ORDER BY v)),
                   (acc, x) -> acc + x) AS t_stat
        FROM terms)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       round(t_stat, 6) AS cvm_t,
       CASE WHEN t_stat IS NOT NULL
            THEN (t_stat > 4.61360000000000015e-1) END AS significant
FROM agg
"""


_G_TEST_SQL = f"""
WITH s AS (SELECT event_type AS a,
                  ((ts::DATE - DATE '1970-01-01') + 4) % 7 AS b
           FROM events),
cells0 AS (SELECT a, b, count(*) AS n FROM s GROUP BY 1, 2),
ram AS (SELECT a, sum(n)::BIGINT AS ra FROM cells0 GROUP BY 1),
cbm AS (SELECT b, sum(n)::BIGINT AS cb FROM cells0 GROUP BY 1),
tt AS (SELECT sum(n)::BIGINT AS total FROM cells0),
cells AS (SELECT ram.a, cbm.b, ra, cb,
                 coalesce(n, 0)::BIGINT AS n, total
          FROM ram CROSS JOIN cbm
          LEFT JOIN cells0 ON cells0.a = ram.a AND cells0.b = cbm.b
          CROSS JOIN tt),
nz AS (SELECT *, {MI_CELL_TERM} AS term FROM cells WHERE n > 0),
agg AS (SELECT count(DISTINCT a)::BIGINT AS ka,
               count(DISTINCT b)::BIGINT AS kb,
               max(total)::BIGINT AS total,
               list_reduce(list_prepend(0e0,
                   list(term ORDER BY a, b)),
                   (acc, x) -> acc + x) AS s
        FROM nz),
flat AS (SELECT ka, kb, total AS n_total,
                (ka - 1e0) * (kb - 1e0) AS dof,
                CASE WHEN ka >= 2 AND kb >= 2
                          AND total IS NOT NULL
                     THEN 2e0 * s END AS chi2
         FROM agg)
SELECT ka, kb, n_total, dof,
       round(chi2, 6) AS g_stat,
       CASE WHEN chi2 IS NOT NULL AND dof >= 1e0
            THEN round({WH_CHI2_Z}, 6) END AS z_wh,
       CASE WHEN chi2 IS NOT NULL AND dof >= 1e0
            THEN ({WH_CHI2_Z} > 1.645e0) END AS significant
FROM flat
"""


_MOOD_SQL = f"""
WITH cnt AS (SELECT event_type AS g,
                    CAST(round(value * 100) AS BIGINT) AS v,
                    count(*)::BIGINT AS c
             FROM events GROUP BY 1, 2),
w AS (SELECT v, sum(c)::BIGINT AS w FROM cnt GROUP BY 1),
cum AS (SELECT v, sum(w) OVER (ORDER BY v)::BIGINT AS cm FROM w),
nt0 AS (SELECT coalesce(sum(c), 0)::BIGINT AS n FROM cnt),
med AS (SELECT min(v)::BIGINT AS med
        FROM cum CROSS JOIN nt0 WHERE 2 * cm >= n + 1),
per_g AS (SELECT g, sum(c)::BIGINT AS ng,
                 coalesce(sum(CASE WHEN v > med THEN c END),
                          0)::BIGINT AS ag
          FROM cnt CROSS JOIN med GROUP BY 1),
agg AS (SELECT count(*)::BIGINT AS k,
               coalesce(sum(ng), 0)::BIGINT AS nt,
               coalesce(sum(ag), 0)::BIGINT AS at,
               list(struct_pack(g := g, ng := ng, ag := ag)
                    ORDER BY g) AS cells
        FROM per_g),
folded AS (SELECT k, nt, at,
                  list_reduce(
                      list_prepend(0e0,
                          list_transform(cells, s ->
                              CASE WHEN at > 0 AND at < nt THEN
                                (s.ag - s.ng * 1e0 * at / nt)
                                * (s.ag - s.ng * 1e0 * at / nt)
                                / (s.ng * 1e0 * at / nt
                                   * (1e0 - at * 1e0 / nt))
                              END)),
                      (acc, x) -> acc + x) AS chi2r
           FROM agg),
flat AS (SELECT k AS k_groups, nt AS n_total, at AS n_above,
                CASE WHEN k >= 2 AND at > 0 AND at < nt
                     THEN chi2r END AS chi2,
                (k - 1) * 1e0 AS dof
         FROM folded)
SELECT k_groups, n_total, n_above,
       round(chi2, 6) AS chi2,
       CASE WHEN chi2 IS NOT NULL AND k_groups >= 2
            THEN round({WH_CHI2_Z}, 6) END AS z_wh,
       CASE WHEN chi2 IS NOT NULL AND k_groups >= 2
            THEN ({WH_CHI2_Z} > 1.645e0) END AS significant
FROM flat
"""


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("validate-prestaged-r12")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("events", "orders", "documents", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )

    ev = load_table(spark, sf, "events")
    cell = ev.groupBy(
        F.col("event_type").alias("t"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("b"),
    ).agg(F.count(F.lit(1)).alias("x"))

    bf_counts = (
        load_table(spark, sf, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("g"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )

    ca_grp = (
        ev.select(
            F.floor(F.col("value") / 50).cast("long").alias("s"),
            (F.col("event_type") == "purchase").cast("long").alias("p"),
        )
        .groupBy("s")
        .agg(F.sum("p").alias("x"), F.count(F.lit(1)).alias("n"))
    )

    jt_counts = (
        ev.groupBy(
            F.floor(
                F.datediff(
                    F.to_date("ts"), F.lit("1970-01-01").cast("date")
                )
                / 7
            )
            .cast("long")
            .alias("g"),
            F.round(F.col("value") * 100).cast("long").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )

    lb_daily = (
        load_table(spark, sf, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("y")
        )
    )

    cd_counts = (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy(F.round(F.col("value") * 100).cast("long").alias("v"))
        .agg(
            F.sum(
                (F.col("event_type") == "purchase").cast("long")
            ).alias("cp"),
            F.sum(
                (F.col("event_type") == "click").cast("long")
            ).alias("cc"),
        )
    )

    mc_pairs = ev.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(
        F.max((F.col("event_type") == "click").cast("int"))
        .cast("boolean")
        .alias("a"),
        F.max((F.col("event_type") == "purchase").cast("int"))
        .cast("boolean")
        .alias("b"),
    )

    docs = load_table(spark, sf, "documents")
    kp_pairs = docs.select(
        F.when(F.col("n_chars") < 200, "short")
        .when(F.col("n_chars") < 400, "mid")
        .otherwise("long")
        .alias("a"),
        F.when(F.size(F.split(F.col("text"), " ")) < 36, "short")
        .when(F.size(F.split(F.col("text"), " ")) < 72, "mid")
        .otherwise("long")
        .alias("b"),
    )

    o = load_table(spark, sf, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d")
    )
    pu = o.groupBy("o_custkey").agg(
        F.min("d").alias("f"), F.max("d").alias("l")
    )
    hz = o.agg(F.max("d").alias("h"))
    seg = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    gehan_gt = (
        pu.join(seg, "o_custkey")
        .crossJoin(F.broadcast(hz))
        .filter(
            F.col("c_mktsegment").isin(_GEHAN_SEG_A, _GEHAN_SEG_B)
        )
        .select(
            (F.datediff("l", "f") + 1).cast("long").alias("t"),
            (F.datediff("h", "l") >= _GEHAN_GAP_DAYS)
            .cast("long")
            .alias("ev"),
            F.when(F.col("c_mktsegment") == _GEHAN_SEG_A, "a")
            .otherwise("b")
            .alias("g"),
        )
        .groupBy("g", "t")
        .agg(
            F.sum("ev").alias("d"),
            F.sum(1 - F.col("ev")).alias("c"),
        )
    )

    week1 = ev.filter(
        F.to_date("ts") < F.lit("2024-01-08").cast("date")
    )
    cq_cell = week1.groupBy(
        F.col("user_id").alias("b"),
        F.col("event_type").alias("t"),
    ).agg(F.lit(1).alias("x"))
    cq_grid = (
        week1.select(F.col("user_id").alias("b")).distinct()
        .crossJoin(
            F.broadcast(
                week1.select(F.col("event_type").alias("t")).distinct()
            )
        )
        .join(cq_cell, ["b", "t"], "left")
        .fillna(0, subset=["x"])
    )

    # a = second-half spend, b = first-half spend per user, so the
    # kernel's a - b matches the oracle's v2 - v1
    wsr_pairs = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.to_date("ts") >= F.lit("2024-01-16").cast("date"),
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("a"),
        F.sum(
            F.when(
                F.to_date("ts") < F.lit("2024-01-16").cast("date"),
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("b"),
    ).select("a", "b")

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        contingency_counts,
    )

    g_cells = contingency_counts(
        ev.select(
            F.col("event_type").alias("a"),
            (
                (
                    F.datediff(
                        F.to_date("ts"),
                        F.lit("1970-01-01").cast("date"),
                    )
                    + 4
                )
                % 7
            ).alias("b"),
        ),
        "a",
        "b",
    )

    checks = [
        (
            "friedman_event_volume",
            friedman_from_blocks(cell, "b", "t", "x"),
            _FRIEDMAN_SQL,
        ),
        (
            "brown_forsythe_priority",
            brown_forsythe_from_counts(bf_counts),
            _BF_PRIORITY_SQL,
        ),
        (
            "cochran_armitage_valuebin",
            cochran_armitage_trend(ca_grp),
            _CA_VALUEBIN_SQL,
        ),
        (
            "jonckheere_terpstra_value_by_week",
            jonckheere_terpstra_from_counts(jt_counts),
            _JT_WEEK_SQL,
        ),
        (
            "ljung_box_daily_revenue",
            ljung_box_from_series(lb_daily, "d", "y", _LB_MAX_LAG),
            _LB_REVENUE_SQL,
        ),
        (
            "cliffs_delta_purchase_vs_click",
            cliffs_delta_from_value_counts(cd_counts),
            _CLIFFS_SQL,
        ),
        (
            "runs_test_daily_revenue",
            runs_test_from_series(lb_daily, "d", "y"),
            _RUNS_REVENUE_SQL,
        ),
        (
            "mcnemar_click_vs_purchase_userday",
            mcnemar_from_pairs(mc_pairs),
            _MCNEMAR_SQL,
        ),
        (
            "cohens_kappa_doc_length_raters",
            cohens_kappa_from_pairs(kp_pairs),
            _KAPPA_SQL,
        ),
        (
            "gehan_wilcoxon_churn_by_segment",
            gehan_wilcoxon_from_counts(gehan_gt),
            _GEHAN_SQL,
        ),
        (
            "page_l_event_volume_by_type",
            page_l_from_blocks(cell, "b", "t", "x"),
            _PAGE_SQL,
        ),
        (
            "cochran_q_user_by_event_type",
            cochran_q_from_blocks(cq_grid, "b", "t", "x"),
            _CQ_SQL,
        ),
        (
            "wilcoxon_signed_rank_user_halves",
            wilcoxon_signed_rank_from_pairs(wsr_pairs),
            _WSR_SQL,
        ),
        (
            "kuiper_purchase_vs_click",
            kuiper_from_value_counts(cd_counts, ca="cp", cb="cc"),
            _KUIPER_SQL,
        ),
        (
            "cvm_purchase_vs_click",
            cvm_from_value_counts(cd_counts, ca="cp", cb="cc"),
            _CVM_SQL,
        ),
        (
            "g_test_event_dow",
            g_test_from_contingency(g_cells),
            _G_TEST_SQL,
        ),
        (
            "mood_median_value_by_type",
            mood_median_from_counts(
                ev.groupBy(
                    F.col("event_type").alias("g"),
                    F.round(F.col("value") * 100)
                    .cast("long")
                    .alias("v"),
                ).agg(F.count(F.lit(1)).alias("c"))
            ),
            _MOOD_SQL,
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
