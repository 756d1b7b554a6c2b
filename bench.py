"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints TWO JSON lines — a bulky detail record first, then a compact
summary LAST:
  {"metric": "headline_queries_detail", "queries": {...},
   "shuffle_bytes": {...}, "stages": {...}, "trained": {...}, ...}
  {"metric": "headline_queries_total", "value": N, "unit": "sec",
   "queries": {...}, "sf": ...}

The summary-last ordering is load-bearing: the round driver durably
records only a bounded TAIL of this program's stdout, and round 9's
single-line payload (after shuffle_bytes/stages were added) grew past
that window, truncating the per-key wall times out of the permanent
BENCH_r09.json artifact (VERDICT r9, What's wrong #1). The compact
final line always fits; the detail line is additionally written to
BENCH_DETAIL.json beside this file so the full record survives even
when stdout is clipped.

queries[k] is best-of-2 wall seconds; shuffle_bytes[k] / stages[k]
come from the first run's stage metrics (deterministic for a fixed
plan + SF — the cross-round regression signal that survives box
drift).

Query set mirrors BASELINE.md's shapes (scan 1a/1b, aggregate 2a) plus
the heavier operator tiers (join/window/dedup/similarity) so the
relative shape — scans ≪ aggregation ≪ pairwise ops — is visible and
comparable across rounds. Each query is executed to completion with a
noop sink (no driver-side materialization, same contract as the
engine: the cost measured is scan+compute+shuffle, not collect)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: name -> catalog query name
HEADLINE = {
    "q1a_scan": "scan_filter_project",
    "q1b_scan_wide": "scan_filter_project_wide",
    "q2a_substr_agg": "substr_groupby_sum",
    "q_pricing_summary": "agg_pricing_summary",
    "q_star_join": "join_revenue_by_nation",
    "q_window_topk": "window_topk_orders_per_cust",
    "q_asof_join": "asof_join_events_orders",
    "q_dedup_minhash": "dedup_minhash_lsh",
    "q_dedup_simhash": "dedup_simhash",
    "q_similarity_topk": "similarity_topk",
    # serving-mode A/B keys (renamed in round 6 from q_similarity_ivf /
    # q_pq_topk, same catalog entries — see BENCH_NOTES): *_broadcast
    # measures the operators' DEFAULT serving mode; *_literal pins the
    # plan-literal mode those entries held through rounds 3-5 so the
    # bench series stays comparable. Broadcast-first so the default
    # path leads the report.
    "q_ivf_literal": "similarity_ivf_topk",
    "q_text_quality": "text_quality",
    "q_dedup_paragraphs": "dedup_paragraphs_corpus",
    "q_unigram_logprob": "text_unigram_logprob",
    "q_bm25_search": "text_bm25_search",
    "q_training_prep": "jobspec_training_prep",
    "q_salted_agg": "skew_salted_event_totals",
    "q_global_rank": "global_sort_rank",
    "q_jobspec": "jobspec_filter_groupby",
    # round 3 additions
    "q_c4_clean": "text_c4_line_clean",
    "q_pq_literal": "similarity_pq_topk",
    "q_dedup_spans": "dedup_substring_spans",
    "q_bigram_logprob": "text_bigram_logprob",
    "q_corpus_report": "corpus_stats_report",
    "q_web_pipeline": "jobspec_web_pipeline",
    "q_pagerank": "graph_pagerank_tokens",
    "q_fuzzy_match": "fuzzy_match_customers",
    "q_ewma": "ewma_user_value",
    # round 4 additions
    "q_sessionize": "sessionize_events",
    "q_market_share": "q8_market_share",
    "q_waiting_suppliers": "q21_waiting_suppliers",
    "q_ivf_broadcast": "similarity_ivf_topk_broadcast",
    "q_ewma_hof": "ewma_user_value_hof",
    "q_pq_broadcast": "similarity_pq_topk_broadcast",
    # round 5 additions
    "q_label_prop": "graph_label_propagation",
    "q_zorder": "zorder_layout_lineitem",
    "q_equidepth": "equidepth_histogram_prices",
    "q_drift_psi": "corpus_drift_psi",
    "q_funnel": "funnel_conversion_events",
    "q_ahash_dedup": "image_ahash_dedup",
    # round 6 additions
    "q_ks_test": "ks_test_click_vs_error",
    "q_basket_pairs": "market_basket_part_pairs",
    "q_mv_refresh": "jobspec_mv_refresh_hourly",
    "q_ols": "ols_price_qty_discount",
    "q_mann_whitney": "mann_whitney_auc_value",
    "q_geo_radius": "geo_radius_pairs_customers",
    # round 7 additions
    "q_chi2": "chi2_independence_event_dow",
    "q_acf": "acf_daily_revenue",
    "q_countmin": "countmin_heavy_users",
    "q_item_cosine": "item_cosine_parts",
    "q_bloom_prefilter": "bloom_prefilter_orders",
    "q_kaplan_meier": "kaplan_meier_customer_churn",
    "q_log_rank": "log_rank_churn_by_segment",
    "q_cuped": "cuped_ab_user_value",
    "q_ccf": "ccf_purchase_vs_clicks",
    "q_table_diff": "table_diff_cdc_snapshot",
    "q_interval_overlap": "interval_overlap_orders",
    # round 9 additions
    "q_jobspec_interval": "jobspec_interval_join",
    "q_spearman": "spearman_rank_corr_lineitem",
    "q_attribution": "attribution_position_based",
    # round 10 additions (NA/MK reuse the KM / kendall plan shapes
    # already measured by q_kaplan_meier / q_ols-tier keys; the three
    # below are the genuinely new fold/rank shapes)
    "q_holt_winters": "holt_winters_daily_events",
    "q_backtest": "forecast_backtest_daily_revenue",
    "q_bh_fdr": "bh_fdr_dow_purchase_rate",
    # round 11 additions (CUSUM/AD/seasonal-MK reuse the measured
    # backtest/KS/kendall plan shapes; the four below are the
    # genuinely new shapes: the centered-MA window + phase collapse,
    # the 3-state seasonal fold, the pair->difference-array prefix
    # sum, and the pooled-CDF rank collapse)
    "q_decompose": "seasonal_decompose_daily_events",
    "q_hw_backtest": "hw_backtest_daily_events",
    "q_pettitt": "pettitt_changepoint_daily_revenue",
    "q_kruskal": "kruskal_wallis_value_by_type",
    "q_brown_forsythe": "brown_forsythe_value_by_type",
    "q_cochran_armitage": "cochran_armitage_purchase_by_week",
    # round 12 additions: of the 17 registered pre-staged kernels only
    # the two genuinely NEW exchange shapes get keys (VERDICT r11 #7)
    # — the within-block ranking window over the |types| x |days|
    # block grid, and the h-way self-equi-join lag frame. The other 15
    # ride value-counts / pair / contingency frames q_kruskal, q_ks,
    # q_chi2 and q_mann_whitney already measure.
    "q_friedman": "friedman_event_volume",
    "q_ljung_box": "ljung_box_daily_revenue",
}


# Scan-floor canary (VERDICT r13 "What's wrong" #5): the r13 driver run
# recorded an UNTOUCHED 0-shuffle scan key at 15x its historical wall
# (q1a 0.343 -> 5.126 s on a byte-identical plan) with load1 clean at
# 1.47 — disk co-tenancy the load1 guard cannot see. The three
# BASELINE.md twin keys are pure scan/aggregate canaries: when any of
# them exceeds its committed historical floor x3 the run is tagged
# scan_warn, so a pollution-dominated run self-identifies the way
# load_warn runs do. Floors are the CLEAN-run historical record across
# r12/r13 boxes (driver r12: 0.343/0.343/0.424; this box's clean runs:
# 0.55-0.82), taken at the high end so a slower-but-quiet box does not
# false-positive.
SCAN_FLOOR = {
    "q1a_scan": 0.75,
    "q1b_scan_wide": 0.70,
    "q2a_substr_agg": 0.85,
}
SCAN_WARN_FACTOR = 3.0


def check_scan_floor(timings: dict[str, float]) -> bool:
    """True when any baseline scan canary exceeds its committed clean
    floor x SCAN_WARN_FACTOR — the I/O-co-tenancy fingerprint."""
    return any(
        timings.get(k, 0.0) > f * SCAN_WARN_FACTOR
        for k, f in SCAN_FLOOR.items()
    )


# Load guard (VERDICT r11 "What's wrong" #2): BENCH_NOTES r11 records
# a real mis-adjudication where a run started at 1-min load 3.6
# attributed the warmup query's stages to the first key's MeasuredRun
# window and flagged a phantom PLAN/DATA-CHANGE. Two code guards turn
# that prose caveat into mechanism: (1) the 1-min load is checked
# before the measured loop and the artifact is TAGGED (warn, not
# refuse — the round driver must still get its record) when it
# exceeds the threshold; (2) the first key is re-measured once when
# its stage-metric byte signature equals the warmup's (the
# misattribution fingerprint).
LOAD1_WARN_DEFAULT = 2.0


def check_load(threshold: float | None = None) -> tuple[float | None, bool]:
    """(1-min loadavg, exceeds-threshold flag). Threshold comes from
    $SPARK_GRAFT_MAX_LOAD1 (default 2.0 — the r11 incident started at
    3.6; anything above ~2 on the bench box means a co-tenant is
    active and wall times are suspect). Platforms without getloadavg
    report (None, False)."""
    if threshold is None:
        threshold = float(
            os.environ.get("SPARK_GRAFT_MAX_LOAD1", str(LOAD1_WARN_DEFAULT))
        )
    try:
        load1 = os.getloadavg()[0]
    except (OSError, AttributeError):
        return None, False
    return round(load1, 2), load1 > threshold


def first_key_echoes_warmup(
    first_bytes: int | None, warmup_bytes: int | None
) -> bool:
    """True iff the first measured key's shuffle-byte signature equals
    the warmup query's — the r11 misattribution fingerprint (the
    warmup's stages landed inside the first key's MeasuredRun window).
    Unmeasured (None) on either side is NOT an echo: re-running on
    missing metrics would loop on REST-read hiccups, and the byte
    column already records the miss as null. Zero on either side is
    NOT an echo either (ADVICE r12): two scan-only queries both
    legitimately shuffle 0 bytes, so 0 == 0 is no fingerprint — it
    would force a pointless re-measure leg on every run whose first
    headline key happens to be exchange-free."""
    return (
        first_bytes is not None
        and warmup_bytes is not None
        and first_bytes > 0
        and warmup_bytes > 0
        and first_bytes == warmup_bytes
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "?"

    from lambda_refarch_mapreduce_spark import get_spark
    from lambda_refarch_mapreduce_spark.plans import catalog, catalog_analytics, catalog_llm  # noqa: F401

    # UI on so MeasuredRun's stage-metrics REST reads work: per-key
    # shuffle bytes are DETERMINISTIC where wall-times drift with box
    # load (three rounds of drift-vs-regression adjudication — r6
    # text_quality, r7 basket, r8 ANN broadcast — would have been
    # mechanical byte comparisons; VERDICT r8 #1)
    spark = get_spark("bench", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    load1, load_warn = check_load()
    if load_warn:
        print(
            f"WARNING: 1-min load {load1} exceeds the bench guard "
            "threshold — wall times this run are suspect (co-tenant "
            "activity); the artifact is tagged load_warn",
            file=sys.stderr,
        )

    from lambda_refarch_mapreduce_spark.metrics import MeasuredRun

    # per-key pin scoping: the two-phase rank/prefix kernels persist
    # their range-partitioned frame for correctness (see
    # operators.relational.pin); releasing each key's pins after its
    # legs keeps 70+ keys of accumulated InMemoryRelations from
    # occupying storage memory and drifting later keys' AQE advisory
    # sizes (the q_waiting_suppliers effect, BENCH_NOTES r12)
    from lambda_refarch_mapreduce_spark.operators.relational import (
        pin_scope,
    )

    # warmup: JVM + parquet footer caches, excluded from timings —
    # measured anyway so its byte signature can fingerprint
    # misattribution into the first key's window
    with pin_scope(), MeasuredRun(spark) as wm:
        catalog.REGISTRY["substr_groupby_sum"].spark(
            spark, sf_dir
        ).write.format("noop").mode("overwrite").save()
    warmup_bytes = (
        wm.stats.shuffle_bytes if wm.stats.bytes_measured else None
    )

    # best-of-2 per query: the second run has JIT/codegen caches warm,
    # which is the steady-state a long-running cluster actually sees.
    # The FIRST run is additionally wrapped in MeasuredRun (stage
    # metrics via the UI REST API — covers eager construction too):
    # its shuffle bytes and stage count land in the JSON next to the
    # wall-time, so cross-round deltas separate plan changes (bytes
    # move) from box drift (bytes identical). The REST reads add ~ms
    # to run 1's wall; run 2 is unaffected and is usually the best.
    def measured_leg(qname: str) -> tuple[float, int | None, int | None]:
        # construction INSIDE the timer: plan building is ~ms for
        # lazy queries, but operators with eager stages (pagerank's
        # edge materialization + iteration) do real work there and
        # must not be excluded
        t0 = time.monotonic()
        with pin_scope(), MeasuredRun(spark) as m:
            df = catalog.REGISTRY[qname].spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        if not m.stats.bytes_measured:
            return wall, None, None
        return wall, m.stats.shuffle_bytes, m.stats.extra.get("n_stages")

    timings: dict[str, float] = {}
    shuffle_bytes: dict[str, int | None] = {}
    stages: dict[str, int | None] = {}
    first_key_remeasured = False
    for idx, (label, qname) in enumerate(HEADLINE.items()):
        wall, sb, ns = measured_leg(qname)
        if idx == 0 and first_key_echoes_warmup(sb, warmup_bytes):
            # the warmup's stages were attributed to this window
            # (the r11 incident) — one re-measure replaces the
            # poisoned byte signature; the suspect wall still joins
            # best-of (it can only lose)
            first_key_remeasured = True
            wall2, sb, ns = measured_leg(qname)
            wall = min(wall, wall2)
        shuffle_bytes[label], stages[label] = sb, ns
        best = wall
        # second leg: JIT/codegen caches warm — the steady state a
        # long-running cluster actually sees; no REST reads
        t0 = time.monotonic()
        with pin_scope():
            df = catalog.REGISTRY[qname].spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
        timings[label] = round(best, 3)

    # Trained tiers measured twice more with the index BUILD (centroid/
    # codebook training, edge materialization) separated from the query
    # SERVE — production trains once and serves many, so the amortized
    # cost is serve_s; queries[...] above keeps the all-in number for
    # cross-round comparability.
    with pin_scope():
        trained = _trained_split(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    detail = {
        "metric": "headline_queries_detail",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "shuffle_bytes": shuffle_bytes,
        "stages": stages,
        "trained": trained,
        "load1": load1,
        "load_warn": load_warn,
        "first_key_remeasured": first_key_remeasured,
        "sf": sf,
    }
    # Summary-line contract fix (r14, VERDICT r13 "What's wrong" #2 /
    # next-round #2): the r10 "O(1) summary" change moved the per-key
    # walls out of the FINAL line entirely — but the round driver's
    # per-query/geomean/scaling comparison parses exactly that line,
    # so PERF per_query has been empty and bench_ok false since r10.
    # This was a measurement-CHANNEL bug, not a timing change: the
    # walls were always measured and recorded in the detail line /
    # BENCH_DETAIL.json (the old artifacts keep the old numbers). The
    # per-key dict is now back in the summary, rounded to 2 decimals:
    # 71 keys serialize to ~1.7 kB, inside the driver's ~2 kB tail
    # window with headroom (measured against the r14 entry record).
    # The 5-slowest "top" block the r10 shape carried is dropped as
    # redundant — every wall it surfaced is in queries[] again.
    summary = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "n_keys": len(timings),
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "load1": load1,
        "sf": sf,
    }
    if load_warn:
        summary["load_warn"] = True
    if check_scan_floor(timings):
        summary["scan_warn"] = True
        detail["scan_warn"] = True
    if first_key_remeasured:
        summary["first_key_remeasured"] = True
    # full record to a committed-able file (best-effort: a read-only
    # checkout must not fail the bench)
    try:
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
        )
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError:
        pass
    # bulky line first, compact summary LAST (tail-window contract)
    print(json.dumps(detail))
    print(json.dumps(summary))


def _trained_split(spark, sf_dir: str) -> dict[str, dict[str, float]]:
    """(build_s, serve_s) for the tiers with a one-off training/index
    phase. Build runs once (it is deterministic and cached by
    content); serve is best-of-2 on the pre-built artifact."""
    from pyspark.sql import functions as F

    from lambda_refarch_mapreduce_spark import load_table
    from lambda_refarch_mapreduce_spark.operators import graph, similarity
    from lambda_refarch_mapreduce_spark.plans.catalog_llm import (
        TOPK_QUERY_MAX_ID,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # same query set as the headline catalog entries, so build_s +
    # serve_s decomposes the exact workload queries[...] reports all-in
    queries = emb.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    docs = load_table(spark, sf_dir, "documents")

    def timed(fn):
        t0 = time.monotonic()
        out = fn()
        return out, time.monotonic() - t0

    def best2(fn):
        return round(min(timed(fn)[1], timed(fn)[1]), 3)

    out: dict[str, dict[str, float]] = {}

    # one build each (training is serving-mode-independent), then a
    # serve leg per strategy so the literal/broadcast A/B is visible
    # in the amortized numbers, not just the all-in headline
    cents, b_ivf = timed(
        lambda: similarity.ivf_centroids(emb, "vec_id", "embedding", 16, 1)
    )
    for key, strategy in (
        ("q_ivf_broadcast", "broadcast"),  # the operator default
        ("q_ivf_literal", "literal"),
    ):
        s = best2(
            lambda: similarity.ivf_topk(
                emb, queries, k=5, n_centroids=16, n_probe=4,
                centroids=cents, centroid_strategy=strategy,
            ).write.format("noop").mode("overwrite").save()
        )
        out[key] = {"build_s": round(b_ivf, 3), "serve_s": s}

    books, b_pq = timed(
        lambda: similarity.pq_codebooks(emb, "vec_id", "embedding", 8, 16)
    )
    for key, strategy in (
        ("q_pq_broadcast", "broadcast"),  # the operator default
        ("q_pq_literal", "literal"),
    ):
        s = best2(
            lambda: similarity.pq_topk(
                emb, queries, k=5, m=8, n_codes=16,
                codebooks=books, codebook_strategy=strategy,
            ).write.format("noop").mode("overwrite").save()
        )
        out[key] = {"build_s": round(b_pq, 3), "serve_s": s}

    edges, b = timed(
        lambda: graph.token_bigram_edges(docs, "text").localCheckpoint()
    )
    s = best2(
        lambda: graph.pagerank(edges, 3, 0.85)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    out["q_pagerank"] = {"build_s": round(b, 3), "serve_s": s}
    return out


if __name__ == "__main__":
    main()
