"""Physical-plan assertions — the 100TB posture (SURVEY.md §4, §7.4.5).

Correct results are necessary, not sufficient: these tests pin the
*plan shapes* that survive a 1000-executor / 100TB scale-up —
pushdown reaching the scan, broadcasts where a side is a dim, top-k
executing as TakeOrderedAndProject / WindowGroupLimit, and no
whole-row scans for narrow projections.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lambda_refarch_mapreduce_spark.plans import catalog, catalog_analytics, catalog_llm  # noqa: F401
from lambda_refarch_mapreduce_spark.sources.readers import load_table
from tests.conftest import SF_CORRECT, SF_SMOKE, formatted_plan


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return formatted_plan(df)


def test_filter_pushdown_reaches_parquet_scan(spark):
    """1a shape: the predicate must appear in PushedFilters, not as a
    post-scan Filter only."""
    df = catalog.REGISTRY["scan_filter_project"].spark(spark, SF_CORRECT)
    plan = _formatted(df)
    assert "PushedFilters: [" in plan
    assert "GreaterThan(value,150" in plan.replace(" ", "")


def test_column_pruning_narrow_readschema(spark):
    """Projection pruning: a 2-column projection over lineitem must
    read exactly those columns (reference got this implicitly by
    indexing fields 0,3 — mapper.py:50-54)."""
    df = load_table(spark, SF_CORRECT, "lineitem").select("l_orderkey", "l_quantity")
    plan = _formatted(df)
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs, plan
    line = rs[0]
    assert "l_orderkey" in line and "l_quantity" in line
    assert "l_extendedprice" not in line  # untouched column not scanned


def test_star_join_broadcasts_dims(spark):
    df = catalog.REGISTRY["join_revenue_by_nation"].spark(spark, SF_CORRECT)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must not shuffle the fact


def test_global_topk_is_take_ordered(spark):
    df = catalog.REGISTRY["topk_global_orders"].spark(spark, SF_CORRECT)
    assert "TakeOrderedAndProject" in _plan(df)


def test_grouped_topk_has_window_group_limit(spark):
    df = catalog.REGISTRY["window_topk_orders_per_cust"].spark(spark, SF_CORRECT)
    assert "WindowGroupLimit" in _plan(df)


def test_groupby_has_partial_aggregate(spark):
    """Map-side combine (reference O9, mapper.py:52-54): the aggregate
    must run partial+final, not shuffle raw rows."""
    df = catalog.REGISTRY["substr_groupby_sum"].spark(spark, SF_CORRECT)
    plan = _formatted(df)
    assert plan.count("HashAggregate") >= 2


def test_no_cartesian_in_lsh_candidates(spark):
    """MinHash-LSH candidate generation must be an equi-join on the
    band key — never a cross join."""
    df = catalog.REGISTRY["dedup_minhash_lsh"].spark(spark, SF_CORRECT)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_whole_stage_codegen_covers_agg(spark):
    df = catalog.REGISTRY["agg_pricing_summary"].spark(spark, SF_CORRECT)
    df.collect()  # finalize the AQE plan before inspecting codegen spans
    plan = _plan(df)
    # codegen stages print as "*(n) Operator" in the simple plan string
    assert "*(" in plan, plan


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located join: both sides bucketed on the join key → the
    sort-merge join runs without any Exchange (the pay-the-shuffle-
    once-at-write pattern). Broadcast is disabled to force the join
    strategy that would otherwise shuffle."""
    from lambda_refarch_mapreduce_spark.sources.sinks import write_bucketed

    orders = load_table(spark, SF_CORRECT, "orders")
    customer = load_table(spark, SF_CORRECT, "customer")
    write_bucketed(orders, "b_orders", ["o_custkey"], 8, ["o_custkey"])
    write_bucketed(customer, "b_customer", ["c_custkey"], 8, ["c_custkey"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        j.collect()  # finalize AQE plan
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # sanity: same join on the raw (unbucketed) tables DOES exchange
        raw = orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        raw.collect()
        assert "Exchange" in _plan(raw)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitioned sink + partition pruning on read: a
    filter on the partition column must prune directories at planning
    time (PartitionFilters), not scan-and-filter. At 100TB this is the
    difference between reading one day and reading three years."""
    out = str(tmp_path / "events_by_type")
    load_table(spark, SF_CORRECT, "events").write.partitionBy(
        "event_type"
    ).parquet(out)
    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = _formatted(df)
    assert "PartitionFilters" in plan
    # the partition predicate must appear as a partition filter...
    pf_line = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "event_type" in pf_line
    # ...and the row counts must still be exact
    want = (
        load_table(spark, SF_CORRECT, "events")
        .filter(F.col("event_type") == "click")
        .count()
    )
    assert df.count() == want


def test_cluster_conf_sizing():
    from lambda_refarch_mapreduce_spark.session import cluster_conf

    c = cluster_conf(total_cores=4000, dataset_tb=100.0, target_partition_mb=256)
    parts = int(c["spark.sql.shuffle.partitions"])
    assert 8000 <= parts <= 200_000
    assert int(c["spark.sql.files.maxPartitionBytes"]) == 256 * 1024 * 1024
    # small data (0.01TB -> 41 partitions by size): floor at 2*cores wins
    c2 = cluster_conf(total_cores=64, dataset_tb=0.01)
    assert int(c2["spark.sql.shuffle.partitions"]) == 128
    # r14: zstd shuffle codec is a CLUSTER overlay; the local session
    # defaults must stay on the stock codec so the cross-round bench
    # series remains comparable (the driver benches local[32] and
    # local[8] against prior rounds)
    from lambda_refarch_mapreduce_spark.session import _BASE_CONF

    assert c["spark.io.compression.codec"] == "zstd"
    assert "spark.io.compression.codec" not in _BASE_CONF


def test_bm25_topk_is_take_ordered_and_query_pruned(spark):
    """BM25: global top-k must be TakeOrderedAndProject (per-partition
    heaps), and df/stats sides must broadcast — the corpus shuffle
    carries only query-matching tokens."""
    df = catalog.REGISTRY["text_bm25_search"].spark(spark, SF_CORRECT)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # per-term df joins broadcast
    assert "SortMergeJoin" not in plan


def test_paragraph_dedup_shuffles_no_text(spark):
    """Corpus paragraph dedup (r14 §8 shape): paragraph BODIES never
    ride a hash exchange — the keep-first decision shuffles only
    (id, pos, digest), the dropped-position frame joins back on doc
    id, and documents rebuild row-locally from their own text."""
    df = catalog.REGISTRY["dedup_paragraphs_corpus"].spark(spark, SF_CORRECT)
    plan = _formatted(df)
    # the digest-keyed window exchange must carry only the narrow
    # decision columns, never the paragraph body column; same for the
    # dropped-position aggregate's id exchange. The only exchange
    # allowed to carry text is the local-mode round-robin parallelism
    # guard (RoundRobinPartitioning), which no-ops at scale.
    blocks = plan.split("\n\n")
    dg_blocks = [
        b
        for b in blocks
        if b.lstrip().startswith("(")
        and "Exchange" in b
        and "hashpartitioning(__dg" in b
    ]
    assert dg_blocks, "digest-keyed exchange missing from the plan"
    for b in blocks:
        if (
            b.lstrip().startswith("(")
            and "Exchange" in b
            and "hashpartitioning" in b
        ):
            assert "para#" not in b, f"text rides a hash exchange:\n{b}"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_unigram_logprob_reuses_frequency_scan(spark):
    """The vocab-sized frequency table is localCheckpointed: its three
    consumers (totals, top-K, OOV floor) must read the materialized
    RDD, not re-derive three corpus scans."""
    df = catalog.REGISTRY["text_unigram_logprob"].spark(spark, SF_CORRECT)
    plan = _plan(df)
    assert plan.count("Scan ExistingRDD") >= 3  # all consumers share it
    # exactly two parquet scans of documents: checkpoint build + id join
    n_parquet = plan.count("Scan parquet")
    assert n_parquet <= 2, f"expected <=2 corpus scans, saw {n_parquet}"


def test_semdedup_pairs_are_cluster_blocked(spark):
    """SemDedup's pair join must be an equi-join on cluster_id — no
    cartesian / nested-loop over corpus x corpus."""
    from lambda_refarch_mapreduce_spark.operators.similarity import semdedup

    emb = load_table(spark, SF_CORRECT, "embeddings").limit(200)
    df = semdedup(emb, "vec_id", "embedding", 0.95, 4)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_broadcast_codebook_strategy_no_literal_blowup(spark):
    """The IVF/PQ literal→broadcast cutover (VERDICT r3 #5): under
    centroid/codebook_strategy="broadcast" the centroids ride ONE
    broadcast-joined row, so the optimized plan must stay small (no
    O(n_centroids·dim) literal arrays) while producing exactly the
    same rows as the literal mode."""
    from pyspark.sql import functions as F

    from lambda_refarch_mapreduce_spark.operators import similarity

    emb = load_table(spark, SF_CORRECT, "embeddings").limit(300)
    q = emb.filter(F.col("vec_id") < 10)
    lit_df = similarity.ivf_topk(emb, q, centroid_strategy="literal")
    bc_df = similarity.ivf_topk(emb, q, centroid_strategy="broadcast")
    assert {tuple(r) for r in lit_df.collect()} == {
        tuple(r) for r in bc_df.collect()
    }
    p_lit = lit_df._jdf.queryExecution().optimizedPlan().toString()
    p_bc = bc_df._jdf.queryExecution().optimizedPlan().toString()
    # literal mode bakes 16 centroids x 64 dims into the plan twice;
    # broadcast mode must be an order of magnitude smaller
    assert len(p_bc) < len(p_lit) / 5
    assert "BroadcastExchange" in _plan(bc_df) or "Broadcast" in _plan(bc_df)
    # PQ twin
    plit_df = similarity.pq_topk(emb, q, codebook_strategy="literal")
    pbc_df = similarity.pq_topk(emb, q, codebook_strategy="broadcast")
    assert {tuple(r) for r in plit_df.collect()} == {
        tuple(r) for r in pbc_df.collect()
    }
    assert len(pbc_df._jdf.queryExecution().optimizedPlan().toString()) < len(
        plit_df._jdf.queryExecution().optimizedPlan().toString()
    )
    # the DEFAULT serving mode is broadcast (VERDICT r4 #1: the A/B
    # shows literal loses at every index size and is plan-O(index));
    # a default-args plan must look like the broadcast plan, not the
    # literal blowup
    d_ivf = similarity.ivf_topk(emb, q)
    assert (
        len(d_ivf._jdf.queryExecution().optimizedPlan().toString())
        < len(p_lit) / 5
    )
    d_pq = similarity.pq_topk(emb, q)
    assert len(d_pq._jdf.queryExecution().optimizedPlan().toString()) < len(
        plit_df._jdf.queryExecution().optimizedPlan().toString()
    )


def test_registry_wide_no_cartesian_product(spark):
    """Sweep EVERY catalog entry's physical plan: no CartesianProduct
    anywhere, and BroadcastNestedLoopJoin only in entries that
    document a theta/range join or a broadcast single-row/tiny-side
    cross join — the registry-level guard that no future entry
    sneaks in an all-pairs plan."""
    from lambda_refarch_mapreduce_spark.plans import catalog, catalog_analytics, catalog_llm  # noqa: F401

    # BNLJ is legitimate where the docstring declares a theta/range
    # join against a BROADCAST side or a single-row stats cross join
    bnlj_ok = {
        "range_bucket_lineitem",       # broadcast range-bucket BNLJ
        "cross_join_region_priority",  # tiny x tiny dense grid
        "scalar_subquery_above_avg",   # single-row subquery broadcast
        "spearman_rank_corr_lineitem",  # single-row x-marginal moment frame
        # broadcast onto the single-row y-side aggregate (r13 shape)
        "embedding_neardup_pairs",     # grid theta-join (documented)
        "embedding_neardup_lsh_blocked",
        "similarity_topk",             # broadcast queries, != predicate
        "similarity_pq_topk",          # broadcast queries, != predicate
        "similarity_pq_topk_broadcast",  # + single-row codebook frame
        "similarity_pq_rerank_topk",
        "similarity_ivf_topk",
        "similarity_ivf_topk_broadcast",  # + single-row centroid frame
        "similarity_ivfadc_topk_broadcast",  # + centroid/codebook frames
        "similarity_ivfadc_topk",
        "embedding_pq_codes",          # single-row codebook frame
        # (broadcast is the operator default since round 5)
        "hll_sketch_rollup_users",     # single-row exact-total term for
        # the ALL-row bounded-error verdict
        "semdedup_embeddings",
        "text_unigram_logprob",        # single-row floor/total rows
        "text_bigram_logprob",         # single-row (V,) row
        "text_tfidf_terms",            # single-row N row
        "train_token_quality_model",   # single-row median + class priors
        "join_key_skew_report",        # single-row totals + entropy terms
        "text_bm25_search",            # single-row stats row
        "corpus_stats_report",         # single-row grand total
        "corpus_drift_psi",            # single-row snapshot-totals term
        "collocations_pmi_top",        # single-row bigram grand total
        "histogram_event_values",      # single-row (min,max) bounds
        "equidepth_histogram_prices",  # single-row total-count term
        "welch_t_click_vs_error",      # single-row x single-row stats
        "graph_pagerank_tokens",       # single-row dangling-mass term
        "graph_triangle_stats",        # three single-row census frames
        "chi_square_event_weekday",    # single-row N and dof terms
        "q11_important_parts",         # single-row global-share threshold
        "q15_top_revenue_suppliers",   # single-row max-revenue term
        "q22_idle_customers",          # single-row global-avg balance
        "curriculum_order_docs",       # single-row total + offsets
        "mixture_token_sample",
        "quality_quantile_filter",
        "pack_sequences_token_budget",
        "decimal_exact_totals",
        "stats_aggregates_lineitem",
        "dedup_incremental_batch",
        "decontaminate_vs_benchmark",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "jobspec_training_prep",
        "training_data_prep_pipeline",
        # round 6
        "ks_test_click_vs_error",      # single-row (na, nb) totals term
        "target_encode_priority",      # single-row global-mean term
        "rfm_customer_segments",       # single-row customer-count term
        "weighted_percentiles_price",  # single-row total + 3-row grid
        "kmv_sketch_part_overlap",     # single-row sketch-stats terms
        "pareto_revenue_by_part",      # single-row total-revenue term
        "benford_first_digit_prices",  # single-row total over a 9-row grid
        "nb_filter_confusion_eval",    # single-row median + prior terms
        "nb_filter_lift_deciles",      # single-row median/prior/base terms
        # round 7 — all alphabet-sized margin crosses / single-row
        # totals / bounded probe grids, never two data-sized sides
        "contingency_event_dow",       # |A| x 7 margin cross + 1-row total
        "chi2_independence_event_dow",  # same dense-cell frame
        "mutual_info_event_dow",        # same dense-cell frame
        "acf_daily_revenue",           # 7-row lag grid + 1-row moments
        "countmin_heavy_users",        # single-row total term
        "percentile_sketch_rank_gate",  # 3-row probe grid + 1-row total
        # round 8
        "chi2_homogeneity_value_bins",  # 2 x |bins| dense margin cross
        "kaplan_meier_customer_churn",  # 1-row horizon + 1-row n_all
        "log_rank_churn_by_segment",   # 1-row horizon + 1-row totals
        "cuped_ab_user_value",         # 1-row min-date split point
        "ccf_purchase_vs_clicks",      # 15-row lag grid cross
        # round 9 — alphabet-sized grids / single-row stat frames only
        "kendall_tau_daily",           # |days|-1 gap grid + 1-row tie/
        # total frames (gap-explode pair join is the equi-join)
        "theil_sen_daily_trend",       # gap grid + 1-row median frame
        "nb_model_calibration_bins",   # 1-row median + prior terms
        # (same train->score passes as nb_filter_confusion_eval)
        "qq_quality_by_lang",          # 19-row ventile grid + 1-row
        # per-side totals against the value ALPHABET
        # round 10 — same classes: single-row stat frames and
        # alphabet-sized gap grids
        "nelson_aalen_churn_hazard",   # 1-row horizon + 1-row n_all
        # (the KM entry's exact shape)
        "mann_kendall_daily_revenue",  # |days|-1 gap grid + 1-row
        # tie/total frames (pair join is the equi-join)
        "bh_fdr_dow_purchase_rate",    # 1-row family totals + 1-row
        # k_star over the 7-row dow family
        "isotonic_calibration_value_bins",  # 1-row n + |bins| gap grid
        # (segment join is the equi-join; spans explode, never theta)
        "jobspec_chi2_value_by_type",  # |types| x |bins| margin cross
        # + 1-row total (the chi2_independence_event_dow shape)
        # round 11 — same classes again
        "cusum_changepoint_daily_revenue",  # 1-row (n, s, q) totals
        # crossed against the |days| cumulative series
        "anderson_darling_purchase_vs_click",  # 1-row (na, nb) totals
        # against the value alphabet (the ks_test shape)
        "seasonal_mann_kendall_revenue",  # |days|/7-row gap grid +
        # 1-row tie/total frames (pair join is the two-key equi-join)
        "jobspec_ad_value_by_type",    # 1-row (na, nb) totals against
        # the value alphabet (the anderson_darling entry's shape)
        "jobspec_qq_value_by_type",    # 19-row ventile grid + 1-row
        # totals against the value alphabet (the qq_quality shape)
        "pettitt_changepoint_daily_revenue",  # 1-row n frame crossed
        # against the |days| prefix series and the 1-row argmax (the
        # r13 rank identity — no pair grid at all)
        "kruskal_wallis_value_by_type",  # 1-row tie-numerator term
        # against the 5-row group-moment frame
        "jobspec_kruskal_price_by_priority",  # same shape via the
        # stats_test clause
        # round 12 — the 17 pre-staged registrations; same classes:
        # broadcast single-row stat frames and alphabet-sized grids,
        # never two data-sized sides
        "friedman_event_volume",       # 1-row k + 1-row b frames
        # against the |types| x |days| block cells
        "page_l_event_volume_by_type",  # same ranked frame + 1-row
        # moment frames
        "jonckheere_terpstra_value_by_week",  # dense |values| x
        # |weeks| grid off two alphabet-sized frames + 1-row moments
        "ljung_box_daily_revenue",     # 7-row lag grid + 1-row
        # moments (the acf_daily_revenue shape)
        "runs_test_daily_revenue",     # 1-row median + 1-row totals
        # against the |days| series
        "kuiper_purchase_vs_click",    # 1-row (na, nb) totals against
        # the value alphabet (the ks_test shape)
        "cvm_purchase_vs_click",       # same totals-vs-alphabet shape
        "cohens_kappa_doc_length_raters",  # 1-row po x 1-row pe
        # over the 3x3 label alphabet
        "gehan_wilcoxon_churn_by_segment",  # 1-row horizon + 1-row
        # totals (the log_rank_churn_by_segment shape)
        "cochran_q_user_by_event_type",  # dense user x type grid with
        # the BROADCAST 5-row type side; 1-row k/moment frames
        "wilcoxon_signed_rank_user_halves",  # 1-row n_pairs against
        # the 1-row moment frame
        "g_test_event_dow",            # |types| x 7 margin cross +
        # 1-row total (the chi2_independence_event_dow cells)
        "mood_median_value_by_type",   # 1-row median + 1-row n
        # against the (type, cents) alphabet
    }
    offenders, bnlj_new = [], []
    for name, qd in catalog.REGISTRY.items():
        plan = (
            qd.spark(spark, SF_SMOKE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        if "CartesianProduct" in plan:
            offenders.append(name)
        if "BroadcastNestedLoopJoin" in plan and name not in bnlj_ok:
            bnlj_new.append(name)
    assert not offenders, f"CartesianProduct in: {offenders}"
    assert not bnlj_new, (
        f"undocumented BroadcastNestedLoopJoin in: {bnlj_new} — if the "
        "theta/broadcast shape is intentional, add the entry to bnlj_ok "
        "with a comment"
    )


def test_round5_entry_plan_shapes(spark):
    """Plan-shape guards for the round-5 scale claims: winsorize's
    percentile bounds must BROADCAST back onto the fact table (never a
    shuffle join of a 3-row frame); the aHash dedup must shuffle only
    the (id, hash) window exchange — the decode kernel side of the
    plan carries no exchange at all; vocab coverage streams the corpus
    against a BROADCAST vocabulary."""
    from lambda_refarch_mapreduce_spark.plans import catalog

    p = _plan(catalog.REGISTRY["winsorize_prices_by_flag"].spark(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p

    p = _plan(catalog.REGISTRY["image_ahash_dedup"].spark(spark, SF_SMOKE))
    assert p.count("Exchange hashpartitioning") == 1
    assert "MapInPandas" in p and "SortMergeJoin" not in p

    p = _plan(catalog.REGISTRY["vocab_coverage_report"].spark(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p


def test_mv_refresh_shuffles_are_changelog_keyed(spark, tmp_path):
    """Plan guard for the round-5 SCALING.md headline claim (VERDICT r5
    'next round' #7): incremental_agg_update refreshes at CHANGE cost —
    its measured shuffle is FLAT (~1.5 MB) across 100x base growth
    because every exchange is changelog- or group-cardinality-sized.
    Pin the plan shape that makes that true, with the stored view read
    from disk (production: mv is a table, not a recompute):

    - the old-row probe is a BroadcastHashJoin LeftSemi (changelog
      keys broadcast TO the base); the base streams into it with no
      Exchange — a SortMergeJoin/ShuffledHashJoin LeftSemi would mean
      the whole base re-shuffles on the key every refresh
    - the base file is scanned exactly once (the probe); mv once
    - exactly 5 hash exchanges, each bounded: the changelog
      compaction window keyed on o_orderkey, planned twice (once
      under the probe's key list, once under the plus-delta branch —
      both changelog rows), the minus- and plus-delta aggregates
      (group-cardinality partials), and the stored view's side of
      the full-outer merge (|groups| rows). A future edit that
      re-shuffles the base shows up as an extra exchange or an SMJ
      probe and fails here before SCALING.md goes stale."""
    import re

    from pyspark.sql import functions as F

    from lambda_refarch_mapreduce_spark.operators import analytics
    from lambda_refarch_mapreduce_spark.sources import load_table

    base_p = str(tmp_path / "base")
    mv_p = str(tmp_path / "mv")
    base0 = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("segment", (F.col("o_custkey") % 50).cast("int"))
    )
    base0.write.mode("overwrite").parquet(base_p)
    base0.groupBy("segment").agg(
        F.sum("o_totalprice").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    ).write.mode("overwrite").parquet(mv_p)
    base = spark.read.parquet(base_p)
    mv = spark.read.parquet(mv_p)
    ch_p = str(tmp_path / "changelog")
    spark.createDataFrame(
        [
            (7, 10, 11.0, 1, "U"),
            (14, 20, 0.0, 1, "D"),
            (90_000_001, 30, 3.0, 1, "I"),
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, seq int, op string",
    ).write.mode("overwrite").parquet(ch_p)
    # the changelog arrives as a TABLE (CDC landing zone), matching
    # production — and giving the planner real size stats, so the
    # small-changelog broadcast regime is chosen statically
    changes = spark.read.parquet(ch_p).withColumn(
        "segment", (F.col("o_custkey") % 50).cast("int")
    )

    out = analytics.incremental_agg_update(
        mv, base, changes, ["o_orderkey"], "seq", "op",
        ["segment"], "o_totalprice", "revenue", "n_orders",
    )
    p = _plan(out)
    assert re.search(r"BroadcastHashJoin .*LeftSemi", p), p
    assert not re.search(r"(SortMergeJoin|ShuffledHashJoin) .*LeftSemi", p), p
    assert p.count(base_p) == 1, "base must be scanned exactly once (probe)"
    assert p.count(mv_p) == 1
    assert p.count("Exchange hashpartitioning") == 5, p


def test_round6_entry_plan_shapes(spark):
    """Plan-shape guards for the round-6 scale claims: the KS test's
    cumulative CDFs must come from the two-phase prefix sum (range
    exchange), never a single-partition window over the data — the
    only partitionless windows allowed are over per-partition offset
    rows (bounded by the partition count); the market-basket pair
    join must be co-keyed on the basket id with the frequent-part
    filter BROADCAST, the top-N a TakeOrdered, and no cartesian
    anywhere."""
    from lambda_refarch_mapreduce_spark.plans import catalog

    p = _plan(catalog.REGISTRY["ks_test_click_vs_error"].spark(spark, SF_SMOKE))
    assert "rangepartitioning" in p, p  # the balanced CDF exchange
    assert "CartesianProduct" not in p
    # every Window in the plan must involve __pid — either partitioned
    # BY it (the per-partition local cumsums) or ordering the
    # |partitions|-row offsets frame; a data-level `sum over (order by
    # v)` regression would plan a __pid-free Window and fail here
    for ln in p.splitlines():
        if "Window [" in ln:
            assert "__pid" in ln, ln

    p = _plan(
        catalog.REGISTRY["market_basket_part_pairs"].spark(spark, SF_SMOKE)
    )
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p  # frequent-part semi-join broadcast


def test_round6b_entry_plan_shapes(spark):
    """Plan-shape guards for the round-6b SCALING.md claims:

    - ols_price_qty_discount is ONE aggregate pass: exactly one
      exchange in the whole plan, and it is the SinglePartition
      final-agg exchange (one row of moment sums) — no data-sized
      shuffle, no join, no window. The measured 0.0 MB shuffle at
      60M rows depends on exactly this shape.
    - mann_whitney_auc_value shuffles only alphabet-keyed frames: the
      corpus-sized input reaches the first (value-keyed) exchange
      through a partial aggregate (map-side combine absorbs rows —
      the measured shuffle SATURATION), and no single-partition
      window ever sees more than per-partition offset metadata.
    - gini / pareto rank machinery: the range exchange
      (rangepartitioning) is present and every window is
      __pid-partitioned (per-partition local ranks), never a global
      unpartitioned window over the data."""
    from lambda_refarch_mapreduce_spark.plans import catalog

    p = _plan(catalog.REGISTRY["ols_price_qty_discount"].spark(spark, SF_SMOKE))
    assert p.count("Exchange") == 1 and "SinglePartition" in p, p
    assert "partial_sum" in p  # map-side moment accumulation
    assert "Join" not in p and "Window" not in p

    p = _plan(
        catalog.REGISTRY["mann_whitney_auc_value"].spark(spark, SF_SMOKE)
    )
    assert "partial_sum" in p  # rows collapse before the v-keyed exchange
    # the corpus-sized input reaches exactly one hash exchange: the
    # (inlined) value-cents grouping key of the partial aggregate
    assert "hashpartitioning(_groupingexpression" in p, p
    assert "rangepartitioning(v#" in p  # prefix_sums' range exchange
    # prefix_sums windows are __pid-partitioned (local), never global
    for line in p.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__pid" in line, line

    for name in ("gini_revenue_concentration", "pareto_revenue_by_part"):
        p = _plan(catalog.REGISTRY[name].spark(spark, SF_SMOKE))
        assert "rangepartitioning" in p, name
        for line in p.splitlines():
            if "Window" in line and "windowspecdefinition" in line:
                assert "__pid" in line, (name, line)


def test_market_basket_broadcast_is_adaptive(spark):
    """The frequent-set semi-join broadcast must be ADAPTIVE (VERDICT
    r6 'next round' #6 — a forced F.broadcast overflows the broadcast
    limit at very low support on a wide catalog) and must cost no
    driver-side probe jobs (VERDICT r7 'what's wrong' #2 — the r7
    localCheckpoint+count probe paid ~0.65 s/call at sf0.1 for a plan
    AQE picks anyway). The adaptivity now lives where Spark puts it:
    AQE reads the aggregate's true post-shuffle byte size at runtime
    and converts the semi-join to a broadcast exactly when it fits
    spark.sql.adaptive.autoBroadcastJoinThreshold. Asserted in both
    regimes, with the STATIC threshold pinned off so only AQE's
    runtime decision can produce the broadcast: (a) adaptive
    threshold open -> the executed plan broadcasts the frequent set;
    (b) adaptive threshold -1 -> it stays a shuffled join; both
    return identical rows, and building either plan runs zero jobs."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        market_basket_pairs,
    )

    li = load_table(spark, SF_SMOKE, "lineitem")
    kw = dict(min_support=3, max_basket_items=20, top_n=10)
    static_old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    adapt_old = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None
    )

    def _restore():
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", static_old)
        if adapt_old is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", adapt_old
            )

    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "10m"
        )
        # plan construction is lazy: no probe, no checkpoint, no jobs
        sc = spark.sparkContext
        sc.setJobGroup("basket-plan-build", "r7 probe regression guard")
        try:
            adaptive = market_basket_pairs(
                li, "l_orderkey", "l_partkey", **kw
            )
            _ = adaptive.schema  # forces analysis, must not run jobs
            built_jobs = sc.statusTracker().getJobIdsForGroup(
                "basket-plan-build"
            )
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        assert not built_jobs, "building the basket plan ran Spark jobs"
        rows = sorted(map(tuple, adaptive.collect()))
        assert "BroadcastHashJoin" in _plan(adaptive)  # AQE converted

        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        shuffled = market_basket_pairs(li, "l_orderkey", "l_partkey", **kw)
        rows2 = sorted(map(tuple, shuffled.collect()))
        p = _plan(shuffled)
        assert "BroadcastHashJoin" not in p, p
        assert "CartesianProduct" not in p
        assert rows == rows2
        assert rows  # non-vacuous at this sf
    finally:
        _restore()


def test_round7_entry_plan_shapes(spark):
    """Plan-shape guards for the round-7 scale claims:

    - the association tier (chi2 / MI / contingency) collapses the
      corpus map-side into the cell alphabet: the corpus-sized input
      reaches its first exchange through a partial aggregate, and no
      Window appears anywhere (the float totals are agg-buffer folds,
      not running windows);
    - acf_daily_revenue indexes the day series via global_rank's
      range exchange (never a single-partition window over data: all
      Windows are __pid-scoped) and collapses orders to days through
      a partial aggregate;
    - countmin_heavy_users pre-aggregates per item before the
      depth-way explode (partial_count present) and never windows;
    - percentile_sketch_rank_gate's exact side runs on prefix_sums'
      range exchange with only __pid-scoped windows."""
    from lambda_refarch_mapreduce_spark.plans import (  # noqa: F401
        catalog,
        catalog_analytics,
    )

    for name in (
        "chi2_independence_event_dow",
        "mutual_info_event_dow",
        "contingency_event_dow",
    ):
        p = _plan(catalog.REGISTRY[name].spark(spark, SF_SMOKE))
        assert "partial_count" in p, name
        assert "Window" not in p, name

    p = _plan(catalog.REGISTRY["acf_daily_revenue"].spark(spark, SF_SMOKE))
    assert "rangepartitioning" in p
    assert "partial_sum" in p  # orders collapse to days map-side
    for ln in p.splitlines():
        if "Window [" in ln:
            assert "__pid" in ln, ln

    p = _plan(catalog.REGISTRY["countmin_heavy_users"].spark(spark, SF_SMOKE))
    assert "partial_count" in p
    assert "Window" not in p

    p = _plan(
        catalog.REGISTRY["percentile_sketch_rank_gate"].spark(spark, SF_SMOKE)
    )
    assert "rangepartitioning" in p
    for ln in p.splitlines():
        if "Window [" in ln:
            assert "__pid" in ln, ln


def test_round8_entry_plan_shapes(spark):
    """Plan-shape guards for the round-8 scale claims:

    - bloom_prefilter_orders: the probe side (orders) is filtered
      ROW-LOCALLY inside its scan stage by the literal word array
      (shiftrightunsigned against a plan literal — no join, no
      exchange) and reaches the exact join as a broadcast chosen by
      SIZE ESTIMATE, not a hint (the operator carries no broadcast
      hint, so at scale AQE may keep a shuffled join when the key
      set outgrows the broadcast budget); at smoke scale the tiny
      parquet build side pins the broadcast regime, and the ONLY
      exchange in the plan is the final per-priority aggregate."""
    p = _plan(
        catalog.REGISTRY["bloom_prefilter_orders"].spark(spark, SF_SMOKE)
    )
    assert "shiftrightunsigned" in p  # row-local literal membership test
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert p.count("Exchange hashpartitioning") == 1, p

    # log-rank / KM: subjects collapse through partial aggregates, the
    # at-risk prefix sums ride the range exchange, and every Window is
    # __pid-scoped (never a single-partition window over data)
    for name in ("log_rank_churn_by_segment", "kaplan_meier_customer_churn"):
        p = _plan(catalog.REGISTRY[name].spark(spark, SF_SMOKE))
        assert "rangepartitioning" in p, name
        assert "partial_" in p, name
        for ln in p.splitlines():
            if "Window [" in ln and "windowspecdefinition" in ln:
                assert "__pid" in ln, (name, ln)

    # CUPED: one corpus scan into a user-keyed partial aggregate, then
    # a single-row statistic — no windows anywhere
    p = _plan(catalog.REGISTRY["cuped_ab_user_value"].spark(spark, SF_SMOKE))
    assert "partial_" in p
    assert "Window" not in p

    # CCF: the day series is indexed by global_rank's range exchange
    # and the corpus collapses to days through a partial aggregate
    p = _plan(
        catalog.REGISTRY["ccf_purchase_vs_clicks"].spark(spark, SF_SMOKE)
    )
    assert "rangepartitioning" in p
    assert "partial_" in p

    # snapshot diff: one co-partitioned full-outer join, one aggregate,
    # and the membership flags never become a nested-loop shape
    p = _plan(
        catalog.REGISTRY["table_diff_cdc_snapshot"].spark(spark, SF_SMOKE)
    )
    assert "FullOuter" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_round9_entry_plan_shapes(spark):
    """Plan-shape guards for the round-9 scale claims:

    - spearman: the corpus collapses through partial aggregates and
      every rank window is __pid-scoped (prefix_sums machinery —
      never a single-partition rank over the data)
    - sprt: the day walk rides prefix_sums' range exchange
    - attribution: both journey windows are USER-partitioned
    - jobspec_interval_join: bucketed equi-plan, no nested loop"""
    from lambda_refarch_mapreduce_spark.plans import (  # noqa: F401
        catalog,
        catalog_analytics,
    )

    p = _plan(
        catalog.REGISTRY["spearman_rank_corr_lineitem"].spark(
            spark, SF_SMOKE
        )
    )
    assert "partial_" in p
    for ln in p.splitlines():
        if "Window [" in ln and "windowspecdefinition" in ln:
            assert "__pid" in ln, ln

    p = _plan(catalog.REGISTRY["sprt_ab_daily_llr"].spark(spark, SF_SMOKE))
    assert "rangepartitioning" in p
    assert "partial_" in p

    p = _plan(
        catalog.REGISTRY["attribution_position_based"].spark(
            spark, SF_SMOKE
        )
    )
    for ln in p.splitlines():
        if "windowspecdefinition" in ln:
            assert "user_id" in ln, ln

    p = _plan(
        catalog.REGISTRY["jobspec_interval_join"].spark(spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_round10_entry_plan_shapes(spark):
    """Plan-shape guards for the round-10 scale claims:

    - holt_winters: the corpus collapses through PARTIAL aggregates
      before the per-type fold (map-side combine on the (type, day)
      key), and no window touches the recursion
    - backtest: same collapse; the fold is one aggregate pass
    - isotonic: segment generation is the gap-explode EQUI-join —
      the executed plan carries no CartesianProduct and the only
      nested-loop joins are the broadcast single-row/grid crosses
    - bh_fdr: the family rank rides global_rank's range exchange;
      the two-proportion z frame collapses through partials
    - seasonal decompose (pre-staged kernel): the trend window and
      within-phase ranks are KEY/phase-partitioned, never global"""
    from pyspark.sql import functions as F

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        seasonal_decompose_additive,
    )
    from lambda_refarch_mapreduce_spark.plans import (  # noqa: F401
        catalog,
        catalog_analytics,
    )

    p = _plan(
        catalog.REGISTRY["holt_winters_daily_events"].spark(spark, SF_SMOKE)
    )
    assert "partial_" in p
    assert "windowspecdefinition" not in p

    p = _plan(
        catalog.REGISTRY["forecast_backtest_daily_revenue"].spark(
            spark, SF_SMOKE
        )
    )
    assert "partial_" in p
    assert "windowspecdefinition" not in p

    p = _plan(
        catalog.REGISTRY["isotonic_calibration_value_bins"].spark(
            spark, SF_SMOKE
        )
    )
    assert "CartesianProduct" not in p

    p = _plan(
        catalog.REGISTRY["bh_fdr_dow_purchase_rate"].spark(spark, SF_SMOKE)
    )
    assert "rangepartitioning" in p
    assert "partial_" in p
    assert "CartesianProduct" not in p

    # pre-staged kernel: windows must be partitioned (key for the
    # trend MA, key+phase machinery for ranks), never one global sort
    series = spark.range(60).select(
        (F.col("id") % 3).alias("k"),
        F.col("id").alias("t"),
        (F.col("id") * 7 % 13).alias("v"),
    )
    p = _plan(seasonal_decompose_additive(series, ["k"], "t", "v"))
    for ln in p.splitlines():
        if "windowspecdefinition" in ln:
            assert "k#" in ln, ln
