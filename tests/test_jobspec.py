"""JobSpec layer: declarative jobs, UDF seams (the reference's
"edit the mapper/reducer" surface, SURVEY.md §2.2), sinks."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from lambda_refarch_mapreduce_spark.plans.jobspec import JobSpec, run_jobspec
from tests.conftest import SF_CORRECT


def test_declarative_groupby(spark, duck):
    spec = JobSpec(
        source={"format": "parquet", "path": f"{SF_CORRECT}/orders.parquet"},
        filter="o_totalprice > 1000",
        select={"prio": "o_orderpriority", "price": "o_totalprice"},
        group_by=["prio"],
        aggs={"n": "count(1)", "total": "round(sum(price), 2)"},
        order_by=["prio"],
    )
    rows = run_jobspec(spark, spec).collect()
    expect = duck.sql(
        "SELECT o_orderpriority prio, count(*) n, round(sum(o_totalprice),2) total "
        "FROM orders WHERE o_totalprice > 1000 GROUP BY 1 ORDER BY 1"
    ).fetchall()
    assert [(r.prio, r.n, r.total) for r in rows] == expect


def test_map_udf_seam(spark):
    """mapInPandas seam = the mapper's per-batch custom logic
    (reference mapper.py:36-57 'YOUR MAPPER LOGIC')."""

    def double_value(batches):
        for pdf in batches:
            yield pd.DataFrame({"user_id": pdf.user_id, "v2": pdf.value * 2})

    spec = JobSpec(
        source={"df": __import__(
            "lambda_refarch_mapreduce_spark.sources.readers", fromlist=["load_table"]
        ).load_table(spark, SF_CORRECT, "events")},
        select={"user_id": "user_id", "value": "value"},
        map_udf=double_value,
        map_udf_schema="user_id bigint, v2 double",
        group_by=["user_id"],
        aggs={"total": "round(sum(v2), 2)"},
    )
    out = run_jobspec(spark, spec)
    base = (
        __import__(
            "lambda_refarch_mapreduce_spark.sources.readers", fromlist=["load_table"]
        )
        .load_table(spark, SF_CORRECT, "events")
        .groupBy("user_id")
        .agg(F.round(F.sum(F.col("value") * 2), 2).alias("total"))
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, base.collect()))


def test_agg_udf_seam(spark):
    """applyInPandas seam = the reducer's custom merge logic
    (reference reducer.js:46 '/// YOUR REDUCER LOGIC ////')."""

    def span(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [pdf.event_type.iloc[0]],
                "value_span": [round(float(pdf.value.max() - pdf.value.min()), 2)],
            }
        )

    from lambda_refarch_mapreduce_spark.sources.readers import load_table

    spec = JobSpec(
        source={"df": load_table(spark, SF_CORRECT, "events")},
        select={"event_type": "event_type", "value": "value"},
        group_by=["event_type"],
        agg_udf=span,
        agg_udf_schema="event_type string, value_span double",
    )
    out = {r.event_type: r.value_span for r in run_jobspec(spark, spec).collect()}
    base = {
        r.event_type: round(r.mx - r.mn, 2)
        for r in load_table(spark, SF_CORRECT, "events")
        .groupBy("event_type")
        .agg(F.max("value").alias("mx"), F.min("value").alias("mn"))
        .collect()
    }
    assert out == base


def test_sink_roundtrip(spark, tmp_path):
    """Sink writes partitioned parquet readable back with identical
    contents (reference O12 S3 PUT analog)."""
    out_dir = str(tmp_path / "out")
    spec = JobSpec(
        source={"format": "parquet", "path": f"{SF_CORRECT}/nation.parquet"},
        select={"n_nationkey": "n_nationkey", "n_name": "n_name", "n_regionkey": "n_regionkey"},
        sink={"format": "parquet", "path": out_dir, "partition_by": ["n_regionkey"]},
    )
    run_jobspec(spark, spec)
    back = spark.read.parquet(out_dir)
    assert back.count() == 25
    assert {r.n_name for r in back.collect()} == {
        r.n_name for r in spark.read.parquet(f"{SF_CORRECT}/nation.parquet").collect()
    }


def test_joins_clause_star_schema(spark, duck):
    """joins: lowers to broadcast-hinted equi-joins; the spec'd star
    join must match the SQL oracle and must plan BroadcastHashJoins
    (dims are hinted — no shuffle on the fact side before the agg)."""
    spec = JobSpec(
        source={"format": "parquet", "path": f"{SF_CORRECT}/orders.parquet"},
        joins=[
            {
                "source": {"format": "parquet", "path": f"{SF_CORRECT}/customer.parquet"},
                "on": "o_custkey = c_custkey",
                "broadcast": True,
            },
            {
                "source": {"format": "parquet", "path": f"{SF_CORRECT}/nation.parquet"},
                "on": "c_nationkey = n_nationkey",
                "broadcast": True,
            },
        ],
        group_by=["n_name"],
        aggs={"n_orders": "count(1)", "revenue": "round(sum(o_totalprice), 2)"},
        order_by=["n_name"],
    )
    df = run_jobspec(spark, spec)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    got = [(r.n_name, r.n_orders, r.revenue) for r in df.collect()]
    want = duck.sql(
        "SELECT n_name, count(*) n, round(sum(o_totalprice),2) rev "
        "FROM orders JOIN customer ON o_custkey=c_custkey "
        "JOIN nation ON c_nationkey=n_nationkey GROUP BY 1 ORDER BY 1"
    ).fetchall()
    assert got == want


def test_joins_clause_using_columns_and_how(spark):
    """List-form 'on' is a USING equi-join (key deduplicated); 'how'
    passes through (left join keeps unmatched rows)."""
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    right = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, w double")
    spec = JobSpec(
        source={"df": left},
        joins=[{"source": {"df": right}, "on": ["k"], "how": "left"}],
        order_by=["k"],
    )
    rows = run_jobspec(spark, spec).collect()
    assert [tuple(r) for r in rows] == [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)]


def test_ambiguous_aggs_and_agg_udf_raises(spark):
    """'aggs' and 'agg_udf' together must error loudly, not silently
    prefer one (the old elif dropped agg_udf)."""
    import pytest

    spec = JobSpec(
        source={"format": "parquet", "path": f"{SF_CORRECT}/orders.parquet"},
        group_by=["o_orderpriority"],
        aggs={"n": "count(1)"},
        agg_udf=lambda pdf: pdf,
        agg_udf_schema="o_orderpriority string, n bigint",
    )
    with pytest.raises(ValueError, match="ambiguous"):
        run_jobspec(spark, spec)


def test_prep_pipeline_steps(spark):
    """prep clause: quality/repetition gates drop, pii_redact rewrites
    in place, dedup_exact keeps the lowest id per distinct text."""
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox and the lazy dog are friends forever now"),
            (2, "spam spam spam spam spam spam spam spam"),  # repetition gate
            (3, "??? !!! *** 123 %%% ((( ))) +++"),  # quality gate (no alpha)
            (4, "write to alice@example.com and the others for more details"),
            (5, "write to alice@example.com and the others for more details"),
        ],
        "doc_id bigint, text string",
    )
    spec = JobSpec(
        source={"df": df},
        prep=[
            {"op": "quality_filter", "text": "text", "min_quality": 0.2},
            {"op": "repetition_filter", "text": "text", "n": 2, "max_dup_frac": 0.5},
            {"op": "pii_redact", "text": "text"},
            {"op": "dedup_exact", "id": "doc_id", "text": "text"},
        ],
    )
    rows = {r.doc_id: r.text for r in run_jobspec(spark, spec).collect()}
    assert set(rows) == {1, 4}  # 2: repetitious, 3: low quality, 5: dup of 4
    assert "<EMAIL>" in rows[4] and "alice" not in rows[4]


def test_prep_classifier_and_c4_clean(spark):
    """classifier_filter gates on sigmoid(mean token weight);
    c4_clean rewrites text in place and drops rejected docs while
    passthrough columns survive both steps."""
    df = spark.createDataFrame(
        [
            (1, "good words here.\nbad stuff", "en"),
            (2, "awful terrible dreadful junk today", "en"),
            (3, "tiny.", "de"),
        ],
        "doc_id bigint, text string, lang string",
    )
    spec = JobSpec(
        source={"df": df},
        prep=[
            {
                "op": "classifier_filter",
                "text": "text",
                "weights": {"good": 2.0, "awful": -2.0, "terrible": -2.0},
                "min_score": 0.5,
            },
            {
                "op": "c4_clean",
                "text": "text",
                "min_words_per_line": 3,
                "bad_line_words": ["bad"],
            },
        ],
    )
    rows = {r.doc_id: r for r in run_jobspec(spark, spec).collect()}
    # 2 fails the classifier (negative mean weight); 3 passes the
    # classifier (no vocab hits -> 0.5) but c4_clean leaves no line
    assert set(rows) == {1}
    assert rows[1].text == "good words here."
    assert rows[1].lang == "en"


def test_prep_unknown_op_raises(spark):
    import pytest

    spec = JobSpec(source={"df": spark.range(1)}, prep=[{"op": "nope"}])
    with pytest.raises(ValueError, match="unknown prep op"):
        run_jobspec(spark, spec)


def test_prep_domain_cap_and_dedup_spans(spark):
    """domain_cap keeps the cap lowest-id docs per domain; dedup_spans
    rewrites text with duplicated spans excised and keeps passthrough
    columns; drop_empty removes fully-excised docs."""
    span = "one two three four"
    df = spark.createDataFrame(
        [
            (1, f"intro {span} end", "a"),
            (2, f"{span} tail words here", "a"),
            (3, span, "a"),  # fully excised by dedup_spans
            (4, "fresh unique content", "b"),
            (5, "more things", "b"),
        ],
        "doc_id bigint, text string, source string",
    )
    spec = JobSpec(
        source={"df": df},
        prep=[
            {"op": "domain_cap", "domain": "source", "cap": 2},
            {"op": "dedup_spans", "k": 4, "drop_empty": True},
        ],
    )
    rows = {r.doc_id: r for r in run_jobspec(spark, spec).collect()}
    # doc 3 capped out of domain a (rank 3) before span dedup ran
    assert set(rows) == {1, 2, 4, 5}
    assert rows[1].text == f"intro {span} end"
    assert rows[2].text == "tail words here"
    assert rows[2].source == "a"
    assert rows[4].text == "fresh unique content"


def test_sessionize_clause_numbers_and_aggregates(spark):
    """sessionize replaces the row shape with per-session stats that
    downstream spec aggregates consume: a 40-min gap splits sessions
    at gap_s=1800, and ties on ts break by the order column."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    df = spark.createDataFrame(
        [
            (1, ts(0), 10),
            (1, ts(10), 11),   # same session (10 min gap)
            (1, ts(60), 12),   # 50 min gap -> new session
            (2, ts(0), 20),    # one single-event session
        ],
        "user_id bigint, ts timestamp, event_id bigint",
    )
    spec = JobSpec(
        source={"df": df},
        sessionize={"user": "user_id", "ts": "ts",
                    "order": ["ts", "event_id"], "gap_s": 1800},
        group_by=["user_id"],
        aggs={"n_sessions": "count(1)", "total_events": "sum(n_events)"},
    )
    got = {r.user_id: (r.n_sessions, r.total_events)
           for r in run_jobspec(spark, spec).collect()}
    assert got == {1: (2, 3), 2: (1, 1)}


def test_fuzzy_join_clause_filters_then_pairs(spark):
    """fuzzy_join runs AFTER the spec filter (filtered rows never pair)
    and yields exactly the Levenshtein<=k pairs."""
    df = spark.createDataFrame(
        [
            (1, "martha", 1),
            (2, "marhta", 1),   # 2 edits from martha -> excluded at k=1
            (3, "marthe", 1),   # 1 edit from martha
            (4, "martha", 0),   # filtered out before pairing
        ],
        "id bigint, name string, keep int",
    )
    spec = JobSpec(
        source={"df": df},
        filter="keep = 1",
        fuzzy_join={"id": "id", "text": "name", "k": 1},
    )
    got = {(r.id_a, r.id_b, r.dist) for r in run_jobspec(spark, spec).collect()}
    assert got == {(1, 3, 1)}


def test_cdc_apply_clause_hand_computed(spark):
    """cdc_apply replaces the base with the net-effect snapshot: the
    highest-seq change wins per key (k2's update loses to its later
    delete), inserts appear, untouched rows pass through."""
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, g string, v double",
    )
    changes = spark.createDataFrame(
        [
            (1, "a", 11.0, 1, "U"),
            (2, "b", 99.0, 1, "U"),
            (2, "b", 0.0, 2, "D"),  # later delete wins
            (4, "d", 40.0, 1, "I"),
        ],
        "k long, g string, v double, seq int, op string",
    )
    spec = JobSpec(
        source={"df": base},
        cdc_apply={"changes": {"df": changes}, "keys": ["k"]},
    )
    got = {(r.k, r.g, r.v) for r in run_jobspec(spark, spec).collect()}
    assert got == {(1, "a", 11.0), (3, "c", 30.0), (4, "d", 40.0)}


def test_mv_refresh_clause_equals_full_recompute(spark):
    """mv_refresh lands on exactly the recompute answer, with the
    grouping column derived in the spec's SQL dialect, and a group
    whose count reaches zero drops out."""
    base = spark.createDataFrame(
        [(1, 10, 10.0), (2, 10, 5.0), (3, 11, 7.0)],
        "k long, cust long, v double",
    )
    changes = spark.createDataFrame(
        [
            (1, 10, 25.0, 1, "U"),
            (3, 11, 0.0, 1, "D"),  # group cust%2==1 empties out
            (5, 12, 3.0, 1, "I"),
        ],
        "k long, cust long, v double, seq int, op string",
    )
    spec = JobSpec(
        source={"df": base},
        mv_refresh={
            "changes": {"df": changes},
            "keys": ["k"],
            "derive": {"seg": "cast(cust % 2 as int)"},
            "group_by": ["seg"],
            "value": "v",
            "sum_name": "total",
            "cnt_name": "n",
        },
    )
    got = {r.seg: (r.total, r.n) for r in run_jobspec(spark, spec).collect()}
    assert got == {0: (33.0, 3)}


def test_cdc_apply_and_mv_refresh_together_raise(spark):
    import pytest

    from lambda_refarch_mapreduce_spark.plans.jobspec import build

    base = spark.createDataFrame([(1, 1.0)], "k long, v double")
    spec = JobSpec(
        source={"df": base},
        cdc_apply={"changes": {"df": base}, "keys": ["k"]},
        mv_refresh={
            "changes": {"df": base},
            "keys": ["k"],
            "group_by": ["k"],
            "value": "v",
        },
    )
    with pytest.raises(ValueError, match="ambiguous"):
        build(spark, spec)


def test_select_supports_window_expressions(spark):
    """The spec's one-dialect promise covers analytic functions: a
    select expression may be a SQL window function (F.expr compiles
    it), so per-group ranks/running sums need no dedicated clause."""
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 5.0), (3, "b", 7.0)],
        "k long, g string, v double",
    )
    spec = JobSpec(
        source={"df": df},
        select={
            "k": "k",
            "rnk": "row_number() over (partition by g order by v desc, k)",
            "g_total": "sum(v) over (partition by g)",
        },
    )
    got = {r.k: (r.rnk, r.g_total) for r in run_jobspec(spark, spec).collect()}
    assert got == {1: (1, 15.0), 2: (2, 15.0), 3: (1, 7.0)}


def test_stats_test_clause_ks_matches_catalog_entry(spark):
    """The stats_test clause's KS path must equal the hand-built
    catalog entry on the same (click, error) pair — same kernel, so
    exact equality (only the count-frame key differs: the clause
    groups by exact cents, order-isomorphic to the entry's raw 2dp
    values)."""
    from lambda_refarch_mapreduce_spark.plans import (  # noqa: F401
        catalog_analytics,
    )
    from lambda_refarch_mapreduce_spark.plans.catalog import REGISTRY
    from lambda_refarch_mapreduce_spark.plans.jobspec import JobSpec, build
    from lambda_refarch_mapreduce_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    spec = JobSpec(
        source={"df": load_table(spark, sf, "events")},
        stats_test={
            "method": "ks",
            "group_a": "click",
            "group_b": "error",
        },
    )
    got = build(spark, spec).collect()[0]
    want = REGISTRY["ks_test_click_vs_error"].spark(spark, sf).collect()[0]
    assert (got.n_a, got.n_b) == (want.n_click, want.n_error)
    assert got.ks_d == want.ks_d and got.significant == want.significant


def test_stats_test_clause_rejects_unknown_method(spark):
    from lambda_refarch_mapreduce_spark.plans.jobspec import JobSpec, build
    from lambda_refarch_mapreduce_spark.sources.readers import load_table

    import pytest

    spec = JobSpec(
        source={"df": load_table(spark, "/root/testdata/sf0.001", "events")},
        # "anova" became a real method in round 10 — use a genuinely
        # unknown one
        stats_test={"method": "bayes_factor", "group_a": "a", "group_b": "b"},
    )
    with pytest.raises(ValueError, match="bayes_factor"):
        build(spark, spec)


def test_stats_test_clause_anova_and_chi2_match_kernels(spark):
    """The round-10 k-group stats_test modes must equal the direct
    kernel calls exactly (same kernels, declarative plumbing):
    anova over per-type value cents, chi2 over the type x $50-bin
    contingency."""
    from pyspark.sql import functions as F

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        anova_f_from_groups,
        chi2_from_contingency,
        contingency_counts,
    )
    from lambda_refarch_mapreduce_spark.plans.jobspec import JobSpec, build
    from lambda_refarch_mapreduce_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")

    got_a = build(
        spark,
        JobSpec(
            source={"df": ev},
            stats_test={
                "method": "anova",
                "group_col": "event_type",
                "value": "CAST(round(value * 100) AS BIGINT)",
            },
        ),
    ).collect()[0]
    cents = F.round(F.col("value") * 100).cast("long")
    groups = (
        ev.select(F.col("event_type").alias("g"), cents.alias("__v"))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__v").alias("s"),
            F.sum(F.col("__v").cast("decimal(38,0)") * F.col("__v")).alias(
                "q"
            ),
        )
    )
    want_a = anova_f_from_groups(groups).collect()[0]
    assert tuple(got_a) == tuple(want_a)

    got_c = build(
        spark,
        JobSpec(
            source={"df": ev},
            stats_test={
                "method": "chi2",
                "group_col": "event_type",
                "value": "value",
                "bin_width": 50,
            },
        ),
    ).collect()[0]
    cells = contingency_counts(
        ev.select(
            F.col("event_type").alias("a"),
            F.floor(F.col("value") / 50).cast("long").alias("b"),
        ),
        "a",
        "b",
    )
    want_c = chi2_from_contingency(cells).collect()[0]
    assert tuple(got_c) == tuple(want_c)


def test_stats_test_clause_welch_matches_catalog_entry(spark):
    """The stats_test clause's Welch path computes from EXACT integer
    moment sums over the cents alphabet; the hand-built catalog entry
    computes from raw-double avg/var_samp. The t statistic is
    scale-invariant, so the two must agree to float accumulation
    error (~1e-9), far inside a 1e-5 gate."""
    import math

    from lambda_refarch_mapreduce_spark.plans.catalog import REGISTRY
    from lambda_refarch_mapreduce_spark.plans.jobspec import JobSpec, build
    from lambda_refarch_mapreduce_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    spec = JobSpec(
        source={"df": load_table(spark, sf, "events")},
        stats_test={
            "method": "welch",
            "group_a": "click",
            "group_b": "error",
        },
    )
    got = build(spark, spec).collect()[0]
    want = REGISTRY["welch_t_click_vs_error"].spark(spark, sf).collect()[0]
    assert (got.n_a, got.n_b) == (want.n_click, want.n_error)
    assert math.isclose(got.mean_diff, want.mean_diff, abs_tol=1e-5)
    assert math.isclose(got.t_stat, want.t_stat, abs_tol=1e-5)
    assert got.significant == (abs(want.t_stat) > 1.96)


def test_prefilter_clause_exact_and_candidate_modes(spark):
    """The ``prefilter`` clause (VERDICT r7 #7 — the sketch tier's
    declarative surface): exact mode (default) must equal the plain
    semi-join semantics EXACTLY (the Bloom filter only prunes, never
    drops a member — no false negatives); exact=False must yield a
    superset of the exact rows (candidates keep the false positives);
    and the candidate filter must sit in the probe scan stage as a
    row-local predicate (shiftrightunsigned in the plan, no join for
    the membership test itself)."""
    from lambda_refarch_mapreduce_spark.plans.jobspec import build

    src = {"format": "parquet", "path": f"{SF_CORRECT}/orders.parquet"}
    keys = {"format": "parquet", "path": f"{SF_CORRECT}/customer.parquet"}
    pf = {
        "keys": keys,
        "filter": "c_acctbal > 9000",
        "key": "c_custkey",
        "probe": "o_custkey",
        "n_bits": 1 << 12,
        "k": 2,
    }
    exact = build(
        spark, JobSpec(source=src, prefilter=pf, select={"k": "o_orderkey"})
    )
    cand = build(
        spark,
        JobSpec(
            source=src,
            prefilter={**pf, "exact": False},
            select={"k": "o_orderkey"},
        ),
    )
    want = {
        r.o_orderkey
        for r in spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF_CORRECT}/customer.parquet")
            .filter("c_acctbal > 9000")
            .select(F.col("c_custkey").alias("k")),
            F.col("o_custkey") == F.col("k"),
            "left_semi",
        )
        .select("o_orderkey")
        .collect()
    }
    got_exact = {r.k for r in exact.collect()}
    got_cand = {r.k for r in cand.collect()}
    assert got_exact == want
    assert want <= got_cand  # no false negatives, FPs allowed
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "shiftrightunsigned" in plan
    assert "Join" not in plan  # candidate mode: zero joins


def test_interval_join_clause_equals_bruteforce(spark):
    """The interval_join clause lowers onto
    operators.relational.interval_overlap_join: against a hand-built
    pair of interval tables, the declarative path returns exactly the
    brute-force theta-join pair set (incl. the l_select/r_select
    reshaping and the post-join filter), and the plan carries no
    CartesianProduct."""
    import os
    import tempfile

    from lambda_refarch_mapreduce_spark.plans.jobspec import build

    la = [(1, "g", 0, 10), (2, "g", 8, 12), (3, "g", 30, 35), (4, "h", 0, 5)]
    rb = [(7, "g", 9, 20), (8, "g", 11, 13), (9, "h", 6, 9), (10, "h", 5, 5)]
    with tempfile.TemporaryDirectory() as tmp:
        lpath = os.path.join(tmp, "l.parquet")
        rpath = os.path.join(tmp, "r.parquet")
        spark.createDataFrame(
            la, "id long, g string, s long, e long"
        ).write.parquet(lpath)
        spark.createDataFrame(
            rb, "id long, g string, s long, e long"
        ).write.parquet(rpath)
        spec = JobSpec(
            source={"format": "parquet", "path": lpath},
            interval_join={
                "source": {"format": "parquet", "path": rpath},
                "on": ["g"],
                "l_select": {
                    "g": "g", "ka": "id", "sa": "s", "ea": "e",
                },
                "r_select": {
                    "g": "g", "kb": "id", "sb": "s", "eb": "e",
                },
                "l_start": "sa", "l_end": "ea",
                "r_start": "sb", "r_end": "eb",
                "bucket_width": 8,
                "filter": "ka <> kb",
            },
            select={"ka": "ka", "kb": "kb"},
        )
        out = build(spark, spec)
        got = sorted((r.ka, r.kb) for r in out.collect())
        want = sorted(
            (a[0], b[0])
            for a in la
            for b in rb
            if a[1] == b[1] and a[2] <= b[3] and b[2] <= a[3]
        )
        assert got == want
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan


def test_stats_test_clause_anderson_darling_matches_kernel(spark):
    """The round-10 'anderson_darling' stats_test mode equals the
    direct kernel call on the same group pair exactly."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        anderson_darling_from_value_counts,
        group_value_counts,
    )
    from lambda_refarch_mapreduce_spark.plans.jobspec import JobSpec, build
    from lambda_refarch_mapreduce_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    got = build(
        spark,
        JobSpec(
            source={"df": ev},
            stats_test={
                "method": "anderson_darling",
                "group_col": "event_type",
                "group_a": "purchase",
                "group_b": "click",
            },
        ),
    ).collect()[0]
    want = anderson_darling_from_value_counts(
        group_value_counts(ev, "purchase", "click")
    ).collect()[0]
    assert tuple(got) == tuple(want)
    assert got.n_a > 0 and got.n_b > 0


def test_stats_test_clause_qq_matches_kernel(spark):
    """The round-11 'qq' stats_test mode equals the direct kernel
    call on the same group pair exactly, row for row."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        group_value_counts,
        qq_from_value_counts,
    )
    from lambda_refarch_mapreduce_spark.plans.jobspec import JobSpec, build
    from lambda_refarch_mapreduce_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    got = build(
        spark,
        JobSpec(
            source={"df": ev},
            stats_test={
                "method": "qq",
                "group_col": "event_type",
                "group_a": "purchase",
                "group_b": "click",
                "n_grid": 10,
            },
        ),
    ).collect()
    want = qq_from_value_counts(
        group_value_counts(ev, "purchase", "click"), 10
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) == 9  # interior deciles


def test_stats_test_clause_kruskal_matches_kernel(spark):
    """The round-11 'kruskal' stats_test mode equals the direct
    kernel call on the same grouping exactly."""
    from pyspark.sql import functions as F
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        kruskal_wallis_from_counts,
    )
    from lambda_refarch_mapreduce_spark.plans.jobspec import JobSpec, build
    from lambda_refarch_mapreduce_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    got = build(
        spark,
        JobSpec(
            source={"df": ev},
            stats_test={
                "method": "kruskal",
                "group_col": "event_type",
                "value": "CAST(round(value * 100) AS BIGINT)",
            },
        ),
    ).collect()[0]
    counts = (
        ev.select(
            F.col("event_type").alias("g"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
        )
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    want = kruskal_wallis_from_counts(counts).collect()[0]
    assert tuple(got) == tuple(want)
    assert got.k_groups == 5 and got.n_total > 0


def test_stats_test_clause_brown_forsythe_and_ca_match_kernels(spark):
    """The round-11 'brown_forsythe' and 'cochran_armitage' stats_test
    modes equal the direct kernel calls exactly (pre-staged for the
    r12 oracle entries, the anderson_darling round-10 pattern)."""
    from pyspark.sql import functions as F
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        brown_forsythe_from_counts,
        cochran_armitage_trend,
    )
    from lambda_refarch_mapreduce_spark.plans.jobspec import JobSpec, build
    from lambda_refarch_mapreduce_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")

    got_bf = build(
        spark,
        JobSpec(
            source={"df": ev},
            stats_test={
                "method": "brown_forsythe",
                "group_col": "event_type",
                "value": "CAST(round(value * 100) AS BIGINT)",
            },
        ),
    ).collect()[0]
    counts = (
        ev.select(
            F.col("event_type").alias("g"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
        )
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    want_bf = brown_forsythe_from_counts(counts).collect()[0]
    assert tuple(got_bf) == tuple(want_bf)
    assert got_bf.k_groups == 5

    got_ca = build(
        spark,
        JobSpec(
            source={"df": ev},
            stats_test={
                "method": "cochran_armitage",
                "score": "datediff(to_date(ts), DATE '1970-01-01')"
                " div 7",
                "success": "event_type = 'purchase'",
            },
        ),
    ).collect()[0]
    grp = (
        ev.select(
            F.expr(
                "datediff(to_date(ts), DATE '1970-01-01') div 7"
            )
            .cast("long")
            .alias("s"),
            F.expr("event_type = 'purchase'").cast("long").alias("p"),
        )
        .groupBy("s")
        .agg(F.sum("p").alias("x"), F.count(F.lit(1)).alias("n"))
    )
    want_ca = cochran_armitage_trend(grp).collect()[0]
    assert tuple(got_ca) == tuple(want_ca)
    assert got_ca.n_total > 0


def test_stats_test_clause_round11b_modes_match_kernels(spark):
    """The round-11 second-wave stats_test modes (cliffs_delta,
    jonckheere, mood_median, friedman, page, cochran_q, mcnemar,
    wilcoxon_signed_rank, cohens_kappa, runs, ljung_box) each equal the direct kernel call on the same frame
    exactly (pre-staged for the r12 oracle entries, the
    anderson_darling round-10 pattern)."""
    from pyspark.sql import functions as F

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cliffs_delta_from_value_counts,
        cohens_kappa_from_pairs,
        friedman_from_blocks,
        group_value_counts,
        jonckheere_terpstra_from_counts,
        ljung_box_from_series,
        mcnemar_from_pairs,
        page_l_from_blocks,
        runs_test_from_series,
    )
    from lambda_refarch_mapreduce_spark.plans.jobspec import JobSpec, build
    from lambda_refarch_mapreduce_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")

    def run(spec):
        return build(
            spark, JobSpec(source={"df": ev}, stats_test=spec)
        ).collect()

    # cliffs_delta — the two-group count frame shape
    got = run(
        {
            "method": "cliffs_delta",
            "group_a": "purchase",
            "group_b": "click",
        }
    )[0]
    counts = group_value_counts(ev, "purchase", "click")
    want = cliffs_delta_from_value_counts(
        counts, ca="ca", cb="cb"
    ).collect()[0]
    assert tuple(got) == tuple(want) and got.delta is not None

    # kuiper / cvm — the CDF-family completions on the same shape
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cvm_from_value_counts,
        kuiper_from_value_counts,
    )

    got_kp = run(
        {"method": "kuiper", "group_a": "purchase", "group_b": "click"}
    )[0]
    want_kp = kuiper_from_value_counts(
        counts, ca="ca", cb="cb"
    ).collect()[0]
    assert tuple(got_kp) == tuple(want_kp) and got_kp.kuiper_v is not None
    got_cm = run(
        {"method": "cvm", "group_a": "purchase", "group_b": "click"}
    )[0]
    want_cm = cvm_from_value_counts(counts, ca="ca", cb="cb").collect()[0]
    assert tuple(got_cm) == tuple(want_cm) and got_cm.cvm_t is not None

    # jonckheere — the kruskal spec shape, ordered by group_col
    week = "datediff(to_date(ts), DATE '1970-01-01') div 7"
    cents = "CAST(round(value * 100) AS BIGINT)"
    got = run(
        {"method": "jonckheere", "group_col": week, "value": cents}
    )[0]
    jt_counts = (
        ev.select(F.expr(week).alias("g"), F.expr(cents).alias("v"))
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    want = jonckheere_terpstra_from_counts(jt_counts).collect()[0]
    assert tuple(got) == tuple(want) and got.z_jt is not None

    # mood_median — the one-bit member on the same shape
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        mood_median_from_counts,
    )

    got = run(
        {
            "method": "mood_median",
            "group_col": "event_type",
            "value": cents,
        }
    )[0]
    md_counts = (
        ev.select(
            F.col("event_type").alias("g"), F.expr(cents).alias("v")
        )
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    want = mood_median_from_counts(md_counts).collect()[0]
    assert tuple(got) == tuple(want) and got.chi2 is not None

    # friedman / page — block x treatment cells
    day = "datediff(to_date(ts), DATE '1970-01-01')"
    cells = (
        ev.groupBy(
            F.expr(day).alias("b"), F.col("event_type").alias("t")
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cochran_q_from_blocks,
    )

    for method, kern in (
        ("friedman", friedman_from_blocks),
        ("page", page_l_from_blocks),
        ("cochran_q", cochran_q_from_blocks),
    ):
        got = build(
            spark,
            JobSpec(
                source={"df": cells},
                stats_test={
                    "method": method,
                    "block": "b",
                    "treatment": "t",
                    "value": "x",
                },
            ),
        ).collect()[0]
        want = kern(cells, "b", "t", "x").collect()[0]
        assert tuple(got) == tuple(want), method

    # mcnemar — per-(user, day) paired flags shaped upstream
    subj = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.max((F.col("event_type") == "click").cast("int")).alias("ca"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias(
            "cp"
        ),
    )
    got = build(
        spark,
        JobSpec(
            source={"df": subj},
            stats_test={
                "method": "mcnemar",
                "flag_a": "ca = 1",
                "flag_b": "cp = 1",
            },
        ),
    ).collect()[0]
    want = mcnemar_from_pairs(
        subj.select(
            F.expr("ca = 1").alias("a"), F.expr("cp = 1").alias("b")
        )
    ).collect()[0]
    assert tuple(got) == tuple(want) and got.n_pairs > 0

    # wilcoxon_signed_rank — the numeric sibling on a per-user
    # half-window value frame
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        wilcoxon_signed_rank_from_pairs,
    )

    halves = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.dayofmonth("ts") >= 16,
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("h2"),
        F.sum(
            F.when(
                F.dayofmonth("ts") < 16,
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("h1"),
    )
    got = build(
        spark,
        JobSpec(
            source={"df": halves},
            stats_test={
                "method": "wilcoxon_signed_rank",
                "val_a": "h2",
                "val_b": "h1",
            },
        ),
    ).collect()[0]
    want = wilcoxon_signed_rank_from_pairs(
        halves.select(F.col("h2").alias("a"), F.col("h1").alias("b"))
    ).collect()[0]
    assert tuple(got) == tuple(want) and got.n_nonzero > 0

    # cohens_kappa — two derived raters on documents
    docs = load_table(spark, sf, "documents")
    ra = "CASE WHEN n_chars < 300 THEN 'short' ELSE 'long' END"
    rb = (
        "CASE WHEN size(split(text, ' ')) < 55 THEN 'short'"
        " ELSE 'long' END"
    )
    got = build(
        spark,
        JobSpec(
            source={"df": docs},
            stats_test={
                "method": "cohens_kappa",
                "rater_a": ra,
                "rater_b": rb,
            },
        ),
    ).collect()[0]
    want = cohens_kappa_from_pairs(
        docs.select(F.expr(ra).alias("a"), F.expr(rb).alias("b"))
    ).collect()[0]
    assert tuple(got) == tuple(want) and got.kappa is not None

    # runs / ljung_box — the daily event-volume series
    daily = ev.groupBy(F.expr(day).alias("d")).agg(
        F.count(F.lit(1)).alias("m")
    )
    got = build(
        spark,
        JobSpec(
            source={"df": daily},
            stats_test={"method": "runs", "key": "d", "value": "m"},
        ),
    ).collect()[0]
    want = runs_test_from_series(daily, "d", "m").collect()[0]
    assert tuple(got) == tuple(want)

    got = build(
        spark,
        JobSpec(
            source={"df": daily},
            stats_test={
                "method": "ljung_box",
                "key": "d",
                "value": "m",
                "max_lag": 5,
            },
        ),
    ).collect()[0]
    want = ljung_box_from_series(daily, "d", "m", 5).collect()[0]
    assert tuple(got) == tuple(want) and got.n_lags == 5

    # g_test — the chi2 mode's log-likelihood-ratio twin on the same
    # binned cells
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        contingency_counts,
        g_test_from_contingency,
    )

    got = build(
        spark,
        JobSpec(
            source={"df": ev},
            stats_test={"method": "g_test", "bin_width": 100},
        ),
    ).collect()[0]
    want = g_test_from_contingency(
        contingency_counts(
            ev.select(
                F.col("event_type").alias("a"),
                F.expr(
                    "CAST(floor((value) / 100) AS BIGINT)"
                ).alias("b"),
            ),
            "a",
            "b",
        )
    ).collect()[0]
    assert tuple(got) == tuple(want) and got.g_stat is not None
