"""Unit tests for the analytics tier: graph algorithms, record linkage,
skyline, Markov transitions, MERGE upsert, validation, salted join.

Each test pins the operator's semantics on a small hand-computable
graph/table — the catalog-level oracle comparison (test_catalog_oracle)
covers the corpus-scale behavior."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from lambda_refarch_mapreduce_spark.operators import analytics, graph, linkage


def test_pagerank_star_graph(spark):
    # star: a->b, a->c, a->d; b,c,d dangling
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d")], "src string, dst string"
    )
    ranks = {r.node: r.rank for r in graph.pagerank(edges, n_iter=1).collect()}
    # after 1 round from uniform 1/4: teleport 0.15/4; a gets only the
    # dangling mass 3/4 / 4 damped; b/c/d each get a's (1/4)/3 + dangling
    n, d = 4, 0.85
    dm = 3 / 4 / n
    exp_a = (1 - d) / n + d * dm
    exp_b = (1 - d) / n + d * ((1 / 4) / 3 + dm)
    assert math.isclose(ranks["a"], exp_a, rel_tol=1e-12)
    for node in "bcd":
        assert math.isclose(ranks[node], exp_b, rel_tol=1e-12)
    assert math.isclose(sum(ranks.values()), 1.0, rel_tol=1e-9)


def test_pagerank_mass_conserved_multi_iter(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
        "src string, dst string",
    )
    total = (
        graph.pagerank(edges, n_iter=3)
        .agg(F.sum("rank").alias("s"))
        .first()
        .s
    )
    assert math.isclose(total, 1.0, rel_tol=1e-9)


def test_graph_reliable_checkpoint(spark, tmp_path):
    """reliable_checkpoint=True routes the per-round lineage cuts of
    pagerank and the edge materialization of triangle_stats through
    checkpoint() into the configured reliable store (the cluster
    profile where executor loss must not drop the only copy) — same
    contract as dedup.connected_components(reliable_checkpoint=...).
    Results must be identical to the localCheckpoint default."""
    import os

    ckpt_dir = str(tmp_path / "graph_ckpt")
    spark.sparkContext.setCheckpointDir(ckpt_dir)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
        "src string, dst string",
    )
    base = {
        r.node: r.rank for r in graph.pagerank(edges, n_iter=2).collect()
    }
    rel = {
        r.node: r.rank
        for r in graph.pagerank(
            edges, n_iter=2, reliable_checkpoint=True
        ).collect()
    }
    assert base == rel
    tri = graph.triangle_stats(edges, reliable_checkpoint=True).first()
    assert tri.n_triangles == 1
    # the reliable store was actually written (RDD checkpoint files)
    assert any(os.scandir(ckpt_dir))


def test_triangle_stats_known_graph(spark):
    # K4 minus one edge: triangles {a,b,c} and {a,b,d}; 5 edges
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
         ("c", "a")],  # duplicate direction of (a,c) — must dedupe
        "src string, dst string",
    )
    row = graph.triangle_stats(edges).first()
    assert row.n_edges == 5
    assert row.n_triangles == 2
    # degrees: a=3, b=3, c=2, d=2 -> wedges 3+3+1+1 = 8
    assert row.n_wedges == 8
    assert math.isclose(row.global_clustering, 6 / 8, rel_tol=1e-9)


def test_fuzzy_self_join_insert_shift(spark):
    # distance-1 pairs across insertion (position shift), substitution,
    # and a non-match; verifies the probe covers shifted segments
    df = spark.createDataFrame(
        [
            (1, "abcdef"),
            (2, "abXdef"),   # substitution, dist 1
            (3, "abcdefg"),  # suffix insert, dist 1
            (4, "Xabcdef"),  # prefix insert (shifts all), dist 1
            (5, "zzzzzz"),   # far away
        ],
        "id int, s string",
    )
    pairs = {
        (r.id_a, r.id_b): r.dist
        for r in linkage.fuzzy_self_join(df, "id", "s", k=1).collect()
    }
    assert pairs[(1, 2)] == 1
    assert pairs[(1, 3)] == 1
    assert pairs[(1, 4)] == 1
    assert (2, 3) not in pairs  # dist 2
    assert all(p[0] != 5 and p[1] != 5 for p in pairs)


def test_fuzzy_self_join_blocking(spark):
    df = spark.createDataFrame(
        [(1, "abcd", "x"), (2, "abce", "x"), (3, "abcf", "y")],
        "id int, s string, blk string",
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in linkage.fuzzy_self_join(
            df, "id", "s", k=1, block_col="blk"
        ).collect()
    }
    assert pairs == {(1, 2)}  # 3 is distance 1 from both but other block


def test_skyline_2d_with_ties(spark):
    df = spark.createDataFrame(
        [(5, 1), (5, 3), (4, 3), (3, 4), (3, 4), (2, 2), (1, 5)],
        "x int, y int",
    )
    pts = {
        (r.x, r.y) for r in analytics.skyline_2d(df, "x", "y").collect()
    }
    # (4,3) dominated by (5,3); (2,2) dominated by (3,4); duplicates of
    # (3,4) survive as one point
    assert pts == {(5, 3), (3, 4), (1, 5)}


def test_markov_transitions_probabilities(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "a", 10), (1, 2, "b", 11), (1, 3, "a", 12),
            (2, 1, "a", 20), (2, 2, "b", 21), (2, 3, "b", 22),
        ],
        "u int, t int, s string, id int",
    )
    rows = {
        (r.from_state, r.to_state): (r.n, r.p)
        for r in analytics.markov_transitions(df, "u", "s", "t", "id").collect()
    }
    assert rows[("a", "b")] == (2, 1.0)
    assert rows[("b", "a")] == (1, 0.5)
    assert rows[("b", "b")] == (1, 0.5)


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, "old"), (2, "old"), (3, "old")], "k int, v string"
    )
    updates = spark.createDataFrame(
        [(2, "new"), (9, "ins")], "k int, v string"
    )
    out = {
        r.k: r.v
        for r in analytics.merge_upsert(base, updates, ["k"]).collect()
    }
    assert out == {1: "old", 2: "new", 3: "old", 9: "ins"}


def test_validate_single_scan_counts(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0), (4, 200.0)], "id int, v double"
    )
    report = {
        r.rule: (r.n_violations, r.n_rows, r.violation_rate)
        for r in analytics.validate(
            df,
            {
                "null_v": F.col("v").isNull(),
                "negative_v": F.col("v") < 0,
                "huge_v": F.col("v") > 100,
            },
        ).collect()
    }
    assert report["null_v"] == (1, 4, 0.25)
    assert report["negative_v"] == (1, 4, 0.25)
    assert report["huge_v"] == (1, 4, 0.25)


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(i % 3, f"l{i}") for i in range(30)], "k int, lv string"
    )
    right = spark.createDataFrame(
        [(0, "r0"), (1, "r1"), (2, "r2"), (7, "r7")], "k int, rv string"
    )
    salted = analytics.salted_join(left, right, "k", n_salts=4)
    plain = left.join(right, "k")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # plan: join key carries the salt column
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan


# ---------------------------------------------------------------------------
# Property tests: the Ed-Join prefix filter must be LOSSLESS (exactly
# the brute-force Levenshtein pairs) and the distributed skyline must
# equal brute-force dominance — on arbitrary inputs, not just the
# uniform fixed-length names of the sf tables.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_PROP_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


@given(
    strs=st.lists(
        st.text(alphabet="abAB ", min_size=0, max_size=10),
        min_size=2,
        max_size=8,
    ),
    k=st.integers(min_value=1, max_value=2),
)
@settings(**_PROP_SETTINGS)
def test_fuzzy_self_join_equals_bruteforce(spark, strs, k):
    """BOTH candidate strategies must be lossless — exactly the
    brute-force Levenshtein pairs — on arbitrary inputs."""
    rows = list(enumerate(strs))
    df = spark.createDataFrame(rows, "id int, s string")
    want = set()
    for i, a in rows:
        for j, b in rows:
            if i < j:
                d = _py_levenshtein(a, b)
                if d <= k:
                    want.add((i, j, d))
    for strategy in ("deletion", "edjoin"):
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in linkage.fuzzy_self_join(
                df, "id", "s", k=k, strategy=strategy
            ).collect()
        }
        assert got == want, f"strategy={strategy}"


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**_PROP_SETTINGS)
def test_skyline_2d_equals_bruteforce(spark, pts):
    df = spark.createDataFrame(pts, "x int, y int")
    got = {(r.x, r.y) for r in analytics.skyline_2d(df, "x", "y").collect()}
    uniq = set(pts)
    want = {
        p
        for p in uniq
        if not any(
            q[0] >= p[0] and q[1] >= p[1] and q != p for q in uniq
        )
    }
    assert got == want


def _py_pagerank(edges, n_iter=3, d=0.85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    out = {}
    for a, b in edges:
        out.setdefault(a, set()).add(b)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        dm = sum(r[v] for v in nodes if v not in out)
        nxt = {}
        for v in nodes:
            contrib = sum(
                r[u] / len(out[u]) for u in nodes if v in out.get(u, ())
            )
            nxt[v] = (1 - d) / n + d * (contrib + dm / n)
        r = nxt
    return r


@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=15,
    )
)
@settings(**_PROP_SETTINGS)
def test_pagerank_equals_reference(spark, edges):
    df = spark.createDataFrame(sorted(edges), "src int, dst int")
    got = {r.node: r.rank for r in graph.pagerank(df, n_iter=3).collect()}
    want = _py_pagerank(sorted(edges))
    assert set(got) == set(want)
    for v in want:
        assert math.isclose(got[v], want[v], rel_tol=1e-9), (v, got[v], want[v])


@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=7),
        ),
        min_size=1,
        max_size=16,
    )
)
@settings(**_PROP_SETTINGS)
def test_triangle_stats_equals_bruteforce(spark, edges):
    df = spark.createDataFrame(sorted(edges), "src int, dst int")
    row = graph.triangle_stats(df).first()
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {v for e in und for v in e}
    tri = sum(
        1
        for a in nodes
        for b in nodes
        for c in nodes
        if a < b < c
        and (a, b) in und
        and (b, c) in und
        and (a, c) in und
    )
    deg = {v: sum(1 for e in und if v in e) for v in nodes}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    assert row.n_edges == len(und)
    assert row.n_triangles == tri
    assert row.n_wedges == wedges


def test_sessionize_matches_builtin_session_window(spark):
    """Cross-validation of the gap-sessionization semantics: the
    lag+running-sum batch formulation (catalog sessionize_events) must
    produce the same per-user session event-counts as Spark's built-in
    session_window(gap) — two independent implementations of the same
    30-minute-gap semantics."""
    from lambda_refarch_mapreduce_spark import load_table
    from lambda_refarch_mapreduce_spark.plans.catalog_analytics import (
        sessionize_events,
    )

    sf = "/root/testdata/sf0.001"
    ours = sessionize_events(spark, sf)
    got = sorted(
        (r.user_id, r.n_events) for r in ours.collect()
    )
    ev = load_table(spark, sf, "events")
    builtin = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
    )
    want = sorted((r.user_id, r["count"]) for r in builtin.collect())
    assert got == want


def test_tpch_star_shapes_broadcast_dimensions(spark):
    """The round-4 TPC-H shapes must broadcast their dimension tables
    (the fact side shuffles at most once): q8's six-table join and
    q9's part-pruned profit rollup both show BroadcastHashJoin and no
    CartesianProduct."""
    from lambda_refarch_mapreduce_spark.plans.catalog_analytics import (
        q8_market_share,
        q9_profit_by_nation_year,
    )

    for fn in (q8_market_share, q9_profit_by_nation_year):
        df = fn(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__


def test_chunk_overlap_boundaries(spark, tmp_path):
    """Hand-computed chunk grids for the sliding-window chunker
    (64-token chunks / 48-token stride): exact-multiple, one-over,
    shorter-than-chunk, and the contained-tail case where the last
    start would add < 16 new tokens and must be dropped."""
    from lambda_refarch_mapreduce_spark.plans.catalog_llm import (
        chunk_documents_overlap,
    )

    docs = [
        (1, " ".join(f"t{i}" for i in range(64))),    # exactly one chunk
        (2, " ".join(f"t{i}" for i in range(65))),    # 49..65 adds 17 new
        (3, " ".join(f"t{i}" for i in range(10))),    # short: one partial
        (4, " ".join(f"t{i}" for i in range(100))),   # start 97 contained
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        src + "/documents.parquet"
    )
    out = {
        (r.doc_id, r.chunk_id): r.n_tokens_chunk
        for r in chunk_documents_overlap(spark, src).collect()
    }
    assert out == {
        (1, 0): 64,
        (2, 0): 64,
        (2, 1): 17,   # start 49, tokens 49..65
        (3, 0): 10,
        (4, 0): 64,
        (4, 1): 52,   # start 49, tokens 49..100; start 97 dropped
    }


def test_label_propagation_two_cliques_bridge(spark):
    """Hand-computed 3-round synchronous LPA on two triangles joined by
    one bridge edge (c-x): with neighbor-majority + smallest-label
    tie-breaks the left clique converges to community 'a' and the
    right to 'c' — the bridge must not merge them."""
    edges = spark.createDataFrame(
        [
            ("a", "b"), ("a", "c"), ("b", "c"),
            ("x", "y"), ("x", "z"), ("y", "z"),
            ("c", "x"),
        ],
        "src string, dst string",
    )
    got = {
        r.node: r.community
        for r in graph.label_propagation(edges, n_iter=3).collect()
    }
    assert got == {
        "a": "a", "b": "a", "c": "a",
        "x": "c", "y": "c", "z": "c",
    }


def test_sql_scripting_block(spark):
    """Spark 4 SQL scripting (BEGIN ... END with DECLARE/SET control
    flow): a script that derives a threshold and applies it must equal
    the two-step computation — the procedural SQL surface works."""
    spark.conf.set("spark.sql.scripting.enabled", "true")
    df = spark.createDataFrame(
        [(i, float(i * 10)) for i in range(1, 11)], "id int, v double"
    )
    df.createOrReplaceTempView("__scripting_t")
    rows = spark.sql(
        """
        BEGIN
          DECLARE thr DOUBLE DEFAULT 0.0;
          SET thr = (SELECT avg(v) FROM __scripting_t);
          SELECT id, v FROM __scripting_t WHERE v > thr ORDER BY id;
        END
        """
    ).collect()
    assert [r.id for r in rows] == [6, 7, 8, 9, 10]


def test_sql_table_function(spark):
    """SQL-defined table function (CREATE FUNCTION ... RETURNS TABLE):
    the declarative UDTF tier — exploding through it equals the
    direct explode."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION words(s STRING) "
        "RETURNS TABLE(w STRING) RETURN SELECT explode(split(s, ' '))"
    )
    rows = spark.sql(
        "SELECT w FROM words('alpha beta gamma') ORDER BY w"
    ).collect()
    assert [r.w for r in rows] == ["alpha", "beta", "gamma"]


def test_funnel_strict_order_semantics(spark):
    """Hand-built funnel: user 1 converts fully in order; user 2 clicks
    BEFORE viewing (no credit); user 3 views only. Strictly-after rule:
    a click at the same instant as the view must not count."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    s = lambda k: t0 + dt.timedelta(seconds=k)  # noqa: E731
    rows = [
        (1, "view", s(0)), (1, "click", s(1)), (1, "purchase", s(2)),
        (2, "click", s(0)), (2, "view", s(1)), (2, "purchase", s(2)),
        (3, "view", s(0)), (3, "click", s(0)),  # same instant: no credit
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        r.stage: (r.users, r.conv_from_prev, r.conv_from_top)
        for r in analytics.funnel(df, ["view", "click", "purchase"]).collect()
    }
    # user 2's purchase IS after their view->?click: view at s(1), but the
    # click at s(0) precedes the view, so stage 2 is never reached.
    assert got["1_view"] == (3, 1.0, 1.0)
    assert got["2_click"] == (1, round(1 / 3, 6), round(1 / 3, 6))
    assert got["3_purchase"] == (1, 1.0, round(1 / 3, 6))


def test_funnel_ten_plus_stages_numeric_order(spark):
    """Regression (ADVICE r5 medium): the rate window used to order by
    the string stage label, and "10_x" < "2_x" lexicographically —
    with 10+ stages lag/first picked the wrong neighbor. One user
    walks all 11 stages in order, a second drops out after stage 1:
    every conv_from_prev from stage 2 on must be 1.0 for the walker
    (0.5 at stage 2), and conv_from_top must be monotone non-
    increasing — the string order made stage "10_" take "1_" as its
    predecessor and "11_" slot between "1_" and "2_"."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    stages = [f"s{chr(ord('a') + i)}" for i in range(11)]
    rows = [(1, s, t0 + dt.timedelta(seconds=i)) for i, s in enumerate(stages)]
    rows.append((2, stages[0], t0))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    out = analytics.funnel(df, stages).collect()
    got = {r.stage: (r.users, r.conv_from_prev, r.conv_from_top) for r in out}
    assert got[f"1_{stages[0]}"] == (2, 1.0, 1.0)
    assert got[f"2_{stages[1]}"] == (1, 0.5, 0.5)
    for i in range(3, 12):
        assert got[f"{i}_{stages[i - 1]}"] == (1, 1.0, 0.5), i


def test_cohort_retention_month_offsets_are_calendar_exact(spark):
    """Regression (ADVICE r5): period="month" used datediff/30, so 13
    calendar months (e.g. Jan 2024 -> Feb 2025 = 396 days) landed in
    offset 13 only by luck and long spans drifted (two months merging
    into one offset). months_between on the truncated firsts-of-month
    is exact: 2024-01 -> 2025-02 must be offset 13, and 2024-01 ->
    2026-01 exactly 24."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 15)),
        (1, dt.datetime(2025, 2, 3)),   # 13 calendar months
        (1, dt.datetime(2026, 1, 28)),  # 24 calendar months (731 days!)
        (2, dt.datetime(2024, 1, 2)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r.cohort_period), r.period_offset): r.active_users
        for r in analytics.cohort_retention(df, period="month").collect()
    }
    # datediff/30 would put 731 days at offset 24 only by accident of
    # rounding (731/30 = 24.37 -> 24 here, but 2024-01->2025-12 =
    # 700 days -> 23.3 -> 23 == 2025-11's offset, a merge).
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 13): 1,
        ("2024-01-01", 24): 1,
    }
    # the documented merge case: Nov and Dec 2025 are distinct offsets
    rows2 = [
        (1, dt.datetime(2024, 1, 15)),
        (1, dt.datetime(2025, 11, 20)),
        (1, dt.datetime(2025, 12, 20)),
    ]
    df2 = spark.createDataFrame(rows2, "user_id long, ts timestamp")
    offs = sorted(
        r.period_offset
        for r in analytics.cohort_retention(df2, period="month").collect()
    )
    assert offs == [0, 22, 23]


def test_last_touch_attribution_direct_and_channel(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    s = lambda k: t0 + dt.timedelta(seconds=k)  # noqa: E731
    rows = [
        # user 1: ad-click then purchase -> credited to click
        (1, 1, "click", s(0), 0.0), (1, 2, "purchase", s(1), 10.0),
        # user 2: purchase with no prior event -> (direct)
        (2, 3, "purchase", s(0), 5.0),
        # user 2: second purchase; the preceding PURCHASE must not be
        # credited (non-conversion touches only) -> still (direct)
        (2, 4, "purchase", s(1), 7.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp, value double"
    )
    got = {
        r.channel: (r.conversions, r.total_value)
        for r in analytics.last_touch_attribution(df).collect()
    }
    assert got == {"click": (1, 10.0), "(direct)": (2, 12.0)}


def test_cohort_retention_offsets(spark):
    """Two cohorts: users 1,2 start week 0 (user 2 returns in week 1),
    user 3 starts week 1. Offset-0 retention is 1.0 by construction."""
    import datetime as dt

    # 2024-01-01 is a Monday (week-truncation boundary)
    d = lambda day, u: (u, dt.datetime(2024, 1, day, 12, 0))  # noqa: E731
    rows = [d(1, 1), d(3, 2), d(10, 2), d(9, 3), d(11, 3)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r.cohort_period), r.period_offset): (r.active_users, r.retention)
        for r in analytics.cohort_retention(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 1.0),
        ("2024-01-01", 1): (1, 0.5),
        ("2024-01-08", 0): (1, 1.0),
    }


def test_incremental_agg_update_hand_computed(spark):
    """Delta maintenance on a 4-row base: update k1 (10->25), delete
    k2, insert k5 into a NEW group, update-then-delete k4 (winner by
    seq is the delete). Group 'b' empties and must drop out."""
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 5.0), (3, "a", 1.0), (4, "b", 7.0)],
        "k long, g string, v double",
    )
    mv = base.groupBy("g").agg(
        F.sum("v").alias("total"), F.count(F.lit(1)).alias("n_rows")
    )
    changes = spark.createDataFrame(
        [
            (1, "a", 25.0, 1, "U"),
            (2, "a", 0.0, 1, "D"),
            (4, "b", 99.0, 1, "U"),
            (4, "b", 0.0, 2, "D"),  # later delete wins over the update
            (5, "c", 3.0, 1, "I"),  # new group appears
        ],
        "k long, g string, v double, seq int, op string",
    )
    out = {
        r.g: (round(r.total, 2), r.n_rows)
        for r in analytics.incremental_agg_update(
            mv, base, changes, ["k"], "seq", "op", ["g"], "v"
        ).collect()
    }
    assert out == {"a": (26.0, 2), "c": (3.0, 1)}


def test_prefix_sums_crosses_partition_boundaries(spark):
    """prefix_sums (two-phase distributed cumsum): inclusive running
    sums under a total order must be exact across range-partition
    boundaries — compare against the single-partition-window answer
    on a frame large enough to span several partitions."""
    from lambda_refarch_mapreduce_spark.operators.relational import (
        prefix_sums,
    )

    df = spark.range(1000).select(
        (F.col("id") * 37 % 1000).alias("k"),
        (F.col("id") % 7).alias("a"),
        (F.col("id") % 3).cast("double").alias("b"),
    )
    got = {
        r.k: (r.a_cum, r.b_cum)
        for r in prefix_sums(df, [F.col("k")], ["a", "b"], partitions=8).collect()
    }
    from pyspark.sql.window import Window

    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.k: (r.a_cum, r.b_cum)
        for r in df.select(
            "k", F.sum("a").over(w).alias("a_cum"), F.sum("b").over(w).alias("b_cum")
        ).collect()
    }
    assert got == want and len(got) == 1000


def test_prefix_sums_adaptive_and_pre_ranged(spark):
    """Focused guard for the r13 optimization changes to the two-phase
    kernels' internals (OPTIMIZATION_r13.md Batch 3):

    - ``partitions=None`` (the new default) must produce values
      identical to a pinned explicit count (rank/prefix values are
      partitioning-independent under the total order), and its range
      exchange must be the AQE-coalescible REPARTITION_BY_COL shape
      (an explicit count plans REPARTITION_BY_NUM, which AQE must not
      coalesce) — the scale-adaptive contract.
    - ``pre_ranged=True`` on a caller-range-partitioned aggregate must
      match the default path's values while adding ZERO exchanges
      versus the default path — the caller's range exchange replaces
      the kernel's one-for-one AND the interposed aggregate plans
      exchange-free on it (RangePartitioning satisfies the group-by
      clustering) — the shared-exchange fusion contract.
    """
    from lambda_refarch_mapreduce_spark.operators.relational import (
        prefix_sums,
    )

    rows = spark.range(500).select(
        (F.col("id") * 13 % 97).alias("v"), F.lit(1).alias("one")
    )
    counts = rows.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))

    adaptive = prefix_sums(counts, [F.col("v")], ["cnt"])
    pinned = prefix_sums(counts, [F.col("v")], ["cnt"], partitions=8)
    got_a = {r.v: r.cnt_cum for r in adaptive.collect()}
    got_p = {r.v: r.cnt_cum for r in pinned.collect()}
    assert got_a == got_p and len(got_a) == 97

    from tests.conftest import formatted_plan as _plan
    pa, pp = _plan(adaptive), _plan(pinned)
    assert "REPARTITION_BY_COL" in pa and "REPARTITION_BY_NUM" not in pa
    assert "REPARTITION_BY_NUM" in pp

    fused = prefix_sums(
        counts.repartitionByRange(F.col("v")).groupBy("v").agg(
            F.sum("cnt").alias("cnt")
        ),
        [F.col("v")],
        ["cnt"],
        pre_ranged=True,
    )
    got_f = {r.v: r.cnt_cum for r in fused.collect()}
    assert got_f == got_a
    pf = _plan(fused)
    import re

    n_ex = lambda p: len(re.findall(r"\) Exchange", p))  # noqa: E731
    assert "REPARTITION_BY_COL" in pf
    assert n_ex(pf) == n_ex(pa), (n_ex(pf), n_ex(pa))


def test_arrow_local_mode_matches_window(spark):
    """Focused guard for the r14 optimization (VERDICT r13 next-round
    #1): ``local_mode="arrow"`` replaces the two-phase kernels' local
    Window.partitionBy(__pid) pass — and the full-frame hash(__pid)
    exchange EnsureRequirements fed it with — by one mapInArrow
    sequential scan over the pinned sorted partitions. Contract:

    - values identical to the window path (int64 cumsum+wraparound ==
      Java long running sum; row numbers identical);
    - the corpus branch has NO exchange: MapInArrow consumes the
      InMemoryTableScan of the pin DIRECTLY (the structural assertion
      below), so the only remaining hash(__pid) exchange is the
      offsets partial-agg merge carrying one row per partition;
    - float sum columns are REJECTED (numpy's pairwise float cumsum
      is not bit-identical to the window's sequential adds)."""
    import re

    import pytest

    from lambda_refarch_mapreduce_spark.operators.relational import (
        global_rank,
        pin_scope,
        prefix_sums,
    )

    rows = spark.range(20_000).select(
        (F.col("id") * 2654435761 % 1_000_003).alias("k"),
        (F.col("id") % 97).alias("a"),
        F.col("id"),
    )

    from tests.conftest import formatted_plan as _plan

    adjacent = re.compile(r"MapInArrow \(\d+\)\n[\s:]*\+- InMemoryTableScan")

    with pin_scope():
        w = prefix_sums(rows, [F.col("k"), F.col("id")], ["a"])
        got_w = {r.id: r.a_cum for r in w.collect()}
    with pin_scope():
        a = prefix_sums(
            rows, [F.col("k"), F.col("id")], ["a"], local_mode="arrow"
        )
        pa = _plan(a)
        got_a = {r.id: r.a_cum for r in a.collect()}
    assert got_w == got_a and len(got_a) == 20_000
    assert "MapInArrow" in pa and adjacent.search(pa), pa

    with pin_scope():
        gw = global_rank(rows, [F.col("k"), F.col("id")], rank_col="rnk")
        got_gw = {r.id: r.rnk for r in gw.collect()}
    with pin_scope():
        ga = global_rank(
            rows, [F.col("k"), F.col("id")], rank_col="rnk",
            local_mode="arrow",
        )
        pg = _plan(ga)
        got_ga = {r.id: r.rnk for r in ga.collect()}
    assert got_gw == got_ga and sorted(got_ga.values()) == list(
        range(1, 20_001)
    )
    assert "MapInArrow" in pg and adjacent.search(pg), pg
    assert dict(ga.dtypes)["rnk"] == dict(gw.dtypes)["rnk"]

    floats = rows.withColumn("x", F.col("a") * 0.5)
    with pytest.raises(TypeError, match="integral"):
        prefix_sums(
            floats, [F.col("k"), F.col("id")], ["x"], local_mode="arrow"
        )
    spark.catalog.clearCache()


def _pid_stamped_kernel_outputs(spark):
    """One output DataFrame per pid-stamped two-phase kernel in the
    package — the sweep denominator. Register any NEW kernel that
    stamps rows with F.spark_partition_id here (the grep tripwire
    below fails until you do)."""
    from lambda_refarch_mapreduce_spark.operators.relational import (
        global_rank,
        prefix_sums,
    )
    from lambda_refarch_mapreduce_spark.operators.text import (
        curriculum_order,
        pack_sequences,
    )

    kv = spark.range(100).select(
        (F.col("id") * 37 % 100).alias("k"), (F.col("id") % 7).alias("a")
    )
    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("word "), (F.col("id") % 9).cast("string")).alias(
            "text"
        ),
    )
    return {
        "prefix_sums": prefix_sums(kv, [F.col("k")], ["a"], partitions=8),
        "global_rank": global_rank(kv, [F.col("k")], partitions=8),
        "pack_sequences": pack_sequences(docs, "doc_id", "text", budget=8),
        "curriculum_order": curriculum_order(docs, "doc_id", "text"),
    }


def test_pid_stamped_kernels_pin_one_materialization(spark):
    """Regression guard for the r12 sf0.1 find, generalized to EVERY
    pid-stamped two-phase kernel (VERDICT r12 next-round #2 — the
    original guard covered prefix_sums/global_rank only, leaving
    pack_sequences' token binning and the curriculum ranker's pins
    droppable by a refactor): these kernels stamp rows with the
    NONDETERMINISTIC spark_partition_id, so every branch must read ONE
    pinned materialization — without the pin each branch re-runs
    repartitionByRange, whose SAMPLED bounds can differ between
    materializations (observed on the real sf0.1 value-counts frame:
    12,824 of 13,241 cumulative rows wrong, flipping the sign of
    Cliff's delta). Small synthetic frames rarely trigger the
    divergence, so the guard is STRUCTURAL: each kernel's optimized
    plan must contain the InMemoryRelation pin."""
    for name, out in _pid_stamped_kernel_outputs(spark).items():
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "InMemoryRelation" in plan, (
            f"{name} lost its materialization pin — the offsets join "
            "is only correct against a single pinned partitioning "
            "(see operators.relational.pin)"
        )
    spark.catalog.clearCache()


def test_pid_stamp_sites_all_registered_in_pin_sweep():
    """Grep tripwire (VERDICT r12 next-round #2): every
    F.spark_partition_id( call site in the package must belong to a
    kernel enumerated in _pid_stamped_kernel_outputs above, so a NEW
    pid-stamped kernel cannot ship without joining the structural pin
    sweep. Counts are per-file so a site moving between files also
    trips."""
    import pathlib

    pkg = (
        pathlib.Path(__file__).resolve().parents[1]
        / "lambda_refarch_mapreduce_spark"
    )
    # file -> expected number of F.spark_partition_id( call sites;
    # relational.py: global_rank + prefix_sums; text.py:
    # pack_sequences + curriculum_order
    registered = {"operators/relational.py": 2, "operators/text.py": 2}
    found: dict[str, int] = {}
    for py in pkg.rglob("*.py"):
        n = py.read_text().count("F.spark_partition_id(")
        if n:
            found[str(py.relative_to(pkg))] = n
    assert found == registered, (
        f"pid-stamp sites moved: found {found}, registered "
        f"{registered}. Any kernel stamping rows with "
        "spark_partition_id needs the materialization pin "
        "(operators.relational.pin) AND an entry in "
        "_pid_stamped_kernel_outputs so the structural sweep covers it."
    )


def test_pin_scope_bounds_pin_lifetime(spark):
    """ADVICE r12: the two-phase kernels' correctness pins must not
    accumulate without bound in long-running callers (the 315-entry
    oracle gate, the bench loop, a streaming monitor serving readouts
    for days). pin_scope() releases every pin taken inside on exit;
    no scope keeps the pre-r13 session-lifetime behavior; scopes nest
    without cross-releasing."""
    from lambda_refarch_mapreduce_spark.operators.relational import (
        global_rank,
        pin_scope,
        prefix_sums,
    )

    cache = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    assert cache.isEmpty()

    df = spark.range(500).select(
        (F.col("id") * 37 % 500).alias("k"), (F.col("id") % 7).alias("a")
    )
    # inside the scope the pin is live (that IS the correctness
    # mechanism) and the result is right; on exit the cache is empty
    with pin_scope():
        got = {
            r.k: r.a_cum
            for r in prefix_sums(
                df, [F.col("k")], ["a"], partitions=8
            ).collect()
        }
        assert not cache.isEmpty()
    assert cache.isEmpty(), "pin_scope exit must release its pins"
    from pyspark.sql.window import Window

    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.k: r.a_cum
        for r in df.select("k", F.sum("a").over(w).alias("a_cum")).collect()
    }
    assert got == want

    # nesting: pins register with the OUTERMOST scope (identical-plan
    # pins share one CacheManager entry — global_rank and prefix_sums
    # over the same frame pin the same analyzed plan — so an
    # inner-scope release would yank the shared entry from under the
    # outer caller and its next action would recompute with fresh
    # range bounds, the r12 divergence); only the outermost exit
    # releases anything
    with pin_scope():
        outer = global_rank(df, [F.col("k")], partitions=8)
        outer.collect()
        with pin_scope():
            prefix_sums(df, [F.col("k")], ["a"], partitions=8).collect()
        assert not cache.isEmpty(), (
            "inner scope exit must not release anything — pins belong "
            "to the outermost scope"
        )
        # the shared entry is still live: re-consuming the outer
        # result inside its scope stays coherent
        outer.collect()
    assert cache.isEmpty()

    # no scope: session-lifetime pin (the one-shot batch default)
    prefix_sums(df, [F.col("k")], ["a"], partitions=8).collect()
    assert not cache.isEmpty()
    spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# Round 6b: statistical-inference tier — the shared formula strings the
# catalog entries feed to selectExpr, cross-validated against numpy /
# brute force / hand-computed references on data the entries never see.
# ---------------------------------------------------------------------------


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50),
            st.integers(min_value=0, max_value=10),
            st.integers(min_value=100, max_value=10_000_000),
        ),
        min_size=8,
        max_size=40,
    )
)
@settings(**_PROP_SETTINGS)
def test_ols_cramer_matches_numpy_lstsq(spark, rows):
    """The Cramer-rule solve (the exact text ols_price_qty_discount
    feeds to selectExpr) must agree with numpy's least-squares on
    arbitrary integer designs — unless the design is (near-)singular,
    which hypothesis can produce (e.g. constant quantity); those are
    filtered by a determinant floor."""
    import numpy as np

    from lambda_refarch_mapreduce_spark.plans.catalog_analytics import (
        _OLS_B0,
        _OLS_B1,
        _OLS_B2,
        _OLS_DET,
    )

    q = np.array([r[0] for r in rows], dtype=float)
    d = np.array([r[1] for r in rows], dtype=float)
    y = np.array([r[2] for r in rows], dtype=float)
    X = np.column_stack([np.ones_like(q), q, d])
    # scale-aware singularity floor: det of XtX relative to its trace
    xtx = X.T @ X
    if abs(np.linalg.det(xtx)) < 1e-9 * (np.trace(xtx) / 3) ** 3:
        return
    ref, *_ = np.linalg.lstsq(X, y, rcond=None)

    df = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in rows], "q long, d long, y long"
    )
    a = df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("q").cast("double").alias("sq"),
        F.sum("d").cast("double").alias("sd"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("q") * F.col("q")).cast("double").alias("sqq"),
        F.sum(F.col("d") * F.col("d")).cast("double").alias("sdd"),
        F.sum(F.col("q") * F.col("d")).cast("double").alias("sqd"),
        F.sum(F.col("q") * F.col("y")).cast("double").alias("sqy"),
        F.sum(F.col("d") * F.col("y")).cast("double").alias("sdy"),
    )
    got = a.selectExpr(
        f"{_OLS_DET} AS det",
        f"{_OLS_B0} AS b0",
        f"{_OLS_B1} AS b1",
        f"{_OLS_B2} AS b2",
    ).collect()[0]
    scale = max(1.0, abs(ref[0]), abs(ref[1]), abs(ref[2]))
    assert math.isclose(got.b0, ref[0], abs_tol=1e-5 * scale), (got, ref)
    assert math.isclose(got.b1, ref[1], abs_tol=1e-5 * scale), (got, ref)
    assert math.isclose(got.b2, ref[2], abs_tol=1e-5 * scale), (got, ref)


@given(
    pos=st.lists(st.integers(min_value=0, max_value=8), min_size=2, max_size=25),
    neg=st.lists(st.integers(min_value=0, max_value=8), min_size=2, max_size=25),
)
@settings(**_PROP_SETTINGS)
def test_mann_whitney_2u_equals_bruteforce_pairs(spark, pos, neg):
    """2U from the grouped-counts + prefix-sums plan (the exact shape
    mann_whitney_auc_value runs) must equal the brute-force pair count
    2 * (wins + ties/2) over all (pos, neg) pairs — the tiny value
    alphabet forces heavy ties, the hard case."""
    from lambda_refarch_mapreduce_spark.operators.relational import (
        prefix_sums,
    )

    brute2u = sum(
        2 if p > n else (1 if p == n else 0) for p in pos for n in neg
    )
    rows = [(v, 1, 0) for v in pos] + [(v, 0, 1) for v in neg]
    df = spark.createDataFrame(rows, "v long, ip long, ic long")
    g = df.groupBy("v").agg(
        F.sum("ip").alias("cp"), F.sum("ic").alias("cc")
    )
    cum = prefix_sums(g, [F.col("v")], ["cc"])
    got = cum.agg(
        F.sum(
            F.col("cp") * (2 * (F.col("cc_cum") - F.col("cc")) + F.col("cc"))
        ).alias("u2")
    ).collect()[0].u2
    assert got == brute2u, (got, brute2u)


def test_wilson_interval_known_value_and_bounds(spark):
    """Wilson 95% interval for x=1, n=10 is the textbook [0.0179,
    0.4042] (Brown-Cai-DasGupta); and on a sweep of (x, n) the
    interval must bracket the point estimate inside [0, 1]."""
    from lambda_refarch_mapreduce_spark.plans.catalog_analytics import (
        _WILSON_CENTER,
        _WILSON_HALF,
    )

    cases = [(1, 10)] + [
        (x, n) for n in (1, 2, 7, 10, 100) for x in range(0, n + 1, max(1, n // 4))
    ]
    df = spark.createDataFrame(cases, "x long, n long")
    rows = df.selectExpr(
        "x",
        "n",
        f"{_WILSON_CENTER} - {_WILSON_HALF} AS lo",
        f"{_WILSON_CENTER} + {_WILSON_HALF} AS hi",
    ).collect()
    by = {(r.x, r.n): r for r in rows}
    r = by[(1, 10)]
    assert math.isclose(r.lo, 0.01787621, abs_tol=5e-4), r
    assert math.isclose(r.hi, 0.40415482, abs_tol=5e-4), r
    eps = 1e-12  # x=0 / x=n leave ~1e-17 of FP residue around the ends
    for r in rows:
        p = r.x / r.n
        assert -eps <= r.lo <= p + eps and p - eps <= r.hi <= 1.0 + eps, r


def test_benford_digit_extraction_crafted_cents(spark):
    """First-digit extraction on exact cents must survive the values
    that break floor(log10(x)) float tricks: exact powers of ten,
    9.99... boundaries, and single-cent amounts."""
    vals = [0.01, 0.09, 0.10, 1.00, 9.99, 10.00, 99.99, 100.00, 1000.00]
    want = [1, 9, 1, 1, 9, 1, 9, 1, 1]
    df = spark.createDataFrame([(v,) for v in vals], "price double")
    digit = F.substring(
        F.round(F.col("price") * 100).cast("long").cast("string"), 1, 1
    ).cast("int")
    got = [r.d for r in df.select(digit.alias("d")).collect()]
    assert got == want, (got, want)


@given(
    a_vals=st.lists(st.integers(min_value=0, max_value=12), min_size=2, max_size=30),
    b_vals=st.lists(st.integers(min_value=0, max_value=12), min_size=2, max_size=30),
)
@settings(**_PROP_SETTINGS)
def test_ks_from_value_counts_equals_bruteforce_cdf(spark, a_vals, b_vals):
    """KS D from the grouped-counts + prefix-sums kernel must equal
    the brute-force max CDF gap over the union of observed values —
    tiny alphabet, heavy ties, both CDFs step at shared points."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        ks_from_value_counts,
    )

    pts = sorted(set(a_vals) | set(b_vals))
    na, nb = len(a_vals), len(b_vals)
    brute = max(
        abs(
            sum(1 for x in a_vals if x <= p) / na
            - sum(1 for x in b_vals if x <= p) / nb
        )
        for p in pts
    )
    rows = [(v, 1, 0) for v in a_vals] + [(v, 0, 1) for v in b_vals]
    df = spark.createDataFrame(rows, "v long, ia long, ib long")
    g = df.groupBy("v").agg(
        F.sum("ia").alias("ca"), F.sum("ib").alias("cb")
    )
    got = ks_from_value_counts(g).collect()[0]
    assert (got.n_a, got.n_b) == (na, nb)
    assert math.isclose(got.ks_d, round(brute, 6), abs_tol=1e-6), (
        got.ks_d,
        brute,
    )


@given(
    pts=st.lists(
        st.tuples(
            st.floats(min_value=25.0, max_value=49.0, allow_nan=False),
            st.floats(min_value=-124.0, max_value=-67.0, allow_nan=False),
        ),
        min_size=2,
        max_size=25,
    ),
    radius=st.sampled_from([5.0, 50.0, 300.0]),
)
@settings(**_PROP_SETTINGS)
def test_geo_radius_join_equals_bruteforce(spark, pts, radius):
    """The grid-cell pigeonhole radius join must return EXACTLY the
    brute-force haversine pairs — the 3x3 neighborhood claim is
    'no pair within R can span more than one cell boundary per axis',
    and a missed neighbor would silently drop pairs near cell edges
    (clustered duplicates at identical coordinates are the degenerate
    hot-cell case)."""
    import math as m

    from lambda_refarch_mapreduce_spark.operators.geo import (
        radius_self_join,
    )

    def hav(a, b):
        dlat = m.radians(b[0] - a[0])
        dlon = m.radians(b[1] - a[1])
        h = (
            m.sin(dlat / 2) ** 2
            + m.cos(m.radians(a[0])) * m.cos(m.radians(b[0]))
            * m.sin(dlon / 2) ** 2
        )
        return 2 * 6371.0088 * m.asin(m.sqrt(h))

    want = {
        (i, j)
        for i in range(len(pts))
        for j in range(i + 1, len(pts))
        if hav(pts[i], pts[j]) <= radius
    }
    df = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(pts)],
        "id long, lat double, lon double",
    )
    got = {
        (r.id_a, r.id_b)
        for r in radius_self_join(
            df, "id", "lat", "lon", radius, max_abs_lat=49.0
        ).collect()
    }
    assert got == want, (got ^ want)


def test_haversine_known_distances(spark):
    """Sanity pins for the haversine kernel: LA–SF is ~559 km; a
    degenerate zero-distance pair is exactly 0; antipodal-ish
    east-west at the equator ~ 111.32 km/deg."""
    from lambda_refarch_mapreduce_spark.operators.geo import haversine_km

    df = spark.createDataFrame(
        [
            (34.0522, -118.2437, 37.7749, -122.4194),  # LA -> SF
            (40.0, -100.0, 40.0, -100.0),  # same point
            (0.0, 0.0, 0.0, 1.0),  # 1 deg lon at equator
        ],
        "lat_a double, lon_a double, lat_b double, lon_b double",
    )
    got = [
        r.d
        for r in df.select(
            haversine_km(
                F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
            ).alias("d")
        ).collect()
    ]
    assert math.isclose(got[0], 559.12, abs_tol=1.0), got[0]
    assert got[1] == 0.0
    assert math.isclose(got[2], 111.19, abs_tol=0.3), got[2]


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50),
            st.integers(min_value=0, max_value=10),
            st.integers(min_value=100, max_value=1_000_000),
        ),
        min_size=5,
        max_size=30,
    )
)
@settings(**_PROP_SETTINGS)
def test_corr_expr_matches_numpy_corrcoef(spark, rows):
    """The shared Pearson-r formula text (what corr_matrix_lineitem
    feeds to selectExpr) must agree with numpy.corrcoef on arbitrary
    integer data; constant columns (zero variance) are skipped — the
    formula divides by zero there, as does the definition."""
    import numpy as np

    from lambda_refarch_mapreduce_spark.plans.catalog_analytics import (
        _corr_expr,
    )

    q = np.array([r[0] for r in rows], dtype=float)
    d = np.array([r[1] for r in rows], dtype=float)
    if q.std() == 0 or d.std() == 0:
        return
    ref = np.corrcoef(q, d)[0, 1]

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b, _ in rows], "q long, d long"
    )
    a = df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("q").cast("double").alias("sq"),
        F.sum("d").cast("double").alias("sd"),
        F.sum(F.col("q") * F.col("q")).cast("double").alias("sqq"),
        F.sum(F.col("d") * F.col("d")).cast("double").alias("sdd"),
        F.sum(F.col("q") * F.col("d")).cast("double").alias("sqd"),
    )
    got = a.selectExpr(f"{_corr_expr('q', 'd')} AS r").collect()[0].r
    assert math.isclose(got, ref, abs_tol=1e-9), (got, ref)


def test_zipf_mle_matches_python_reference(spark):
    """The Zipf alpha MLE over a crafted frequency table must equal
    the plain-Python computation of 1 + n / sum(ln(k / (kmin-0.5)))."""
    import math as m

    from lambda_refarch_mapreduce_spark.plans.catalog_llm import (
        ZIPF_KMIN,
        _ZIPF_ALPHA,
    )

    # (frequency k, token count m) pairs, tail-only (k >= kmin)
    byk = [(5, 40), (6, 21), (8, 9), (13, 4), (40, 1)]
    n = sum(mm for _, mm in byk)
    slog = sum(mm * m.log(k / (ZIPF_KMIN - 0.5)) for k, mm in byk)
    ref = 1 + n / slog

    df = spark.createDataFrame(byk, "k long, m long")
    a = df.agg(
        F.sum("m").alias("n"),
        F.sum(
            F.col("m") * F.expr(f"ln(k / {ZIPF_KMIN - 0.5}e0)")
        ).alias("slog"),
    )
    got = a.selectExpr(f"{_ZIPF_ALPHA} AS alpha").collect()[0].alpha
    assert math.isclose(got, ref, rel_tol=1e-12), (got, ref)


@given(
    lpts=st.lists(
        st.tuples(
            st.floats(min_value=25.0, max_value=49.0, allow_nan=False),
            st.floats(min_value=-124.0, max_value=-67.0, allow_nan=False),
        ),
        min_size=1,
        max_size=12,
    ),
    rpts=st.lists(
        st.tuples(
            st.floats(min_value=25.0, max_value=49.0, allow_nan=False),
            st.floats(min_value=-124.0, max_value=-67.0, allow_nan=False),
        ),
        min_size=1,
        max_size=12,
    ),
    radius=st.sampled_from([20.0, 200.0]),
)
@settings(**_PROP_SETTINGS)
def test_geo_two_table_radius_join_equals_bruteforce(
    spark, lpts, rpts, radius
):
    """The two-table grid radius join must return EXACTLY the
    brute-force cross-product pairs within R."""
    import math as m

    from lambda_refarch_mapreduce_spark.operators.geo import radius_join

    def hav(a, b):
        dlat = m.radians(b[0] - a[0])
        dlon = m.radians(b[1] - a[1])
        h = (
            m.sin(dlat / 2) ** 2
            + m.cos(m.radians(a[0])) * m.cos(m.radians(b[0]))
            * m.sin(dlon / 2) ** 2
        )
        return 2 * 6371.0088 * m.asin(m.sqrt(h))

    want = {
        (i, j)
        for i, a in enumerate(lpts)
        for j, b in enumerate(rpts)
        if hav(a, b) <= radius
    }
    left = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(lpts)],
        "lid long, lat double, lon double",
    )
    right = spark.createDataFrame(
        [(j, la, lo) for j, (la, lo) in enumerate(rpts)],
        "rid long, lat double, lon double",
    )
    got = {
        (r.lid, r.rid)
        for r in radius_join(
            left, "lid", right, "rid", "lat", "lon", radius, max_abs_lat=49.0
        ).collect()
    }
    assert got == want, (got ^ want)


def test_mann_whitney_no_int64_overflow_at_scale_counts(spark):
    """The MW kernel consumes a per-distinct-value COUNT frame, so a
    billion-row A/B test reaches it as a handful of rows with huge
    counts — where the int64 tie cube t^3 wraps silently past t ~
    2.1M rows sharing one value, and cp * cc_cum wraps past ~3e9 rows
    per side (ADVICE r6). The kernel must widen to decimal(38,0)
    per-row (mirroring the welch kernel's v^2 guard) and agree with
    exact Python-int arithmetic on counts far beyond the wrap point."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        mann_whitney_from_value_counts,
    )

    # three distinct cents values, 4e9 rows per side: t^3 ~ 1.7e29
    counts = [(100, 2 * 10**9, 1 * 10**9),
              (200, 1 * 10**9, 2 * 10**9),
              (300, 1 * 10**9, 1 * 10**9)]
    df = spark.createDataFrame(counts, "v long, cp long, cc long")
    row = mann_whitney_from_value_counts(df).collect()[0]

    # exact reference in unbounded Python ints / floats
    n1 = sum(c[1] for c in counts)
    n2 = sum(c[2] for c in counts)
    cc_below = 0
    u2 = 0
    ties = 0
    for v, cp, cc in sorted(counts):
        u2 += cp * (2 * cc_below + cc)
        t = cp + cc
        ties += t * t * t - t
        cc_below += cc
    assert u2 > 2**63 and ties > 2**63  # the test is vacuous otherwise
    auc = u2 / (2.0 * n1 * n2)
    z = (u2 / 2.0 - n1 * 1.0 * n2 / 2.0) / (
        (n1 * 1.0 * n2 / 12.0)
        * ((n1 + n2 + 1) - ties * 1.0 / ((n1 + n2) * 1.0 * (n1 + n2 - 1)))
    ) ** 0.5
    assert row.n_a == n1 and row.n_b == n2
    assert abs(row.auc - round(auc, 6)) < 1e-9, (row.auc, auc)
    assert abs(row.z - round(z, 6)) < 1e-9, (row.z, z)
    assert row.significant == (abs(z) > 1.96)


def test_geo_radius_join_wraps_antimeridian(spark):
    """Pairs straddling lon ±180° must be found (VERDICT r6 missing
    #4: unwrapped cell keys silently missed the seam): Fiji-side
    points at +179.99° and -179.99° are ~2.2 km apart at |lat| 16° —
    well inside a 50 km radius — and +180.0 / -180.0 are the SAME
    meridian (distance 0). Far-apart controls on the seam must stay
    excluded, and the wrapped keys must not duplicate any pair."""
    from lambda_refarch_mapreduce_spark.operators.geo import (
        haversine_km,
        radius_join,
        radius_self_join,
    )

    rows = [
        (0, -16.5, 179.99),
        (1, -16.5, -179.99),  # ~2.1 km from 0, across the seam
        (2, -16.5, 180.0),
        (3, -16.5, -180.0),  # identical point to 2 (dist 0)
        (4, -16.5, 170.0),  # ~1066 km from the seam: excluded
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    got = sorted(
        (r.id_a, r.id_b)
        for r in radius_self_join(
            df, "id", "lat", "lon", 50.0, max_abs_lat=20.0
        ).collect()
    )
    assert got == [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)], got

    # two-table variant finds the cross-seam assignment exactly once
    pois = spark.createDataFrame(
        [(100, -16.5, -179.99)], "poi long, lat double, lon double"
    )
    assigned = radius_join(
        df, "id", pois, "poi", "lat", "lon", 50.0, max_abs_lat=20.0
    ).collect()
    assert sorted(r.id for r in assigned) == [0, 1, 2, 3]
    assert len(assigned) == 4  # no wrap-duplicate candidates survive


def test_geo_radius_join_rejects_out_of_band_inputs(spark):
    """Out-of-band coordinates must fail LOUDLY (ADVICE r6: the
    docstring warned, nothing enforced): |lat| > max_abs_lat shrinks
    km-per-lon-degree under the cell width, silently dropping pairs,
    so the cell projection raises instead. Same for non-canonical
    longitudes, where wrap-normalization would be unsound. A too-large
    radius (cells wider than a third of the circle) fails at build."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from lambda_refarch_mapreduce_spark.operators.geo import (
        radius_self_join,
    )

    bad_lat = spark.createDataFrame(
        [(0, 70.0, 10.0), (1, 10.0, 10.0)], "id long, lat double, lon double"
    )
    with pytest.raises((PySparkException, Py4JJavaError)) as e:
        radius_self_join(
            bad_lat, "id", "lat", "lon", 10.0, max_abs_lat=66.0
        ).collect()
    assert "max_abs_lat" in str(e.value)

    bad_lon = spark.createDataFrame(
        [(0, 10.0, 181.0), (1, 10.0, 10.0)], "id long, lat double, lon double"
    )
    with pytest.raises((PySparkException, Py4JJavaError)) as e:
        radius_self_join(
            bad_lon, "id", "lat", "lon", 10.0, max_abs_lat=66.0
        ).collect()
    assert "[-180, 180]" in str(e.value)

    with pytest.raises(ValueError, match="third of the longitude"):
        radius_self_join(bad_lat, "id", "lat", "lon", 6000.0)


def test_chi2_and_mi_match_python_reference(spark):
    """chi2_from_contingency / mutual_info_from_contingency vs a plain
    Python recomputation of the textbook formulas on a crafted 3x3
    table with one structurally ABSENT cell — the dense frame must
    materialize it for chi2 ((0-e)^2/e contributes) and MI must skip
    it exactly (0*ln(0) -> 0). The Python reference folds terms in
    the same sorted order, so agreement is to float-print precision,
    not statistical tolerance."""
    import math

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        chi2_from_contingency,
        contingency_counts,
        mutual_info_from_contingency,
    )

    raw = [("x", 0)] * 30 + [("x", 1)] * 10 + [("x", 2)] * 5 \
        + [("y", 0)] * 8 + [("y", 1)] * 22 + [("y", 2)] * 4 \
        + [("z", 0)] * 6 + [("z", 1)] * 15  # (z, 2) absent
    df = spark.createDataFrame(raw, "a string, b long")
    cells = contingency_counts(df, "a", "b")

    # python reference over the dense table
    from collections import Counter

    obs = Counter(raw)
    a_vals, b_vals = sorted({a for a, _ in raw}), sorted({b for _, b in raw})
    ra = {a: sum(obs[(a, b)] for b in b_vals) for a in a_vals}
    cb = {b: sum(obs[(a, b)] for a in a_vals) for b in b_vals}
    n = sum(obs.values())
    chi2 = 0.0
    for a in a_vals:
        for b in b_vals:
            e = ra[a] * 1.0 * cb[b] / n
            chi2 += (obs[(a, b)] * 1.0 - e) ** 2 / e
    dof = (len(a_vals) - 1) * (len(b_vals) - 1)
    v = math.sqrt(chi2 / (n * 1.0 * min(len(a_vals) - 1, len(b_vals) - 1)))

    row = chi2_from_contingency(cells).collect()[0]
    assert row.n_total == n and row.dof == dof
    assert abs(row.chi2 - chi2) < 1e-6, (row.chi2, chi2)
    assert abs(row.cramers_v - v) < 1e-6

    mi = sum(
        obs[(a, b)] * 1.0 * math.log(obs[(a, b)] * 1.0 * n / (ra[a] * 1.0 * cb[b]))
        for a in a_vals
        for b in b_vals
        if obs[(a, b)] > 0
    ) / n
    h_a = -sum(ra[a] / n * math.log(ra[a] * 1.0 / n) for a in a_vals)
    h_b = -sum(cb[b] / n * math.log(cb[b] * 1.0 / n) for b in b_vals)
    m = mutual_info_from_contingency(cells).collect()[0]
    assert abs(m.mi_nats - mi) < 1e-6 and abs(m.h_a - h_a) < 1e-6
    assert abs(m.nmi - mi / min(h_a, h_b)) < 1e-6


def test_anova_f_matches_python_reference(spark):
    """anova_f_from_groups vs the textbook SSB/SSW computation on
    integer-valued groups with clearly different means (F must be
    large and significant) and on identical groups (F ~ 0)."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        anova_f_from_groups,
    )

    groups = {"a": [10, 12, 11, 13], "b": [20, 22, 21, 23], "c": [30, 29, 31, 32]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    gm = df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("q"),
    )
    row = anova_f_from_groups(gm).collect()[0]

    allv = [v for vs in groups.values() for v in vs]
    nt, k = len(allv), len(groups)
    mean = sum(allv) / nt
    ssb = sum(
        len(vs) * (sum(vs) / len(vs) - mean) ** 2 for vs in groups.values()
    )
    ssw = sum(
        (v - sum(vs) / len(vs)) ** 2
        for vs in groups.values()
        for v in vs
    )
    f_ref = (ssb / (k - 1)) / (ssw / (nt - k))
    assert row.k_groups == k and row.n_total == nt
    assert abs(row.f_stat - f_ref) < 1e-4, (row.f_stat, f_ref)
    assert row.significant

    same = spark.createDataFrame(
        [(g, v) for g in "abc" for v in (5, 6, 7)], "g string, v long"
    )
    gm2 = same.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("q"),
    )
    row2 = anova_f_from_groups(gm2).collect()[0]
    assert abs(row2.f_stat) < 1e-9 and not row2.significant


def test_acf_matches_numpy_reference(spark):
    """acf_lags vs the standard sample-ACF formula computed with
    numpy (full-series variance denominator) on a deterministic
    series with a strong period-3 component — lag 3 must dominate."""
    import numpy as np

    from lambda_refarch_mapreduce_spark.operators.analytics import acf_lags

    y = [int(100 + 50 * ((i % 3) - 1) + (i * 7) % 5) for i in range(60)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(y)], "k long, y long"
    )
    got = {r.lag: r.acf for r in acf_lags(df, "k", "y", 5).collect()}

    arr = np.array(y, dtype=float)
    c = arr - arr.mean()
    denom = (c * c).sum()
    for k in range(1, 6):
        ref = (c[k:] * c[:-k]).sum() / denom
        assert abs(got[k] - ref) < 1e-6, (k, got[k], ref)
    assert got[3] == max(got.values())


def test_countmin_never_underestimates_any_item(spark):
    """The CMS one-sided error contract must hold for EVERY item, not
    just the probed heavy hitters: est >= exact for all, and est is
    the min over depth rows (so narrower width only ever inflates)."""
    from lambda_refarch_mapreduce_spark.operators.sketch import (
        countmin_build,
        countmin_lookup,
    )

    rows = [(f"u{i % 37}",) for i in range(1500)] + [("hot",)] * 400
    df = spark.createDataFrame(rows, "item string")
    exact = {
        r.item: r.n
        for r in df.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for width in (16, 64):
        sk = countmin_build(df, "item", depth=3, width=width)
        est = {
            r.item: r.est_n
            for r in countmin_lookup(
                sk, df.select("item").distinct(), "item", 3, width
            ).collect()
        }
        assert set(est) == set(exact)
        for item, n in exact.items():
            assert est[item] >= n, (width, item, est[item], n)
    # the hot item stays well-estimated even in the tiny sketch
    assert est["hot"] >= 400


def test_item_cosine_equals_bruteforce(spark):
    """item_item_cosine vs a brute-force Python recomputation on a
    small basket set (no pruning in effect: support 1, no cap), with
    the min_pair_count floor and cosine ordering checked."""
    import itertools
    import math

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        item_item_cosine,
    )

    baskets = {
        1: ["a", "b", "c"],
        2: ["a", "b"],
        3: ["a", "c"],
        4: ["b", "c", "d"],
        5: ["a", "b"],
        6: ["d"],
    }
    rows = [(o, i) for o, items in baskets.items() for i in items]
    df = spark.createDataFrame(rows, "o long, i string")
    got = item_item_cosine(
        df, "o", "i", min_support=1, max_basket_items=10,
        min_pair_count=2, top_n=100,
    ).collect()

    sup = {}
    co = {}
    for items in baskets.values():
        for x in items:
            sup[x] = sup.get(x, 0) + 1
        for x, yy in itertools.combinations(sorted(items), 2):
            co[(x, yy)] = co.get((x, yy), 0) + 1
    want = {
        pair: (c, sup[pair[0]], sup[pair[1]],
               round(c / math.sqrt(sup[pair[0]] * sup[pair[1]]), 6))
        for pair, c in co.items()
        if c >= 2
    }
    assert {(r.item_a, r.item_b) for r in got} == set(want)
    for r in got:
        c, na, nb, cos = want[(r.item_a, r.item_b)]
        assert (r.n_baskets, r.n_a, r.n_b) == (c, na, nb)
        assert abs(r.cosine - cos) < 1e-9
    # ordering: cosine desc, then item_a, item_b
    keys = [(-r.cosine, r.item_a, r.item_b) for r in got]
    assert keys == sorted(keys)


def test_percentile_sketch_gate_exact_matches_sorted_list(spark):
    """The entry's EXACT percentile definition (smallest value whose
    inclusive cumulative count covers p) vs a sorted Python list at
    sf0.001, and every rank verdict TRUE — the GK contract holds by
    construction, so a False here means the rank accounting broke."""
    from lambda_refarch_mapreduce_spark.plans import (  # noqa: F401
        catalog,
        catalog_analytics,
    )

    rows = catalog.REGISTRY["percentile_sketch_rank_gate"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()
    import duckdb

    vals = sorted(
        v
        for (v,) in duckdb.sql(
            "SELECT round(o_totalprice * 100)::BIGINT FROM "
            "'/root/testdata/sf0.001/orders.parquet'"
        ).fetchall()
    )
    n = len(vals)
    for r in rows:
        # smallest index i (1-based) with i*10000 >= p_bp*n
        idx = -(-r.p_bp * n // 10000)  # ceil
        assert r.exact_cents == vals[idx - 1], (r.p_bp, r.exact_cents)
        assert r.rank_ok


def test_bloom_filter_no_false_negatives_and_sql_replayable(spark):
    """The Bloom membership predicate (operators/sketch.py) can NEVER
    be false for an inserted key (Bloom 1970's one guarantee — the
    exact join downstream only ever removes false POSITIVES), and the
    seeded-md5 bit positions replay exactly in plain Python/SQL — the
    property the catalog entry's full-replay oracle rests on. Also
    pins the merge law: bits(A ∪ B) == bits(A) ∪ bits(B) as set-bit
    frames (== bitwise OR of the packed words)."""
    import hashlib

    from lambda_refarch_mapreduce_spark.operators import sketch

    n_bits, k = 1 << 10, 3
    keys = spark.range(0, 200).select((F.col("id") * 7 + 3).alias("k"))
    probe = spark.range(0, 3000).select(F.col("id").alias("x"))

    bits = sketch.bloom_bits(keys, "k", n_bits, k)
    words = sketch.bloom_words(bits, n_bits)
    cand = probe.filter(
        sketch.bloom_might_contain(F.col("x"), words, n_bits, k)
    )

    key_vals = {r.k for r in keys.collect()}
    cand_set = {r.x for r in cand.collect()}
    exact = key_vals & {r.x for r in probe.collect()}
    assert exact, "vacuous: no true members in the probe range"
    assert exact <= cand_set, sorted(exact - cand_set)[:5]
    # candidates stay a small superset: the filter actually filters
    assert len(cand_set) < 3000 / 2

    # bit positions replay from the documented recipe, bit for bit
    def pos(seed: int, key: int) -> int:
        h = hashlib.md5(f"bloom{seed}:{key}".encode()).hexdigest()[:8]
        return int(h, 16) % n_bits

    py_bits = {pos(s, kk) for kk in key_vals for s in range(k)}
    assert py_bits == {r.pos for r in bits.collect()}
    # packed words match a python packing of the same positions
    py_words = [0] * ((n_bits + 63) // 64)
    for p in py_bits:
        py_words[p // 64] |= 1 << (p % 64)
    signed = [w - (1 << 64) if w >= (1 << 63) else w for w in py_words]
    assert signed == words

    # merge law: the union's set-bit frame is the union of frames
    half_a = keys.filter(F.col("k") < 700)
    half_b = keys.filter(F.col("k") >= 700)
    merged = (
        sketch.bloom_bits(half_a, "k", n_bits, k)
        .unionAll(sketch.bloom_bits(half_b, "k", n_bits, k))
        .distinct()
    )
    assert {r.pos for r in merged.collect()} == py_bits


def test_kaplan_meier_matches_python_reference(spark):
    """operators.analytics.kaplan_meier vs a hand-rolled Python KM on
    a small cohort with tied event times, tied censor times, and a
    censor sharing a death's time (the standard convention: subjects
    censored AT t are still at risk for the deaths at t — they leave
    after). Checks every output column including the running survival
    product."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        kaplan_meier,
    )

    # (t, event): deaths at 2 (x2), 4, 7 (x3); censors at 3, 4, 9, 9
    subjects = [
        (2, 1), (2, 1), (3, 0), (4, 1), (4, 0),
        (7, 1), (7, 1), (7, 1), (9, 0), (9, 0), (12, 1),
    ]
    df = spark.createDataFrame(subjects, "t long, event int")
    got = {r.t: r for r in kaplan_meier(df, "t", "event").collect()}

    # python reference
    n = len(subjects)
    times = sorted({t for t, e in subjects if e == 1})
    surv, want = 1.0, {}
    for t in times:
        d = sum(1 for tt, e in subjects if tt == t and e == 1)
        c = sum(1 for tt, e in subjects if tt == t and e == 0)
        at_risk = sum(1 for tt, _ in subjects if tt >= t)
        surv *= 1.0 - d / at_risk
        want[t] = (at_risk, d, c, surv)

    assert set(got) == set(want)
    for t, (at_risk, d, c, s) in want.items():
        r = got[t]
        assert (r.n_risk, r.n_events, r.n_censored) == (at_risk, d, c), t
        # the operator rounds survival to 6dp (the catalog convention)
        assert abs(r.survival - round(s, 6)) < 1e-12, (t, r.survival, s)
    # the curve is monotone non-increasing and ends below 1
    vals = [got[t].survival for t in sorted(got)]
    assert vals == sorted(vals, reverse=True)
    assert vals[-1] < 1.0


def test_log_rank_matches_python_reference(spark):
    """operators.analytics.log_rank_from_subjects vs a hand-rolled
    Mantel-Haenszel computation on a small two-group cohort with tied
    event times, censoring, and group-exclusive times — including the
    terminal nt=1 time whose variance term is pinned to 0."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        log_rank_from_subjects,
    )

    subjects = [
        # group a: deaths at 2, 4, 4; censors at 3, 9
        (2, 1, "x"), (4, 1, "x"), (4, 1, "x"), (3, 0, "x"), (9, 0, "x"),
        # group b: deaths at 4, 7, 12; censors at 2, 7
        (4, 1, "y"), (7, 1, "y"), (12, 1, "y"), (2, 0, "y"), (7, 0, "y"),
    ]
    df = spark.createDataFrame(subjects, "t long, event int, g string")
    got = log_rank_from_subjects(df, "t", "event", "g", "x", "y").collect()[
        0
    ]

    times = sorted({t for t, e, _ in subjects if e == 1})
    o1 = sum(1 for t, e, g in subjects if e == 1 and g == "x")
    e1 = v1 = 0.0
    for t in times:
        nat = sum(1 for tt, _, g in subjects if tt >= t and g == "x")
        nbt = sum(1 for tt, _, g in subjects if tt >= t and g == "y")
        nt = nat + nbt
        dt = sum(1 for tt, e, _ in subjects if tt == t and e == 1)
        e1 += dt * nat / nt
        if nt > 1:
            v1 += dt * nat / nt * (nbt / nt) * ((nt - dt) / (nt - 1))
    z = (o1 - e1) / (v1 ** 0.5)

    assert (got.n_a, got.n_b, got.obs_a) == (5, 5, o1)
    assert abs(got.exp_a - round(e1, 6)) < 1e-9
    assert abs(got.z_lr - round(z, 6)) < 1e-6
    assert got.significant == (abs(z) > 1.96)
    # the t=12 terminal time has nt=1 (only the last b subject at
    # risk): the pinned variance term kept v1 finite
    assert got.z_lr == got.z_lr  # not NaN


def test_cuped_matches_numpy_reference(spark):
    """operators.analytics.cuped_adjusted_diff vs a numpy
    recomputation on correlated (x, y) units: theta = cov/var pooled,
    the adjusted diff shifts by theta times the covariate imbalance,
    and var_reduction equals the pooled r² — also checks the key
    CUPED property that with ZERO covariate imbalance between groups
    the adjusted diff equals the raw diff."""
    import numpy as np

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cuped_adjusted_diff,
    )

    rng = np.random.RandomState(7)
    n = 400
    x = rng.randint(0, 10_000, n)
    y = (0.6 * x + rng.randint(0, 3_000, n)).astype("int64")
    g = np.where(np.arange(n) % 2 == 0, "a", "b")
    rows = [(int(yy), int(xx), gg) for yy, xx, gg in zip(y, x, g)]
    got = cuped_adjusted_diff(
        spark.createDataFrame(rows, "y long, x long, g string")
    ).collect()[0]

    theta = np.cov(x, y, bias=False)[0, 1] / np.var(x, ddof=1)
    ya, yb = y[g == "a"], y[g == "b"]
    xa, xb = x[g == "a"], x[g == "b"]
    raw = (ya.mean() - yb.mean()) / 100
    adj = raw - theta * (xa.mean() - xb.mean()) / 100
    r2 = np.corrcoef(x, y)[0, 1] ** 2

    assert (got.n_a, got.n_b) == (200, 200)
    # the kernel's moment form divides by n (not n-1) in BOTH the
    # covariance and variance, so theta is identical either way
    assert abs(got.theta - theta) < 1e-6
    assert abs(got.diff_raw - raw) < 1e-6
    assert abs(got.diff_cuped - adj) < 1e-6
    assert abs(got.var_reduction - r2) < 1e-6
    assert 0.5 < got.var_reduction < 1.0  # strongly correlated by design


def test_ccf_matches_numpy_reference(spark):
    """operators.analytics.ccf_lags vs numpy corrcoef over the shifted
    overlap windows, on a pair of series where b LEADS a by exactly 2
    steps — the ccf must peak at lag +2 and the symmetry
    ccf_ab(k) == corr(a_t, b_{t-k}) must hold at every lag."""
    import numpy as np

    from lambda_refarch_mapreduce_spark.operators.analytics import ccf_lags

    rng = np.random.RandomState(11)
    n, lead = 60, 2
    b = rng.randint(0, 1000, n + lead)
    a = b[:-lead] * 3 + rng.randint(0, 50, n)  # a_t tracks b_{t-2}
    b = b[lead:]  # align: now a_t correlates with b at lag +2... or -2?
    # construct frames: key = t
    rows = [(int(t), int(a[t]), int(b[t])) for t in range(n)]
    got = {
        r.lag: (r.n_obs, r.ccf)
        for r in ccf_lags(
            spark.createDataFrame(rows, "k long, a long, b long"),
            "k",
            "a",
            "b",
            5,
        ).collect()
    }

    for lag in range(-5, 6):
        # pairs (a_t, b_{t-lag}) for valid t
        ts = [t for t in range(n) if 0 <= t - lag < n]
        av = np.array([a[t] for t in ts], dtype=float)
        bv = np.array([b[t - lag] for t in ts], dtype=float)
        want = np.corrcoef(av, bv)[0, 1]
        n_obs, ccf = got[lag]
        assert n_obs == len(ts), lag
        assert abs(ccf - want) < 1e-6, (lag, ccf, want)
    # a tracks b shifted 2 back AFTER b's realignment: a_t ~ b_{t+2-2}
    # = b_t... derive the peak from the reference values instead of
    # trusting construction arithmetic
    peak = max(got, key=lambda k: got[k][1])
    want_peak = max(
        range(-5, 6),
        key=lambda lag: np.corrcoef(
            np.array(
                [a[t] for t in range(n) if 0 <= t - lag < n], dtype=float
            ),
            np.array(
                [b[t - lag] for t in range(n) if 0 <= t - lag < n],
                dtype=float,
            ),
        )[0, 1],
    )
    assert peak == want_peak
    assert got[peak][1] > 0.9


def test_table_diff_hand_computed(spark):
    """operators.analytics.table_diff vs a hand-built pair of
    snapshots covering every class — added, removed, changed (one
    column / several columns / NULL transitions), unchanged (including
    NULL == NULL, which must read UNchanged under null-safe
    comparison)."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        table_diff,
    )

    old = spark.createDataFrame(
        [
            (1, "a", 10.0),     # unchanged
            (2, None, 20.0),    # unchanged, NULL survives
            (3, "c", 30.0),     # changed: v only
            (4, "d", 40.0),     # changed: both columns
            (5, "e", None),     # changed: NULL -> value
            (6, "f", 60.0),     # removed
        ],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, None, 20.0),
            (3, "c", 31.0),
            (4, "D", 41.0),
            (5, "e", 50.0),
            (7, "g", 70.0),     # added
        ],
        "k long, s string, v double",
    )
    got = table_diff(old, new, ["k"], ["s", "v"]).collect()[0]
    assert (got.n_added, got.n_removed) == (1, 1)
    assert (got.n_changed, got.n_unchanged) == (3, 2)
    assert (got.chg_s, got.chg_v) == (1, 3)


def test_mmr_rerank_matches_python_greedy(spark):
    """operators.similarity.mmr_rerank vs a hand-rolled greedy MMR on
    a candidate set engineered so pure relevance and diversified
    orders DIFFER (two near-identical top candidates): the operator
    must reproduce the python greedy's exact pick order and scores,
    and must NOT pick both near-duplicates early the way plain top-k
    would."""
    import math

    from lambda_refarch_mapreduce_spark.operators.similarity import (
        mmr_rerank,
    )

    # 4-dim unit-ish vectors: c0 and c1 nearly identical (both highly
    # relevant), c2 orthogonal-ish, c3 in between
    cands = {
        0: ([1.0, 0.0, 0.0, 0.0], 0.95),
        1: ([0.999, 0.04, 0.0, 0.0], 0.94),
        2: ([0.0, 1.0, 0.0, 0.0], 0.80),
        3: ([0.5, 0.5, 0.7, 0.0], 0.85),
    }
    rows = [(i, v, rel) for i, (v, rel) in cands.items()]
    df = spark.createDataFrame(
        rows, "neighbor_id long, cv array<double>, cosine double"
    )
    lam, k = 0.7, 3
    got = [
        (r.pick, r.neighbor_id, r.rel, r.mmr_score)
        for r in sorted(
            mmr_rerank(df, "neighbor_id", "cv", "cosine", k, lam).collect()
        )
    ]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6)

    sel, remaining = [], dict(cands)
    want = []
    for i in range(k):
        best = None
        for cid, (v, rel) in sorted(remaining.items()):
            ms = max((cos(v, cands[s][0]) for s in sel), default=0.0)
            score = lam * rel - (1.0 - lam) * ms
            if best is None or score > best[1] + 1e-12:
                best = (cid, score, rel)
        want.append((i, best[0], best[2], round(best[1], 6)))
        sel.append(best[0])
        del remaining[best[0]]

    assert got == want
    # diversity actually happened: the near-duplicate of pick 0 was
    # NOT taken second (plain relevance order would be 0, 1, ...)
    assert got[0][1] == 0 and got[1][1] != 1


def test_round8_kernel_invariances(spark):
    """Structural invariances of the round-8 kernels — properties any
    correct implementation must satisfy regardless of data:

    - log-rank: swapping the two groups flips z's sign exactly and
      preserves |z| (O-E for group b is -(O-E) for a; V is symmetric);
    - CCF: ccf_ab(k) == ccf_ba(-k) at every lag (cross-correlation
      mirror symmetry);
    - CUPED: shifting every unit's covariate by a constant changes
      NOTHING (theta, both diffs, var_reduction are shift-invariant
      moments);
    - table_diff: diff(x, x) classifies every key unchanged, and
      swapping the snapshots swaps added with removed while changed
      counts stay put."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        ccf_lags,
        cuped_adjusted_diff,
        log_rank_from_subjects,
        table_diff,
    )

    # --- log-rank sign flip
    subjects = [
        (2, 1, "x"), (4, 1, "x"), (4, 0, "x"), (9, 1, "x"), (9, 0, "x"),
        (3, 1, "y"), (4, 1, "y"), (7, 0, "y"), (8, 1, "y"), (12, 1, "y"),
    ]
    df = spark.createDataFrame(subjects, "t long, event int, g string")
    ab = log_rank_from_subjects(df, "t", "event", "g", "x", "y").collect()[0]
    ba = log_rank_from_subjects(df, "t", "event", "g", "y", "x").collect()[0]
    assert (ab.n_a, ab.n_b) == (ba.n_b, ba.n_a)
    assert abs(ab.z_lr + ba.z_lr) < 2e-6  # sign flip (6dp rounding slack)
    assert ab.significant == ba.significant

    # --- CCF mirror symmetry
    rows = [(t, (t * 7) % 13, (t * 3) % 11) for t in range(40)]
    sdf = spark.createDataFrame(rows, "k long, a long, b long")
    ab = {r.lag: r.ccf for r in ccf_lags(sdf, "k", "a", "b", 4).collect()}
    ba = {r.lag: r.ccf for r in ccf_lags(sdf, "k", "b", "a", 4).collect()}
    for lag in range(-4, 5):
        assert abs(ab[lag] - ba[-lag]) < 2e-6, lag

    # --- CUPED covariate-shift invariance
    units = [(i * 13 % 997, i * 7 % 503, "a" if i % 2 else "b")
             for i in range(300)]
    u = spark.createDataFrame(units, "y long, x long, g string")
    shifted = u.selectExpr("y", "x + 10000 AS x", "g")
    r1 = cuped_adjusted_diff(u).collect()[0]
    r2 = cuped_adjusted_diff(shifted).collect()[0]
    assert r1 == r2

    # --- table_diff reflexivity and swap
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "B", 2.0), (3, "c", 3.5), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    same = table_diff(old, old, ["k"], ["s", "v"]).collect()[0]
    assert (same.n_added, same.n_removed, same.n_changed) == (0, 0, 0)
    assert same.n_unchanged == 3
    fwd = table_diff(old, new, ["k"], ["s", "v"]).collect()[0]
    rev = table_diff(new, old, ["k"], ["s", "v"]).collect()[0]
    assert (fwd.n_added, fwd.n_removed) == (rev.n_removed, rev.n_added)
    assert (fwd.n_changed, fwd.n_unchanged) == (rev.n_changed, rev.n_unchanged)
    assert (fwd.chg_s, fwd.chg_v) == (rev.chg_s, rev.chg_v) == (1, 1)


def test_interval_overlap_join_equals_bruteforce(spark):
    """operators.relational.interval_overlap_join vs a brute-force
    theta join on adversarial intervals: touching endpoints (inclusive
    overlap), containment, identical intervals, bucket-boundary
    straddlers, and intervals much longer than the bucket width (high
    fan-out) — every pair exactly ONCE (the canonical-bucket dedup),
    and the plan stays an equi-join (no CartesianProduct / BNLJ)."""
    from lambda_refarch_mapreduce_spark.operators.relational import (
        interval_overlap_join,
    )

    ivals = [
        (1, "g", 0, 10), (2, "g", 10, 20),   # touching: overlap at 10
        (3, "g", 11, 12), (4, "g", 5, 40),    # containment + long
        (5, "g", 15, 16), (6, "g", 41, 50),   # disjoint from 4
        (7, "h", 0, 100), (8, "h", 95, 97),   # other key, long interval
        (9, "h", 0, 100),                     # identical-range pair
    ]
    df = spark.createDataFrame(ivals, "k long, g string, s long, e long")
    left = df.select("g", F.col("k").alias("ka"), F.col("s").alias("sa"), F.col("e").alias("ea"))
    right = df.select("g", F.col("k").alias("kb"), F.col("s").alias("sb"), F.col("e").alias("eb"))
    out = interval_overlap_join(
        left, right, ["g"], "sa", "ea", "sb", "eb", 8
    ).filter(F.col("ka") < F.col("kb"))
    got = sorted((r.ka, r.kb) for r in out.collect())
    want = sorted(
        (a[0], b[0])
        for a in ivals
        for b in ivals
        if a[1] == b[1] and a[0] < b[0] and a[2] <= b[3] and b[2] <= a[3]
    )
    assert got == want
    # exactly once each (canonical-bucket dedup under high fan-out)
    assert len(got) == len(set(got))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_overlap_join_integer_bucketing_edges(spark):
    """ADVICE r8: buckets must come from exact INTEGER floor division
    — (a) negative coordinates get true floor buckets (no double-width
    bucket straddling zero), (b) coordinates beyond 2^53 (epoch-nano
    scale, where double division silently misbuckets) still pair
    correctly, and every pair appears exactly once."""
    from lambda_refarch_mapreduce_spark.operators.relational import (
        interval_overlap_join,
    )

    big = 1 << 60  # far past double's 2^53 integer-exact range
    ivals = [
        # mixed-sign straddlers around zero
        (1, "g", -7, -1), (2, "g", -3, 4), (3, "g", 2, 9),
        (4, "g", -20, -15),                    # disjoint negative
        # epoch-nano-scale coordinates: adjacent and overlapping
        (5, "h", big, big + 10), (6, "h", big + 5, big + 20),
        (7, "h", big + 21, big + 30),          # touching NOT (21 > 20)
        (8, "h", big - 8, big + 1),
    ]
    df = spark.createDataFrame(ivals, "k long, g string, s long, e long")
    left = df.select(
        "g", F.col("k").alias("ka"), F.col("s").alias("sa"),
        F.col("e").alias("ea"),
    )
    right = df.select(
        "g", F.col("k").alias("kb"), F.col("s").alias("sb"),
        F.col("e").alias("eb"),
    )
    out = interval_overlap_join(
        left, right, ["g"], "sa", "ea", "sb", "eb", 8
    ).filter(F.col("ka") < F.col("kb"))
    got = sorted((r.ka, r.kb) for r in out.collect())
    want = sorted(
        (a[0], b[0])
        for a in ivals
        for b in ivals
        if a[1] == b[1] and a[0] < b[0] and a[2] <= b[3] and b[2] <= a[3]
    )
    assert got == want
    assert len(got) == len(set(got))


def test_interval_overlap_join_auto_width_and_fanout_guard(spark):
    """VERDICT r8 #4: bucket_width=None derives the width from the
    build side's p90 interval length (one bounded job) and still
    returns the exact pair set; max_fanout raises LOUDLY on a row
    whose interval would explode, instead of silently fanning out."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    from lambda_refarch_mapreduce_spark.operators.relational import (
        interval_overlap_join,
    )

    ivals = [
        (1, "g", 0, 9), (2, "g", 5, 14), (3, "g", 20, 29),
        (4, "g", 8, 22), (5, "h", 100, 109), (6, "h", 104, 113),
    ]
    df = spark.createDataFrame(ivals, "k long, g string, s long, e long")
    left = df.select(
        "g", F.col("k").alias("ka"), F.col("s").alias("sa"),
        F.col("e").alias("ea"),
    )
    right = df.select(
        "g", F.col("k").alias("kb"), F.col("s").alias("sb"),
        F.col("e").alias("eb"),
    )
    out = interval_overlap_join(
        left, right, ["g"], "sa", "ea", "sb", "eb"  # auto width
    ).filter(F.col("ka") < F.col("kb"))
    got = sorted((r.ka, r.kb) for r in out.collect())
    want = sorted(
        (a[0], b[0])
        for a in ivals
        for b in ivals
        if a[1] == b[1] and a[0] < b[0] and a[2] <= b[3] and b[2] <= a[3]
    )
    assert got == want

    # one 1000-bucket interval against max_fanout=16: the tripwire
    # fires at scan time with the realized fan-out in the message
    wide = spark.createDataFrame(
        [(9, "g", 0, 3999)], "k long, g string, s long, e long"
    )
    wleft = wide.select(
        "g", F.col("k").alias("ka"), F.col("s").alias("sa"),
        F.col("e").alias("ea"),
    )
    bad = interval_overlap_join(
        wleft, right, ["g"], "sa", "ea", "sb", "eb",
        bucket_width=4, max_fanout=16,
    )
    with pytest.raises(SparkRuntimeException, match="interval spans"):
        bad.collect()
    # bucket_width must be positive
    with pytest.raises(ValueError, match="bucket_width"):
        interval_overlap_join(
            wleft, right, ["g"], "sa", "ea", "sb", "eb", bucket_width=0
        )


def test_table_diff_and_mmr_edge_guards(spark):
    """ADVICE r8 edge guards: table_diff raises a clear ValueError on
    empty key/compare column lists (previously F.when(None, ...)
    crashed deep in Catalyst); mmr_rerank raises on k <= 0 and an
    empty candidate frame, and clamps k to the candidate count
    instead of burning empty jobs."""
    import pytest
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        table_diff,
    )
    from lambda_refarch_mapreduce_spark.operators.similarity import (
        mmr_rerank,
    )

    df = spark.createDataFrame([(1, "a")], "k long, v string")
    with pytest.raises(ValueError, match="compare_cols"):
        table_diff(df, df, ["k"], [])
    with pytest.raises(ValueError, match="key_cols"):
        table_diff(df, df, [], ["v"])

    cands = spark.createDataFrame(
        [(1, [1.0, 0.0], 0.9), (2, [0.0, 1.0], 0.8)],
        "neighbor_id long, cv array<double>, cosine double",
    )
    with pytest.raises(ValueError, match="k must be positive"):
        mmr_rerank(cands, k=0)
    with pytest.raises(ValueError, match="empty"):
        mmr_rerank(cands.filter("neighbor_id < 0"), k=3)
    # k beyond the candidate count clamps: exactly |C| picks come back
    got = mmr_rerank(cands, k=10).collect()
    assert sorted(r.neighbor_id for r in got) == [1, 2]
    assert sorted(r.pick for r in got) == [0, 1]


def test_spearman_rho_matches_numpy_bruteforce(spark):
    """operators.analytics.spearman_rho vs a hand-rolled average-rank
    Spearman in numpy on adversarial data: heavy ties in both
    variables, a negative-association block, and a constant run."""
    import numpy as np
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        spearman_rho,
    )

    xs = [1, 1, 2, 2, 2, 3, 5, 5, 8, 9, 9, 9, 4, 4, 7]
    ys = [9, 8, 8, 7, 7, 6, 5, 5, 2, 1, 1, 2, 6, 6, 3]
    df = spark.createDataFrame(list(zip(xs, ys)), "x long, y long")
    got = spearman_rho(df, "x", "y").collect()[0]

    def avg_ranks(v):
        v = np.asarray(v, dtype=float)
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v))
        i = 0
        sorted_v = v[order]
        while i < len(v):
            j = i
            while j < len(v) and sorted_v[j] == sorted_v[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2.0  # 1-based average
            i = j
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    want = float(np.corrcoef(rx, ry)[0, 1])
    assert got.n_rows == len(xs)
    assert abs(got.rho - want) < 1e-6


def test_kendall_tau_b_matches_bruteforce(spark):
    """operators.analytics.kendall_tau_b vs the O(n^2) textbook
    definition (strict concordance, tie-corrected denominator)."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        kendall_tau_b,
    )

    rows = [
        (1, 10, 5), (2, 10, 7), (3, 12, 7), (4, 15, 2), (5, 15, 2),
        (6, 9, 9), (7, 20, 1), (8, 11, 7), (9, 13, 4), (10, 13, 8),
    ]
    df = spark.createDataFrame(rows, "k long, a long, b long")
    got = kendall_tau_b(df, "k", "a", "b").collect()[0]

    import math

    n = len(rows)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = rows[j][1] - rows[i][1]
            dy = rows[j][2] - rows[i][2]
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
    n0 = n * (n - 1) // 2

    def tie_pairs(idx):
        from collections import Counter

        c = Counter(r[idx] for r in rows)
        return sum(v * (v - 1) // 2 for v in c.values())

    n1, n2 = tie_pairs(1), tie_pairs(2)
    want = (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))
    assert (got.n_obs, got.n_pairs) == (n, n0)
    assert (got.concordant, got.discordant) == (conc, disc)
    assert abs(got.tau_b - want) < 1e-6


def test_theil_sen_matches_bruteforce(spark):
    """operators.analytics.theil_sen vs the brute-force lower-median
    of all pairwise slopes (and intercepts at that slope) — including
    an outlier point OLS would chase."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        theil_sen,
    )

    pts = [(0, 10), (1, 12), (2, 14), (3, 16), (4, 500), (5, 20),
           (6, 22), (8, 26), (9, 28)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = theil_sen(df, "x", "y").collect()[0]

    slopes = sorted(
        (pts[j][1] - pts[i][1]) / (pts[j][0] - pts[i][0])
        for i in range(len(pts))
        for j in range(i + 1, len(pts))
    )
    k = len(slopes)
    sen = slopes[(k + 1) // 2 - 1]  # lower median, 1-based -> 0-based
    resid = sorted(y - sen * x for x, y in pts)
    ic = resid[(len(pts) + 1) // 2 - 1]
    assert (got.n_obs, got.n_pairs) == (len(pts), k)
    assert abs(got.sen_slope - round(sen, 6)) < 1e-9
    assert abs(got.sen_intercept - round(ic, 6)) < 1e-9
    # robustness: the outlier at x=4 does not drag the slope off 2
    assert abs(got.sen_slope - 2.0) < 0.5


def test_qq_quantile_table_matches_bruteforce(spark):
    """operators.analytics.qq_quantile_table vs brute-force Type-1
    (lower) quantiles: the smallest value whose cumulative count
    reaches i/n_grid of the group — including unequal group sizes."""
    import math
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        qq_quantile_table,
    )

    a_vals = [1, 2, 2, 3, 5, 8, 8, 9, 12, 20, 20]
    b_vals = [4, 5, 7, 7, 10, 11, 15, 30]
    rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r.grid_i: (r.q_a, r.q_b, r.shift)
        for r in qq_quantile_table(df, "a", "b", "g", "v", 10).collect()
    }

    def q1(vals, i, grid):
        vals = sorted(vals)
        n = len(vals)
        # smallest index with (idx+1) * grid >= i * n
        for idx, v in enumerate(vals):
            if (idx + 1) * grid >= i * n:
                return v
        return vals[-1]

    for i in range(1, 10):
        qa, qb = q1(a_vals, i, 10), q1(b_vals, i, 10)
        assert got[i] == (qa, qb, qb - qa), i


def test_jackknife_ratio_se_matches_python_loop(spark):
    """jackknife_ratio_se_daily's arithmetic vs an explicit python
    leave-one-out loop on the same sf0.001 day frame."""
    import math
    from lambda_refarch_mapreduce_spark.plans.catalog import REGISTRY
    from lambda_refarch_mapreduce_spark.plans import (  # noqa: F401
        catalog_analytics,
    )
    from lambda_refarch_mapreduce_spark import load_table

    sf = "/root/testdata/sf0.001"
    got = REGISTRY["jackknife_ratio_se_daily"].spark(spark, sf).collect()[0]

    day = (
        load_table(spark, sf, "orders")
        .selectExpr(
            "to_date(o_orderdate) AS dd",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .groupBy("dd")
        .agg(F.sum("cents").alias("r"), F.count(F.lit(1)).alias("c"))
        .collect()
    )
    rows = sorted((r.dd, r.r, r.c) for r in day)
    S = sum(r for _, r, _ in rows)
    C = sum(c for _, _, c in rows)
    n = len(rows)
    th = [(S - r) / (C - c) for _, r, c in rows]
    m = sum(th) / n
    se = math.sqrt((n - 1) / n * sum((x - m) ** 2 for x in th))
    assert got.n_days == n
    assert abs(got.theta_cents - round(S / C, 6)) < 1e-9
    assert abs(got.se_jack - se) < 1e-6


def test_kendall_and_theil_sen_single_point_series(spark):
    """Degenerate single-row series: sequence(1, n-1) with n=1 yields
    a DESCENDING [1, 0] in Spark, which would self-pair every row at
    gap 0 (a NaN slope for theil_sen) — the gap filter keeps the pair
    set empty instead."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        kendall_tau_b,
        theil_sen,
    )

    one = spark.createDataFrame([(1, 5, 7)], "k long, a long, b long")
    kt = kendall_tau_b(one, "k", "a", "b").collect()[0]
    assert (kt.n_obs, kt.n_pairs) == (1, 0)
    assert (kt.concordant, kt.discordant) == (0, 0)

    ts = theil_sen(
        one.select("a", F.col("b").alias("y"), F.col("a").alias("x")),
        "x",
        "y",
    ).collect()[0]
    assert (ts.n_obs, ts.n_pairs) == (1, 0)
    assert ts.sen_slope is None  # no pairs -> no slope, not NaN


def test_spearman_constant_column_is_null_not_error(spark):
    """A constant column has zero rank variance: rho must come back
    NULL, not an ANSI divide-by-zero error."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        spearman_rho,
    )

    df = spark.createDataFrame(
        [(7, 1), (7, 2), (7, 3)], "x long, y long"
    )
    got = spearman_rho(df, "x", "y").collect()[0]
    assert got.n_rows == 3
    assert got.rho is None


def test_spearman_is_pairwise_complete_under_nulls(spark):
    """ADVICE r9: a NULL in either variable must drop the ROW before
    ranking (pairwise-complete), not silently inflate the other
    variable's cumulative counts — rho over a frame with NULLs equals
    rho over just its complete pairs, and n_rows counts only those."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        spearman_rho,
    )

    complete = [(3, 9), (1, 2), (4, 7), (2, 2), (5, 11)]
    noisy = complete + [(None, 1), (None, 100), (0, None), (6, None)]
    got = spearman_rho(
        spark.createDataFrame(noisy, "x long, y long"), "x", "y"
    ).collect()[0]
    want = spearman_rho(
        spark.createDataFrame(complete, "x long, y long"), "x", "y"
    ).collect()[0]
    assert got.n_rows == len(complete)
    assert got.rho == want.rho


def test_nelson_aalen_matches_python_reference(spark):
    """operators.analytics.nelson_aalen_from_counts vs a hand-rolled
    Nelson-Aalen on a small right-censored cohort (H = sum d/n,
    var = sum d/n^2 over event times), and the streaming monitor's
    nelson_aalen_now serves the identical values from committed
    chunks (shared kernel, additive counts)."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        nelson_aalen_from_counts,
    )

    # (t, d, c): deaths and censorings per time
    counts = [(1, 2, 0), (2, 1, 1), (4, 2, 0), (5, 0, 1), (7, 1, 0)]
    df = spark.createDataFrame(counts, "t long, d long, c long")
    got = {
        r.t: (r.n_risk, r.n_events, r.cum_hazard, r.cum_hazard_var)
        for r in nelson_aalen_from_counts(df).collect()
    }

    n = sum(d + c for _, d, c in counts)
    h = v = 0.0
    want = {}
    for t, d, c in counts:
        if d > 0:
            h += d / n
            v += d / (n * n)
            want[t] = (n, d, round(h, 6), round(v, 6))
        n -= d + c
    assert set(got) == set(want)
    for t in want:
        nr, d, wh, wv = want[t]
        gnr, gd, gh, gv = got[t]
        assert (gnr, gd) == (nr, d), t
        assert abs(gh - wh) < 1e-9 and abs(gv - wv) < 1e-9, t

    # chunked counts re-collapse identically (the streaming contract)
    split = spark.createDataFrame(
        [(1, 1, 0), (1, 1, 0), (2, 1, 1), (4, 2, 0), (5, 0, 1),
         (7, 1, 0)],
        "t long, d long, c long",
    )
    got2 = {
        r.t: (r.n_risk, r.n_events, r.cum_hazard, r.cum_hazard_var)
        for r in nelson_aalen_from_counts(split).collect()
    }
    assert got2 == got


def test_mann_kendall_matches_bruteforce(spark):
    """operators.analytics.mann_kendall_trend vs the O(n^2) textbook
    definition (S, tie-corrected variance, continuity-adjusted z) on
    a tied, mixed-direction series — and a strictly increasing series
    must read 'increasing'."""
    import math
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        mann_kendall_trend,
    )

    ys = [3, 5, 5, 4, 7, 7, 7, 9, 8, 12, 11, 15]
    rows = [(t, y) for t, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "t long, y long")
    got = mann_kendall_trend(df, "t", "y").collect()[0]

    n = len(ys)
    s = sum(
        (ys[j] > ys[i]) - (ys[j] < ys[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie = sum(
        c * (c - 1) * (2 * c + 5) for c in Counter(ys).values() if c > 1
    )
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18
    z = (s - 1) / math.sqrt(var) if s > 0 else (
        (s + 1) / math.sqrt(var) if s < 0 else 0.0
    )
    assert (got.n_obs, got.s_mk) == (n, s)
    assert abs(got.var_s - round(var, 6)) < 1e-9
    assert abs(got.z_mk - round(z, 6)) < 1e-9

    inc = spark.createDataFrame(
        [(t, t * 2) for t in range(12)], "t long, y long"
    )
    assert mann_kendall_trend(inc, "t", "y").collect()[0].trend == (
        "increasing"
    )


def test_rank_stat_structural_invariances(spark):
    """r8-style invariance guards beyond the fixed-data oracles:
    - spearman/kendall are invariant under any strictly monotone
      transform of either variable, and negate under reversal;
    - theil_sen's slope is shift-invariant in y (intercept absorbs
      the shift) and negates under y-reversal;
    - mann_kendall's S negates and the trend label flips under
      y-reversal."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        kendall_tau_b,
        mann_kendall_trend,
        spearman_rho,
        theil_sen,
    )

    # 8 points, one duplicate-x pair skipped -> 27 defined slopes:
    # an ODD count, so the exact lower median is the unique middle
    # element and negation symmetry holds (with an even count the
    # LOWER median of the negated multiset is the negated UPPER
    # median — a convention property, not a bug)
    rows = [
        (1, 3, 9), (2, 5, 7), (3, 5, 8), (4, 8, 4), (5, 9, 4),
        (6, 12, 2), (7, 15, 1), (8, 20, 0),
    ]
    df = spark.createDataFrame(rows, "k long, x long, y long")

    base_rho = spearman_rho(df, "x", "y").collect()[0].rho
    # strictly monotone transform of x: ranks unchanged
    mono = df.selectExpr("k", "x * x + 10 AS x", "y")
    assert spearman_rho(mono, "x", "y").collect()[0].rho == base_rho
    # reversal of y: rho negates
    neg = df.selectExpr("k", "x", "-y AS y")
    assert spearman_rho(neg, "x", "y").collect()[0].rho == -base_rho

    base_tau = kendall_tau_b(df, "k", "x", "y").collect()[0].tau_b
    assert (
        kendall_tau_b(mono, "k", "x", "y").collect()[0].tau_b == base_tau
    )
    assert (
        kendall_tau_b(neg, "k", "x", "y").collect()[0].tau_b == -base_tau
    )

    ts0 = theil_sen(df, "x", "y").collect()[0]
    shifted = df.selectExpr("x", "y + 100 AS y")
    ts1 = theil_sen(shifted, "x", "y").collect()[0]
    assert ts1.sen_slope == ts0.sen_slope
    assert abs(ts1.sen_intercept - (ts0.sen_intercept + 100)) < 1e-6
    flipped = df.selectExpr("x", "-y AS y")
    ts2 = theil_sen(flipped, "x", "y").collect()[0]
    assert ts2.sen_slope == -ts0.sen_slope

    mk0 = mann_kendall_trend(df, "x", "y").collect()[0]
    mk1 = mann_kendall_trend(flipped, "x", "y").collect()[0]
    assert mk1.s_mk == -mk0.s_mk and mk1.var_s == mk0.var_s
    flip = {"increasing": "decreasing", "decreasing": "increasing"}
    assert mk1.trend == flip.get(mk0.trend, mk0.trend)


def test_holt_winters_matches_python_reference(spark):
    """operators.analytics.holt_winters_from_series vs a sequential
    python Holt-Winters (classic two-season init) on a trending
    weekly-seasonal series — fold equality to 1e-9, and the one-step
    forecast tracks the next point of the noise-free pattern. Short
    groups (< 2m) come back NULL, and the fold is exactly
    sequential-order equal."""
    m = 7
    season = [5, -3, 0, 2, -4, 1, -1]
    ys = [
        round(20 + 0.5 * t + season[t % m], 3) for t in range(35)
    ]
    rows = [("g", t, int(y * 1000)) for t, y in enumerate(ys)]
    rows += [("short", t, 100 * t) for t in range(5)]
    df = spark.createDataFrame(rows, "k string, t long, v long")

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        holt_winters_from_series,
    )

    got = {
        r.k: r
        for r in holt_winters_from_series(
            df, ["k"], ["t"], "v", 0.3, 0.1, 0.2, m
        ).collect()
    }

    xs = [v for _, _, v in rows[:35]]
    l = sum(xs[:m]) / m
    b = (sum(xs[m : 2 * m]) / m - l) / m
    s = [x - l for x in xs[:m]]
    for x in xs[m:]:
        lt = 0.3 * (x - s[0]) + 0.7 * (l + b)
        bt = 0.1 * (lt - l) + 0.9 * b
        st = 0.2 * (x - lt) + 0.8 * s[0]
        s = s[1:] + [st]
        l, b = lt, bt
    r = got["g"]
    assert r.n_obs == 35
    assert abs(r.level - round(l, 6)) < 1e-9
    assert abs(r.trend - round(b, 6)) < 1e-9
    assert abs(r.season_next - round(s[0], 6)) < 1e-9
    assert abs(r.forecast_next - round(l + b + s[0], 6)) < 1e-9
    # forecast sanity on the noise-free pattern: next value is
    # 20 + 0.5*35 + season[0], in milli-units; HW converges close
    true_next = (20 + 0.5 * 35 + season[35 % m]) * 1000
    assert abs(r.forecast_next - true_next) < 0.03 * true_next

    sh = got["short"]
    assert sh.n_obs == 5
    assert sh.level is None and sh.forecast_next is None


def test_rolling_backtest_holt_matches_python_reference(spark):
    """operators.analytics.rolling_backtest_holt vs a sequential
    Python backtest using the STANDARD Holt recursion (the kernel
    folds the single-reference trend rewrite — algebraically equal,
    so metrics agree to 1e-9). Seeding is the closed-form invariant:
    Holt state after consuming (x1, x2) with l1=x1, b1=x2-x1 is
    exactly (l=x2, b=x2-x1) for any alpha/beta, so scored forecasts
    start honestly at x3. Short groups emit NULL metrics."""
    import math

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        rolling_backtest_holt,
    )

    a, beta = 0.3, 0.1
    ys = [100, 103, 99, 108, 112, 107, 115, 121, 118, 126, 124, 131]
    rows = [("g", t, y) for t, y in enumerate(ys)]
    rows += [("one", 0, 50)]
    rows += [("two", 0, 50), ("two", 1, 60)]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    got = {
        r.k: r
        for r in rolling_backtest_holt(
            df, ["k"], ["t"], "v", a, beta
        ).collect()
    }

    l, b, prev = float(ys[1]), float(ys[1] - ys[0]), float(ys[1])
    eh, en = [], []
    for x in map(float, ys[2:]):
        eh.append(x - (l + b))
        en.append(x - prev)
        lt = a * x + (1 - a) * (l + b)
        bt = beta * (lt - l) + (1 - beta) * b
        l, b, prev = lt, bt, x
    nf = len(ys) - 2
    mae_h = sum(abs(e) for e in eh) / nf
    rmse_h = math.sqrt(sum(e * e for e in eh) / nf)
    mae_n = sum(abs(e) for e in en) / nf
    rmse_n = math.sqrt(sum(e * e for e in en) / nf)
    g = got["g"]
    assert (g.n_obs, g.n_forecasts) == (len(ys), nf)
    assert abs(g.mae_holt - round(mae_h, 6)) < 1e-9
    assert abs(g.rmse_holt - round(rmse_h, 6)) < 1e-9
    assert abs(g.mae_naive - round(mae_n, 6)) < 1e-9
    assert abs(g.rmse_naive - round(rmse_n, 6)) < 1e-9
    assert abs(g.skill_vs_naive - round(1 - rmse_h / rmse_n, 6)) < 1e-9

    for k, n in (("one", 1), ("two", 2)):
        r = got[k]
        assert (r.n_obs, r.n_forecasts) == (n, 0)
        assert r.mae_holt is None and r.skill_vs_naive is None


def test_bh_fdr_step_up_rejects_intermediate_dips(spark):
    """operators.analytics.bh_fdr_from_z: BH is a STEP-UP procedure —
    k_star is the LARGEST rank whose |z| crosses its threshold, and
    every rank at or under k_star rejects, including a rank whose
    own |z| dipped under its threshold. Zero crossings reject
    nothing."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        bh_fdr_from_z,
    )

    thr = [3.0, 2.5, 2.0, 1.8]
    df = spark.createDataFrame(
        [("a", 3.5), ("b", -2.4), ("c", 2.1), ("d", 0.5)],
        "name string, z double",
    )
    got = {
        r.name: r
        for r in bh_fdr_from_z(df, ["name"], "z", thr).collect()
    }
    # rank order by |z| desc: a(1) b(2) c(3) d(4); rank 2 dips
    # (2.4 < 2.5) but rank 3 crosses (2.1 >= 2.0) -> k_star = 3
    assert [got[n].rank_k for n in "abcd"] == [1, 2, 3, 4]
    assert all(got[n].k_star == 3 for n in "abcd")
    assert [got[n].rejected for n in "abcd"] == [True, True, True, False]

    none = spark.createDataFrame(
        [("a", 1.0), ("b", 0.5)], "name string, z double"
    )
    got0 = bh_fdr_from_z(none, ["name"], "z", thr).collect()
    assert all(r.k_star == 0 and not r.rejected for r in got0)


def test_bh_thresholds_shape():
    """analytics.bh_thresholds: monotone decreasing in rank; the last
    rank's threshold is the uncorrected two-sided alpha=q critical
    value Phi^-1(1 - q/2), and rank 1 is the Bonferroni-corrected
    one — BH interpolates between the two."""
    import math

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        bh_thresholds,
        phi_inv,
    )

    ts = bh_thresholds(7, 0.05)
    assert len(ts) == 7
    assert all(ts[i] > ts[i + 1] for i in range(6))
    assert abs(ts[-1] - 1.9599639845400545) < 1e-12
    assert abs(ts[0] - phi_inv(1.0 - 0.05 / 7 / 2.0)) < 1e-12
    # phi_inv really inverts Phi (erf form) across the range used
    for t, k in zip(ts, range(1, 8)):
        p = 0.5 * (1.0 + math.erf(t / math.sqrt(2.0)))
        assert abs(p - (1.0 - (k * 0.05 / 7) / 2.0)) < 1e-14


def test_isotonic_fit_matches_pava_reference(spark):
    """operators.analytics.isotonic_fit_binned (minimax formulation)
    vs a sequential Python PAVA on random weighted binomial bins —
    the two characterizations of the same unique L2 solution must
    agree bin-for-bin. Plus the classic invariants: the fit is
    monotone nondecreasing, preserves the weighted mean exactly, and
    an already-monotone input is a fixed point."""
    import random

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        isotonic_fit_binned,
    )

    def pava(ws, xs):
        blocks = []  # [n_bins, weight, successes]
        for w, x in zip(ws, xs):
            blocks.append([1, w, x])
            # integer cross-multiplication: no float in the reference
            while (
                len(blocks) > 1
                and blocks[-2][2] * blocks[-1][1]
                >= blocks[-1][2] * blocks[-2][1]
            ):
                c2, w2, x2 = blocks.pop()
                blocks[-1][0] += c2
                blocks[-1][1] += w2
                blocks[-1][2] += x2
        out = []
        for c, w, x in blocks:
            out.extend([x / w] * c)
        return out

    rng = random.Random(10)
    for trial in range(8):
        n = rng.randint(1, 12)
        ws = [rng.randint(1, 25) for _ in range(n)]
        xs = [rng.randint(0, w) for w in ws]
        df = spark.createDataFrame(
            [(i, ws[i], xs[i]) for i in range(n)],
            "b long, w long, x long",
        )
        rows = sorted(
            isotonic_fit_binned(df, "b", "w", "x").collect(),
            key=lambda r: r.b,
        )
        want = pava(ws, xs)
        got = [r.iso_rate for r in rows]
        assert len(got) == n
        for g, w in zip(got, want):
            assert abs(g - round(w, 6)) < 1e-9, (trial, got, want)
        # monotone nondecreasing
        assert all(got[i] <= got[i + 1] + 1e-12 for i in range(n - 1))
        # weighted mean preserved (PAVA conserves block sums): use
        # the reference (unrounded) values for the exact identity
        assert (
            abs(
                sum(w * v for w, v in zip(ws, want)) - sum(xs)
            )
            < 1e-6
        )

    # already-monotone input is a fixed point (raw == iso)
    mono = spark.createDataFrame(
        [(0, 10, 1), (1, 10, 3), (2, 10, 7), (3, 10, 9)],
        "b long, w long, x long",
    )
    for r in isotonic_fit_binned(mono, "b", "w", "x").collect():
        assert r.iso_rate == r.raw_rate


def test_seasonal_decompose_matches_python_reference(spark):
    """operators.analytics.seasonal_decompose_additive vs a
    sequential Python reference (classic centered-MA decomposition)
    on a trending weekly-seasonal series — plus the structural
    invariants: trend NULL at the h edge rows and around a gap,
    seasonal indices sum to ~0 across phases, and
    trend + seasonal + remainder == x wherever trend is defined."""
    m, h = 7, 3
    season = [40, -30, 0, 20, -40, 10, 0]
    n = 42
    xs = [1000 + 5 * t + season[t % m] + (t * t) % 11 for t in range(n)]
    rows = [("g", t, xs[t]) for t in range(n) if t != 25]  # gap at 25
    df = spark.createDataFrame(rows, "k string, t long, v long")

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        seasonal_decompose_additive,
    )

    got = {
        r.t: r
        for r in seasonal_decompose_additive(
            df, ["k"], "t", "v", m
        ).collect()
    }
    assert len(got) == n - 1

    # python reference over the same observation list
    ts = [t for t in range(n) if t != 25]
    x = {t: xs[t] for t in ts}
    trend = {}
    for i, t in enumerate(ts):
        lo, hi = i - h, i + h
        if lo < 0 or hi >= len(ts):
            continue
        window = ts[lo : hi + 1]
        if window[-1] - window[0] == m - 1:  # consecutive
            trend[t] = sum(x[u] for u in window) / m
    det = {t: x[t] - trend[t] for t in trend}
    raw = {}
    for j in range(m):
        ph = [det[t] for t in sorted(det) if t % m == j]
        if ph:
            raw[j] = sum(ph) / len(ph)
    cbar = sum(raw[j] for j in sorted(raw)) / m
    seas = {j: raw[j] - cbar for j in raw}

    for t in ts:
        r = got[t]
        if t in trend:
            assert abs(r.trend - round(trend[t], 6)) < 1e-6, t
            assert (
                abs(r.remainder - round(x[t] - trend[t] - seas[t % m], 6))
                < 1e-6
            ), t
        else:
            assert r.trend is None and r.remainder is None, t
        assert abs(r.seasonal - round(seas[t % m], 6)) < 1e-6, t
    # gap poisons the m windows that would span it
    for t in (23, 24, 26, 27, 28):
        assert got[t].trend is None, t
    # seasonal indices centered
    assert abs(sum(seas.values())) < 1e-9


def test_cusum_changepoint_matches_python_reference(spark):
    """operators.analytics.cusum_changepoint vs a brute-force Python
    max-|CUSUM| on a series with a planted mean shift: location,
    statistic and verdict agree; a constant series (zero variance)
    and a single point come back NULL; the Kolmogorov critical value
    matches the textbook 1.358 at alpha=.05."""
    import math

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cusum_changepoint,
        kolmogorov_critical,
    )

    assert abs(kolmogorov_critical(0.05) - 1.358) < 1e-3

    # planted shift: mean 100 for 20 days, mean 160 after, mild noise
    ys = [100 + (t * 7) % 11 for t in range(20)]
    ys += [160 + (t * 5) % 9 for t in range(20, 45)]
    df = spark.createDataFrame(
        [(t + 50, y) for t, y in enumerate(ys)], "t long, y long"
    )
    got = cusum_changepoint(df, "t", "y").collect()[0]

    n, s = len(ys), sum(ys)
    q = sum(y * y for y in ys)
    best = max(
        (abs(n * sum(ys[:i]) - i * s), -i) for i in range(1, n + 1)
    )
    absd, i = best[0], -best[1]
    sd = math.sqrt(q / n - (s / n) ** 2)
    k = absd / (n * math.sqrt(n) * sd)
    assert got.n_obs == n
    assert got.cp_index == i
    assert got.cp_t == i - 1 + 50
    assert abs(got.k_stat - round(k, 6)) < 1e-9
    assert got.significant is True  # a 60%-of-sd*? shift over 25 days
    assert abs(got.mean_before - round(sum(ys[:i]) / i, 6)) < 1e-9
    assert (
        abs(got.mean_after - round(sum(ys[i:]) / (n - i), 6)) < 1e-9
    )

    # no shift: pure alternation stays under the critical value
    flat = spark.createDataFrame(
        [(t, 100 + (t % 2)) for t in range(40)], "t long, y long"
    )
    g2 = cusum_changepoint(flat, "t", "y").collect()[0]
    assert g2.significant is False

    # degenerate: constant series -> zero variance -> NULL verdict
    const = spark.createDataFrame(
        [(t, 7) for t in range(10)], "t long, y long"
    )
    g3 = cusum_changepoint(const, "t", "y").collect()[0]
    assert g3.k_stat is None and g3.significant is None

    one = spark.createDataFrame([(1, 5)], "t long, y long")
    g4 = cusum_changepoint(one, "t", "y").collect()[0]
    assert g4.n_obs == 1 and g4.k_stat is None


def test_anderson_darling_matches_ecdf_reference(spark):
    """operators.analytics.anderson_darling_from_value_counts vs a
    Python reference computed through the CLASSICAL two-sample ECDF
    form A² = (n1*n2/N²)·Σ w_j(F1-F2)²/(H(1-H)) — a different
    algebra path than the kernel's integer rearrangement, so the
    D_j = N*M1 - n1*B factoring is genuinely cross-checked. Plus the
    behavioral sanity: identical samples give A² = 0, a clear shift
    fires the 2.492 verdict, and a pure TAIL shift fires AD."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        anderson_darling_from_value_counts,
    )

    def ref_a2(sa, sb):
        import collections

        ca = collections.Counter(sa)
        cb = collections.Counter(sb)
        vals = sorted(set(sa) | set(sb))
        n1, n2 = len(sa), len(sb)
        nn = n1 + n2
        m1 = b = 0
        a2 = 0.0
        for v in vals:
            m1 += ca.get(v, 0)
            b += ca.get(v, 0) + cb.get(v, 0)
            if b >= nn:
                break
            w = ca.get(v, 0) + cb.get(v, 0)
            f1 = m1 / n1
            f2 = (b - m1) / n2
            h = b / nn
            a2 += w * (f1 - f2) ** 2 / (h * (1 - h))
        return n1 * n2 / nn**2 * a2

    def run(sa, sb):
        rows = [(v, 1, 0) for v in sa] + [(v, 0, 1) for v in sb]
        df = (
            spark.createDataFrame(rows, "v long, ia long, ib long")
            .groupBy("v")
            .agg(F.sum("ia").alias("ca"), F.sum("ib").alias("cb"))
        )
        return anderson_darling_from_value_counts(df).collect()[0]

    import random

    rng = random.Random(3)
    sa = [rng.randint(0, 40) for _ in range(120)]
    sb = [rng.randint(5, 45) for _ in range(90)]
    got = run(sa, sb)
    assert (got.n_a, got.n_b) == (120, 90)
    assert abs(got.a2 - round(ref_a2(sa, sb), 6)) < 1e-9

    same = run(list(range(50)) * 2, list(range(50)) * 2)
    assert same.a2 == 0.0 and same.significant is False

    shifted = run(
        [rng.randint(0, 30) for _ in range(200)],
        [rng.randint(20, 50) for _ in range(200)],
    )
    assert shifted.significant is True

    # pure tail shift: same body, sample b puts 8% of mass far right
    body = [rng.randint(0, 100) for _ in range(500)]
    tail_b = body[:460] + [rng.randint(400, 500) for _ in range(40)]
    t = run(body, tail_b)
    assert abs(t.a2 - round(ref_a2(body, tail_b), 6)) < 1e-9
    assert t.significant is True


def test_seasonal_mann_kendall_matches_bruteforce(spark):
    """operators.analytics.seasonal_mann_kendall vs a brute-force
    Python Hirsch-Slack on a seasonal series — exact S/var equality —
    plus the headline behavioral claims: a PURE weekly cycle (no
    trend) stays 'no_trend' here, and a trend under heavy
    seasonality is detected."""
    m = 7
    season = [0, 300, -250, 120, -80, 40, -130]

    def run(ys, t0=0):
        df = spark.createDataFrame(
            [(t0 + t, y) for t, y in enumerate(ys)], "t long, y long"
        )
        from lambda_refarch_mapreduce_spark.operators.analytics import (
            seasonal_mann_kendall,
        )

        return seasonal_mann_kendall(df, "t", "y", m).collect()[0]

    def brute(ys, t0=0):
        from collections import Counter, defaultdict

        phases = defaultdict(list)
        for t, y in enumerate(ys):
            phases[(t0 + t) % m].append(y)
        s_mk = 0
        var = 0.0
        for vals in phases.values():
            n = len(vals)
            for i in range(n):
                for j in range(i + 1, n):
                    d = vals[j] - vals[i]
                    s_mk += (d > 0) - (d < 0)
            ties = sum(
                c * (c - 1) * (2 * c + 5)
                for c in Counter(vals).values()
            )
            var += (n * (n - 1) * (2 * n + 5) - ties) / 18.0
        return s_mk, var

    # pure seasonality + small deterministic noise: no trend
    ys0 = [1000 + season[t % m] + (t * 3) % 5 for t in range(49)]
    r0 = run(ys0, t0=14)
    s0, v0 = brute(ys0, t0=14)
    assert r0.s_mk == s0
    assert abs(r0.var_s - round(v0, 6)) < 1e-9
    assert r0.n_obs == 49 and r0.n_phases == m
    assert r0.trend == "no_trend"

    # the same seasonality with a real trend underneath: detected
    ys1 = [1000 + 8 * t + season[t % m] + (t * 3) % 5 for t in range(49)]
    r1 = run(ys1)
    s1, v1 = brute(ys1)
    assert r1.s_mk == s1
    assert abs(r1.var_s - round(v1, 6)) < 1e-9
    assert r1.trend == "increasing"

    # ...where PLAIN Mann-Kendall on the pure-cycle series would at
    # minimum pay the cycle as variance; assert the seasonal variant
    # is the sharper instrument: |z_seasonal| > |z_plain| on ys1
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        mann_kendall_trend,
    )

    plain = mann_kendall_trend(
        spark.createDataFrame(
            [(t, y) for t, y in enumerate(ys1)], "t long, y long"
        ),
        "t",
        "y",
    ).collect()[0]
    assert abs(r1.z_mk) > abs(plain.z_mk)


@given(
    bins=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=9),  # weight
            st.integers(min_value=0, max_value=9),  # successes (<= w ok'd below)
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**_PROP_SETTINGS)
def test_isotonic_property_pava_equal(spark, bins):
    """Property (hypothesis): isotonic_fit_binned equals sequential
    PAVA on arbitrary small weighted-binomial bins — including the
    adversarial shapes a seeded RNG rarely lands on (all-equal rates,
    all-zero successes, single bins, long descending runs)."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        isotonic_fit_binned,
    )

    ws = [w for w, _ in bins]
    xs = [min(x, w) for w, x in bins]
    n = len(bins)
    df = spark.createDataFrame(
        [(i, ws[i], xs[i]) for i in range(n)], "b long, w long, x long"
    )
    rows = sorted(
        isotonic_fit_binned(df, "b", "w", "x").collect(),
        key=lambda r: r.b,
    )

    blocks = []
    for w, x in zip(ws, xs):
        blocks.append([1, w, x])
        while (
            len(blocks) > 1
            and blocks[-2][2] * blocks[-1][1]
            >= blocks[-1][2] * blocks[-2][1]
        ):
            c2, w2, x2 = blocks.pop()
            blocks[-1][0] += c2
            blocks[-1][1] += w2
            blocks[-1][2] += x2
    want = []
    for c, w, x in blocks:
        want.extend([x / w] * c)
    got = [r.iso_rate for r in rows]
    assert len(got) == n
    for g, w in zip(got, want):
        assert abs(g - round(w, 6)) < 1e-9, (got, want, ws, xs)
    assert all(got[i] <= got[i + 1] + 1e-12 for i in range(n - 1))


@given(
    ys=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=14
    ),
    a10=st.integers(min_value=1, max_value=9),
    b10=st.integers(min_value=1, max_value=9),
)
@settings(**_PROP_SETTINGS)
def test_backtest_property_matches_sequential(spark, ys, a10, b10):
    """Property (hypothesis): rolling_backtest_holt equals the
    sequential standard-form Holt backtest for arbitrary short
    integer series (negatives, constants, n=1/2 degenerates) and
    arbitrary alpha/beta in (0, 1)."""
    import math

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        rolling_backtest_holt,
    )

    a, beta = a10 / 10.0, b10 / 10.0
    n = len(ys)
    df = spark.createDataFrame(
        [(t, y) for t, y in enumerate(ys)], "t long, v long"
    )
    r = rolling_backtest_holt(df, [], ["t"], "v", a, beta).collect()[0]
    assert (r.n_obs, r.n_forecasts) == (n, max(n - 2, 0))
    if n < 3:
        assert r.mae_holt is None and r.rmse_naive is None
        return
    l, b, prev = float(ys[1]), float(ys[1] - ys[0]), float(ys[1])
    eh, en = [], []
    for x in map(float, ys[2:]):
        eh.append(x - (l + b))
        en.append(x - prev)
        lt = a * x + (1 - a) * (l + b)
        bt = beta * (lt - l) + (1 - beta) * b
        l, b, prev = lt, bt, x
    nf = n - 2
    # 2e-6, not 1e-6: both sides round to 6 decimals, and a true value
    # sitting exactly on a rounding midpoint (e.g. 187.815918/4 =
    # 46.9539795) legitimately rounds apart by exactly 1e-6 between
    # Spark's HALF_UP and Python's repr-based round (hypothesis found
    # the midpoint: ys=[21,0,1,0,0,0], a=b=0.1)
    assert abs(r.mae_holt - round(sum(map(abs, eh)) / nf, 6)) < 2e-6
    assert (
        abs(
            r.rmse_holt
            - round(math.sqrt(sum(e * e for e in eh) / nf), 6)
        )
        < 2e-6
    )
    assert abs(r.mae_naive - round(sum(map(abs, en)) / nf, 6)) < 2e-6
    sse_n = sum(e * e for e in en)
    if sse_n > 0:
        want_skill = 1 - math.sqrt(sum(e * e for e in eh) / nf) / math.sqrt(
            sse_n / nf
        )
        assert abs(r.skill_vs_naive - round(want_skill, 6)) < 2e-6
    else:
        assert r.skill_vs_naive is None


@given(
    ys=st.lists(
        st.integers(min_value=0, max_value=20), min_size=1, max_size=16
    ),
    t0=st.integers(min_value=0, max_value=6),
)
@settings(**_PROP_SETTINGS)
def test_seasonal_mk_property_matches_bruteforce(spark, ys, t0):
    """Property (hypothesis): seasonal_mann_kendall's S and variance
    equal the per-phase brute force for arbitrary short series and
    phase offsets — ties, constant phases, phases with 0/1 members."""
    from collections import Counter, defaultdict

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        seasonal_mann_kendall,
    )

    m = 7
    df = spark.createDataFrame(
        [(t0 + t, y) for t, y in enumerate(ys)], "t long, y long"
    )
    r = seasonal_mann_kendall(df, "t", "y", m).collect()[0]

    phases = defaultdict(list)
    for t, y in enumerate(ys):
        phases[(t0 + t) % m].append(y)
    s_mk, var = 0, 0.0
    for vals in phases.values():
        k = len(vals)
        for i in range(k):
            for j in range(i + 1, k):
                d = vals[j] - vals[i]
                s_mk += (d > 0) - (d < 0)
        ties = sum(
            c * (c - 1) * (2 * c + 5) for c in Counter(vals).values()
        )
        var += (k * (k - 1) * (2 * k + 5) - ties) / 18.0
    assert r.s_mk == s_mk
    assert abs(r.var_s - round(var, 6)) < 1e-9
    assert r.n_obs == len(ys) and r.n_phases == len(phases)
    if var == 0.0:
        assert r.z_mk == 0.0 and r.trend == "no_trend"


def test_bh_fdr_boundary_and_overflow_ranks(spark):
    """bh_fdr_from_z edges: |z| exactly AT its threshold counts as a
    crossing (>= boundary), and a family LARGER than the threshold
    list gives the overflow ranks NULL thresholds — they can never
    set k_star, and since their rank exceeds every in-list rank they
    are never rejected either (the conservative reading of a
    mis-sized family; the dow entry's family is structurally 7)."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        bh_fdr_from_z,
    )

    thr = [2.0, 1.5]
    # boundary: |z| == threshold at rank 1
    df = spark.createDataFrame(
        [("a", 2.0), ("b", 0.1)], "name string, z double"
    )
    got = {r.name: r for r in bh_fdr_from_z(df, ["name"], "z", thr).collect()}
    assert got["a"].k_star == 1 and got["a"].rejected
    assert not got["b"].rejected

    # overflow: 4 tests, 2 thresholds — ranks 3/4 have NULL threshold
    df2 = spark.createDataFrame(
        [("a", 5.0), ("b", 4.0), ("c", 3.0), ("d", 2.5)],
        "name string, z double",
    )
    got2 = {
        r.name: r for r in bh_fdr_from_z(df2, ["name"], "z", thr).collect()
    }
    assert [got2[n].rank_k for n in "abcd"] == [1, 2, 3, 4]
    assert all(r.k_star == 2 for r in got2.values())
    assert [got2[n].rejected for n in "abcd"] == [True, True, False, False]
    assert got2["c"].bh_threshold is None


def test_cusum_changepoint_invariances(spark):
    """cusum_changepoint structure: adding a constant to every value
    leaves (cp_index, k_stat, significance) unchanged (the bridge is
    mean-centered); scaling every value by a positive constant leaves
    k_stat unchanged (sd scales with max|D|); reversing the series
    mirrors the changepoint location."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cusum_changepoint,
    )

    ys = [10, 12, 9, 11, 30, 29, 31, 33, 28]
    n = len(ys)

    def run(vals):
        df = spark.createDataFrame(
            [(t, v) for t, v in enumerate(vals)], "t long, y long"
        )
        return cusum_changepoint(df, "t", "y").collect()[0]

    base = run(ys)
    shifted = run([y + 1000 for y in ys])
    assert (base.cp_index, base.k_stat, base.significant) == (
        shifted.cp_index,
        shifted.k_stat,
        shifted.significant,
    )
    scaled = run([y * 7 for y in ys])
    assert scaled.cp_index == base.cp_index
    assert abs(scaled.k_stat - base.k_stat) < 1e-6
    rev = run(ys[::-1])
    # |D| at index i in the reversed series equals |D| at n-i in the
    # original, so the max-location mirrors (ties break to smaller i,
    # which maps consistently here because the max is unique)
    assert rev.cp_index == n - base.cp_index
    assert abs(rev.k_stat - base.k_stat) < 1e-6


def test_rolling_backtest_hw_matches_python_reference(spark):
    """operators.analytics.rolling_backtest_hw vs a sequential Python
    backtest running all three methods (HW with the standard
    recursion, plain Holt via the standard form — the kernel folds
    the single-reference rewrite, algebraically equal — and the
    seasonal-naive window). Metrics agree to 1e-9; on a noise-free
    trending weekly pattern HW must beat BOTH baselines. Short
    groups (n < 2m+1) emit NULL metrics."""
    import math

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        rolling_backtest_hw,
    )

    m = 7
    a, be, g = 0.3, 0.1, 0.2
    season = [5, -3, 0, 2, -4, 1, -1]
    ys = [
        int(round(20 + 0.5 * t + season[t % m], 3) * 1000)
        for t in range(40)
    ]
    rows = [("g", t, y) for t, y in enumerate(ys)]
    rows += [("short", t, 100 * t) for t in range(2 * m)]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    got = {
        r.k: r
        for r in rolling_backtest_hw(
            df, ["k"], ["t"], "v", a, be, g, m
        ).collect()
    }

    xs = [float(y) for y in ys]
    l = sum(xs[:m]) / m
    b = (sum(xs[m : 2 * m]) / m - l) / m
    s = [x - l for x in xs[:m]]
    for x in xs[m : 2 * m]:
        lt = a * (x - s[0]) + (1 - a) * (l + b)
        bt = be * (lt - l) + (1 - be) * b
        st = g * (x - lt) + (1 - g) * s[0]
        s = s[1:] + [st]
        l, b = lt, bt
    lh, bh = xs[1], xs[1] - xs[0]
    for x in xs[2 : 2 * m]:
        ltt = a * x + (1 - a) * (lh + bh)
        bh = be * (ltt - lh) + (1 - be) * bh
        lh = ltt
    w = xs[m : 2 * m]
    e_hw, e_h, e_sn = [], [], []
    for x in xs[2 * m :]:
        e_hw.append(x - (l + b + s[0]))
        e_h.append(x - (lh + bh))
        e_sn.append(x - w[0])
        lt = a * (x - s[0]) + (1 - a) * (l + b)
        bt = be * (lt - l) + (1 - be) * b
        st = g * (x - lt) + (1 - g) * s[0]
        s = s[1:] + [st]
        l, b = lt, bt
        ltt = a * x + (1 - a) * (lh + bh)
        bh = be * (ltt - lh) + (1 - be) * bh
        lh = ltt
        w = w[1:] + [x]
    nf = len(xs) - 2 * m
    rmse_hw = math.sqrt(sum(e * e for e in e_hw) / nf)
    rmse_h = math.sqrt(sum(e * e for e in e_h) / nf)
    rmse_sn = math.sqrt(sum(e * e for e in e_sn) / nf)
    r = got["g"]
    assert (r.n_obs, r.n_forecasts) == (len(xs), nf)
    assert abs(r.mae_hw - round(sum(map(abs, e_hw)) / nf, 6)) < 1e-9
    assert abs(r.rmse_hw - round(rmse_hw, 6)) < 1e-9
    assert abs(r.mae_holt - round(sum(map(abs, e_h)) / nf, 6)) < 1e-9
    assert abs(r.rmse_holt - round(rmse_h, 6)) < 1e-9
    assert abs(r.mae_snaive - round(sum(map(abs, e_sn)) / nf, 6)) < 1e-9
    assert abs(r.rmse_snaive - round(rmse_sn, 6)) < 1e-9
    assert abs(r.skill_vs_snaive - round(1 - rmse_hw / rmse_sn, 6)) < 1e-9
    assert abs(r.skill_vs_holt - round(1 - rmse_hw / rmse_h, 6)) < 1e-9
    # sanity: the seasonal smoother must win on a seasonal pattern
    assert r.skill_vs_snaive > 0 and r.skill_vs_holt > 0

    sh = got["short"]
    assert sh.n_obs == 2 * m and sh.n_forecasts == 0
    assert sh.mae_hw is None and sh.skill_vs_holt is None


def test_pettitt_changepoint_matches_bruteforce(spark):
    """operators.analytics.pettitt_changepoint vs the O(n^2 * n)
    textbook double loop (U_t = sum over split pairs of sign), plus
    the degenerate shapes and the sign-flip invariance: negating the
    series negates U, keeps |U| / the located index / the verdict."""
    import math

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        pettitt_changepoint,
    )

    ys = [10, 12, 11, 13, 10, 12, 30, 31, 29, 33, 32, 30, 31]
    n = len(ys)
    df = spark.createDataFrame(
        [(t + 100, y) for t, y in enumerate(ys)], "t long, y long"
    )
    got = pettitt_changepoint(df, "t", "y").collect()[0]

    def sgn(d):
        return (d > 0) - (d < 0)

    best = None
    for t in range(1, n):
        u = sum(
            sgn(ys[j] - ys[i]) for i in range(t) for j in range(t, n)
        )
        if best is None or abs(u) > abs(best[1]):
            best = (t, u)
    k = abs(best[1])
    p = min(1.0, 2.0 * math.exp(-6.0 * k * k / (n**3 + n**2)))
    assert (got.n_obs, got.cp_index, got.cp_t) == (n, best[0], 99 + best[0])
    assert got.u_stat == best[1]
    assert abs(got.p_approx - round(p, 6)) < 1e-9
    assert got.significant == (
        6 * k * k > -math.log(0.025) * (n**3 + n**2)
    )

    neg = pettitt_changepoint(
        df.selectExpr("t", "-y AS y"), "t", "y"
    ).collect()[0]
    assert neg.cp_index == got.cp_index
    assert neg.u_stat == -got.u_stat
    assert neg.p_approx == got.p_approx
    assert neg.significant == got.significant

    for rows in ([], [(1, 5)]):
        r = pettitt_changepoint(
            spark.createDataFrame(rows, "t long, y long"), "t", "y"
        ).collect()[0]
        assert r.n_obs == len(rows)
        assert r.u_stat is None and r.significant is None


def test_kruskal_wallis_matches_reference_and_invariances(spark):
    """operators.analytics.kruskal_wallis_from_counts vs a sequential
    average-rank reference with ties, plus the rank-test invariances:
    shifting every value by a constant and relabeling groups change
    nothing; the all-tied degenerate emits NULL."""
    import collections

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        kruskal_wallis_from_counts,
    )

    data = {"a": [1, 2, 2, 3, 7], "b": [2, 4, 5, 5, 6], "c": [5, 6, 6, 8, 9]}
    rows = [(g, v) for g, vals in data.items() for v in vals]
    cnt = collections.Counter(rows)

    def kw(rows_counts):
        df = spark.createDataFrame(rows_counts, "g string, v long, c long")
        return kruskal_wallis_from_counts(df).collect()[0]

    got = kw([(g, v, c) for (g, v), c in cnt.items()])

    allv = sorted(v for _, v in rows)
    pos = {}
    for val in set(allv):
        idxs = [i + 1 for i, x in enumerate(allv) if x == val]
        pos[val] = sum(idxs) / len(idxs)
    N = len(allv)
    H = 12.0 / (N * (N + 1)) * sum(
        sum(pos[v] for v in vals) ** 2 / len(vals)
        for vals in data.values()
    ) - 3 * (N + 1)
    tie = sum(c**3 - c for c in collections.Counter(allv).values())
    Hc = H / (1 - tie / (N**3 - N))
    assert (got.k_groups, got.n_total) == (3, N)
    assert abs(got.h_stat - round(Hc, 6)) < 1e-6
    assert got.z_wh is not None and got.significant is not None

    shifted = kw([(g, v + 1000, c) for (g, v), c in cnt.items()])
    assert tuple(shifted) == tuple(got)

    relabel = {"a": "zz", "b": "mm", "c": "aa"}
    renamed = kw([(relabel[g], v, c) for (g, v), c in cnt.items()])
    assert tuple(renamed) == tuple(got)

    all_tied = kw([("a", 7, 5), ("b", 7, 9)])
    assert all_tied.k_groups == 2 and all_tied.n_total == 14
    assert all_tied.h_stat is None and all_tied.significant is None


def test_brown_forsythe_matches_reference_and_invariances(spark):
    """operators.analytics.brown_forsythe_from_counts vs a sequential
    ANOVA-on-|x - group-lower-median| reference, plus the location
    invariance a spread test must have: shifting ONE group's values
    by a constant changes nothing (its deviations are unchanged)."""
    import collections

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        brown_forsythe_from_counts,
    )

    data = {
        "a": [1, 2, 2, 3, 7, 9],
        "b": [2, 4, 5, 5, 6],
        "c": [5, 6, 6, 8, 20],
    }
    rows = [(g, v) for g, vals in data.items() for v in vals]
    cnt = collections.Counter(rows)

    def bf(rows_counts):
        df = spark.createDataFrame(rows_counts, "g string, v long, c long")
        return brown_forsythe_from_counts(df).collect()[0]

    got = bf([(g, v, c) for (g, v), c in cnt.items()])

    def lower_med(vals):
        s = sorted(vals)
        return s[(len(s) + 1) // 2 - 1]

    devs = {
        g: [abs(v - lower_med(vals)) for v in vals]
        for g, vals in data.items()
    }
    N = sum(len(d) for d in devs.values())
    k = len(devs)
    gm = sum(sum(d) for d in devs.values()) / N
    ssb = sum(
        len(d) * (sum(d) / len(d) - gm) ** 2 for d in devs.values()
    )
    ssw = sum(
        sum((x - sum(d) / len(d)) ** 2 for x in d)
        for d in devs.values()
    )
    want_f = (ssb / (k - 1)) / (ssw / (N - k))
    assert (got.k_groups, got.n_total) == (3, N)
    assert abs(got.f_stat - round(want_f, 6)) < 1e-6

    shifted = bf(
        [
            (g, v + (500 if g == "b" else 0), c)
            for (g, v), c in cnt.items()
        ]
    )
    assert tuple(shifted) == tuple(got)


def test_cochran_armitage_matches_reference_and_degenerates(spark):
    """operators.analytics.cochran_armitage_trend vs the textbook
    T / sqrt(pbar qbar (S_ssn - S_sn^2/N)) formula; score-shift
    invariance (adding a constant to every score leaves z unchanged);
    all-success and single-group frames emit NULL."""
    import math

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cochran_armitage_trend,
    )

    wk = [(0, 10, 100), (1, 14, 110), (2, 18, 105), (3, 25, 120), (4, 30, 115)]

    def ca(rows):
        df = spark.createDataFrame(rows, "s long, x long, n long")
        return cochran_armitage_trend(df).collect()[0]

    got = ca(wk)
    N = sum(n for _, _, n in wk)
    X = sum(x for _, x, _ in wk)
    p = X / N
    T = sum(s * (x - n * p) for s, x, n in wk)
    V = p * (1 - p) * (
        sum(s * s * n for s, _, n in wk)
        - sum(s * n for s, _, n in wk) ** 2 / N
    )
    want_z = T / math.sqrt(V)
    assert (got.n_groups, got.n_total, got.n_success) == (5, N, X)
    assert abs(got.z_ca - round(want_z, 6)) < 1e-9
    assert got.trend == "increasing"

    shifted = ca([(s + 100, x, n) for s, x, n in wk])
    assert abs(shifted.z_ca - got.z_ca) < 1e-6
    assert shifted.trend == got.trend

    assert ca([(0, 5, 5), (1, 7, 7)]).z_ca is None  # all successes
    assert ca([(3, 2, 10)]).z_ca is None  # zero score variance


def test_friedman_matches_references_and_degenerates(spark):
    """operators.analytics.friedman_from_blocks (pre-staged for the
    r12 window): equals the CLASSIC no-tie Friedman statistic on an
    untied design (the tie-corrected T1 must reduce to it), equals a
    hand-computed tie-corrected T1 under within-block ties,
    drops incomplete blocks, and NULLs the all-tied and empty
    degenerates."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        friedman_from_blocks,
    )

    def run(rows):
        df = spark.createDataFrame(rows, "b long, t string, x long")
        return friedman_from_blocks(df).collect()[0]

    data = {
        1: {"A": 10, "B": 12, "C": 15},
        2: {"A": 8, "B": 14, "C": 16},
        3: {"A": 9, "B": 11, "C": 13},
        4: {"A": 7, "B": 15, "C": 18},
    }
    got = run([(b, t, x) for b, d in data.items() for t, x in d.items()])
    b, k = 4, 3
    R = [4, 8, 12]  # A always rank 1, B rank 2, C rank 3
    fr = 12.0 / (b * k * (k + 1)) * sum(r * r for r in R) - 3 * b * (
        k + 1
    )
    assert (got.k_treatments, got.n_blocks) == (3, 4)
    assert abs(got.t1_stat - round(fr, 6)) < 1e-9
    assert got.significant is True

    data2 = {
        1: {"A": 5, "B": 5, "C": 9},
        2: {"A": 3, "B": 7, "C": 7},
        3: {"A": 4, "B": 6, "C": 8},
    }
    rows2 = [(b, t, x) for b, d in data2.items() for t, x in d.items()]
    got2 = run(rows2)
    ranks = [1.5, 1.5, 3, 1, 2.5, 2.5, 1, 2, 3]
    Rj = {"A": 3.5, "B": 6.0, "C": 8.5}
    b2, k2 = 3, 3
    A1 = sum(r * r for r in ranks)
    C1 = b2 * k2 * (k2 + 1) ** 2 / 4
    T1 = (
        (k2 - 1)
        * sum((Rj[t] - b2 * (k2 + 1) / 2) ** 2 for t in Rj)
        / (A1 - C1)
    )
    assert abs(got2.t1_stat - round(T1, 6)) < 1e-9

    got3 = run(rows2 + [(9, "A", 1), (9, "B", 2)])  # incomplete block
    assert tuple(got3) == tuple(got2)
    # duplicated-treatment block (k rows, k-1 distinct treatments)
    # drops as incomplete too (ADVICE r11)
    got3b = run(rows2 + [(9, "A", 1), (9, "A", 2), (9, "B", 3)])
    assert tuple(got3b) == tuple(got2)

    tied = run([(1, "A", 5), (1, "B", 5), (2, "A", 7), (2, "B", 7)])
    assert tied.t1_stat is None and tied.significant is None
    empty = run([])
    assert empty.k_treatments == 0 and empty.t1_stat is None


def test_jonckheere_terpstra_matches_bruteforce_and_mw(spark):
    """operators.analytics.jonckheere_terpstra_from_counts (pre-staged
    for the r12 window): the grid-computed doubled pair count equals a
    pure-Python all-pairs count, the tie-corrected z equals an
    independent implementation of the Hollander-Wolfe moments, the
    three-term variance reduces to the classic no-tie form on untied
    data, k=2 reproduces the Mann-Whitney z (sign-flipped by the
    ascent convention), group-order reversal flips the sign, count-row
    splitting and value shifts are invariant, and the degenerates
    (empty, one group, all-tied) serve NULLs."""
    import math
    import random
    from collections import Counter

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        jonckheere_terpstra_from_counts,
        mann_whitney_from_value_counts,
    )

    def run(rows):
        df = spark.createDataFrame(rows, "g string, v long, c long")
        return jonckheere_terpstra_from_counts(df).collect()[0]

    def counts_of(groups):
        rows = []
        for gname, xs in groups.items():
            for val, cnt in Counter(xs).items():
                rows.append((gname, val, cnt))
        return rows

    def brute(groups):
        """Independent J2 + Hollander-Wolfe moments, all-pairs."""
        keys = sorted(groups)
        j2 = 0
        for i, ki in enumerate(keys):
            for kj in keys[i + 1 :]:
                for a in groups[ki]:
                    for b in groups[kj]:
                        j2 += 2 if a < b else (1 if a == b else 0)
        ns = [len(groups[k]) for k in keys]
        nt = sum(ns)
        tv = Counter(x for xs in groups.values() for x in xs).values()
        sn2 = sum(n * n for n in ns)
        a_term = (
            nt * (nt - 1) * (2 * nt + 5)
            - sum(n * (n - 1) * (2 * n + 5) for n in ns)
            - sum(t * (t - 1) * (2 * t + 5) for t in tv)
        )
        var = (
            a_term / 72
            + sum(n * (n - 1) * (n - 2) for n in ns)
            * sum(t * (t - 1) * (t - 2) for t in tv)
            / (36 * nt * (nt - 1) * (nt - 2))
            + sum(n * (n - 1) for n in ns)
            * sum(t * (t - 1) for t in tv)
            / (8 * nt * (nt - 1))
        )
        z = (j2 - (nt * nt - sn2) / 2) / (2 * math.sqrt(var))
        return j2, nt * nt - sn2, var, z

    rng = random.Random(11)
    groups = {
        "g1": [rng.randint(0, 12) for _ in range(23)],
        "g2": [rng.randint(2, 14) for _ in range(31)],
        "g3": [rng.randint(4, 16) for _ in range(17)],
        "g4": [rng.randint(3, 18) for _ in range(26)],
    }
    j2, mean2x2, var, z = brute(groups)
    got = run(counts_of(groups))
    assert got.k_groups == 4 and got.n_total == 97
    assert abs(got.jt_auc - round(j2 / mean2x2, 6)) < 1e-9
    assert abs(got.z_jt - round(z, 6)) < 1e-9
    assert got.trend == (
        "no_trend" if abs(z) <= 1.96 else ("increasing" if z > 0 else "decreasing")
    )

    # no ties -> the three-term variance must equal the classic form
    untied = {"a": [1, 5, 9, 14], "b": [2, 7, 11], "c": [3, 8, 13, 20, 22]}
    nt = 12
    classic = (
        nt * nt * (2 * nt + 3)
        - sum(
            len(x) ** 2 * (2 * len(x) + 3) for x in untied.values()
        )
    ) / 72
    _, _, var_u, z_u = brute(untied)
    assert abs(var_u - classic) < 1e-9
    got_u = run(counts_of(untied))
    assert abs(got_u.z_jt - round(z_u, 6)) < 1e-9

    # k=2 == Mann-Whitney (sign-flipped: MW's u2 counts first-arm
    # ABOVE second-arm pairs, JT counts ascents toward later groups)
    two = {"a": groups["g1"], "b": groups["g2"]}
    got2 = run(counts_of(two))
    mw_rows = {}
    for val, cnt in Counter(two["a"]).items():
        mw_rows.setdefault(val, [0, 0])[0] = cnt
    for val, cnt in Counter(two["b"]).items():
        mw_rows.setdefault(val, [0, 0])[1] = cnt
    mw = mann_whitney_from_value_counts(
        spark.createDataFrame(
            [(v, ca, cb) for v, (ca, cb) in mw_rows.items()],
            "v long, cp long, cc long",
        )
    ).collect()[0]
    assert abs(got2.z_jt + mw.z) < 2e-6

    # invariances: value shift; group-order reversal flips the sign;
    # splitting a count row changes nothing
    shifted = run([(g_, v_ + 1000, c_) for g_, v_, c_ in counts_of(groups)])
    assert tuple(shifted) == tuple(got)
    rev = run(
        [
            ({"g1": "h4", "g2": "h3", "g3": "h2", "g4": "h1"}[g_], v_, c_)
            for g_, v_, c_ in counts_of(groups)
        ]
    )
    assert abs(rev.z_jt + got.z_jt) < 2e-6
    assert abs(rev.jt_auc + got.jt_auc - 1.0) < 2e-6
    split = run(
        [(g_, v_, 1) for g_, v_, c_ in counts_of(groups) for _ in range(c_)]
    )
    assert tuple(split) == tuple(got)

    # degenerates: empty / one group / every value tied -> NULL, no
    # ANSI division error (the monitor serve contract)
    empty = run([])
    assert empty.k_groups == 0 and empty.z_jt is None and empty.jt_auc is None
    one_g = run([("only", 3, 5), ("only", 7, 2)])
    assert one_g.z_jt is None and one_g.jt_auc is None
    tied = run([("a", 5, 4), ("b", 5, 9), ("c", 5, 2)])
    assert tied.z_jt is None and tied.trend is None


def test_ljung_box_matches_sequential_and_degenerates(spark):
    """operators.analytics.ljung_box_from_series (pre-staged for the
    r12 window): Q equals a sequential Box-Jenkins computation on a
    seasonal series, agrees with acf_lags' rounded per-lag estimates,
    a strongly periodic series is significant while the constant /
    too-short / empty degenerates serve NULLs, and max_lag runs past
    the series length without fabricating terms."""
    import random

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        acf_lags,
        ljung_box_from_series,
    )

    def run(ys, max_lag=7):
        df = spark.createDataFrame(
            list(enumerate(ys)), "t long, v long"
        )
        return ljung_box_from_series(df, "t", "v", max_lag).collect()[0]

    rng = random.Random(3)
    ys = [rng.randint(50, 150) + (60 if t % 7 == 0 else 0) for t in range(70)]
    got = run(ys)
    n, mean = len(ys), sum(ys) / len(ys)
    den = sum((y - mean) ** 2 for y in ys)
    q = n * (n + 2) * sum(
        (
            sum((ys[t] - mean) * (ys[t - k] - mean) for t in range(k, n))
            / den
        )
        ** 2
        / (n - k)
        for k in range(1, 8)
    )
    assert (got.n_obs, got.n_lags) == (70, 7)
    assert abs(got.q_stat - q) < 1e-5
    assert got.significant is True  # the planted weekly cycle

    # consistency with the per-lag ACF entry's estimates
    acfs = acf_lags(
        spark.createDataFrame(list(enumerate(ys)), "t long, v long"),
        "t",
        "v",
        7,
    ).collect()
    q_from_acf = n * (n + 2) * sum(
        r.acf**2 / (n - r.lag) for r in acfs
    )
    assert abs(got.q_stat - q_from_acf) < 1e-2  # acf rounded to 6dp

    # pure noise: usually not significant (fixed seed, checked value)
    noise = [rng.randint(0, 1000) for _ in range(80)]
    got_n = run(noise)
    assert got_n.q_stat is not None and got_n.significant is False

    # degenerates: constant, singleton, empty, max_lag > n
    const = run([5] * 10)
    assert const.n_lags == 7 and const.q_stat is None
    single = run([42])
    assert (single.n_obs, single.n_lags) == (1, 0)
    assert single.q_stat is None and single.significant is None
    empty = run([])
    assert empty.n_obs == 0 and empty.q_stat is None
    short = run([1, 5, 2], max_lag=10)
    assert short.n_lags == 2 and short.q_stat is not None


def test_cliffs_delta_matches_bruteforce_and_mw(spark):
    """operators.analytics.cliffs_delta_from_value_counts (pre-staged
    for the r12 window): delta equals the all-pairs dominance count,
    equals 2*AUC - 1 against the Mann-Whitney kernel on the same
    frame, the Romano magnitude bands label constructed effects
    correctly, swapping the arms negates delta, and the one-arm /
    empty degenerates serve NULLs."""
    import random
    from collections import Counter

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cliffs_delta_from_value_counts,
        mann_whitney_from_value_counts,
    )

    def frame(a, b):
        rows = {}
        for val, cnt in Counter(a).items():
            rows.setdefault(val, [0, 0])[0] = cnt
        for val, cnt in Counter(b).items():
            rows.setdefault(val, [0, 0])[1] = cnt
        return spark.createDataFrame(
            [(v, ca, cb) for v, (ca, cb) in rows.items()],
            "v long, cp long, cc long",
        )

    def run(a, b):
        return cliffs_delta_from_value_counts(frame(a, b)).collect()[0]

    rng = random.Random(5)
    a = [rng.randint(0, 20) for _ in range(45)]
    b = [rng.randint(5, 25) for _ in range(60)]
    got = run(a, b)
    gt = sum(1 for x in a for y in b if x > y)
    lt = sum(1 for x in a for y in b if x < y)
    want = (gt - lt) / (len(a) * len(b))
    assert (got.n_a, got.n_b) == (45, 60)
    assert abs(got.delta - round(want, 6)) < 1e-9

    mw = mann_whitney_from_value_counts(frame(a, b)).collect()[0]
    assert abs(got.delta - (2 * mw.auc - 1)) < 5e-6
    assert got.z == mw.z and got.significant == mw.significant

    # magnitude bands on constructed shifts (same spread, moved mean)
    base = [rng.randint(0, 100) for _ in range(300)]
    for shift, band in ((0, "negligible"), (12, "small"),
                        (22, "medium"), (300, "large")):
        r = run([x + shift for x in base], list(base))
        assert r.magnitude == band, (shift, r.delta, r.magnitude)

    # antisymmetry: swapping the arms negates delta
    rev = run(b, a)
    assert abs(rev.delta + got.delta) < 2e-6

    # degenerates: one arm, empty
    one = run(a, [])
    assert (one.n_a, one.n_b) == (45, 0)
    assert one.delta is None and one.magnitude is None and one.z is None
    empty = run([], [])
    assert empty.delta is None and empty.significant is None


def test_runs_test_matches_bruteforce_and_patterns(spark):
    """operators.analytics.runs_test_from_series (pre-staged for the
    r12 window): the run count and tie-corrected z equal a sequential
    pure-Python computation (median by the same 2*cum >= n+1 probe,
    median-tied rows dropped), a two-regime series reads clustered
    and a sawtooth reads alternating, value shifts are invariant, and
    the degenerates (empty, constant, one-sided) serve NULLs."""
    import math
    import random

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        runs_test_from_series,
    )

    def run(ys):
        df = spark.createDataFrame(
            list(enumerate(ys)), "t long, v long"
        )
        return runs_test_from_series(df, "t", "v").collect()[0]

    def brute(ys):
        sy, n = sorted(ys), len(ys)
        med = sy[math.ceil((n + 1) / 2) - 1]
        signs = [1 if y > med else 0 for y in ys if y != med]
        r = 1 + sum(
            1 for i in range(1, len(signs)) if signs[i] != signs[i - 1]
        )
        a, b = sum(signs), len(signs) - sum(signs)
        if a == 0 or b == 0 or 2 * a * b - a - b <= 0:
            return a, b, (r if signs else 0), None
        mu = 2 * a * b / (a + b) + 1
        var = 2 * a * b * (2 * a * b - a - b) / ((a + b) ** 2 * (a + b - 1))
        return a, b, r, (r - mu) / math.sqrt(var)

    rng = random.Random(9)
    ys = [rng.randint(0, 1000) for _ in range(61)]
    got = run(ys)
    a, b, r, z = brute(ys)
    assert (got.n_above, got.n_below, got.n_runs) == (a, b, r)
    assert abs(got.z_runs - round(z, 6)) < 1e-9
    assert got.verdict == "random"

    # two regimes -> far fewer runs than expected -> clustered
    regimes = [rng.randint(0, 100) for _ in range(30)] + [
        rng.randint(900, 1000) for _ in range(30)
    ]
    got_c = run(regimes)
    assert got_c.n_runs == 2 and got_c.verdict == "clustered"

    # strict sawtooth (distinct values so the median ties only one
    # row) -> near-maximal runs -> alternating
    saw = [(i if i % 2 == 0 else 1000 + i) for i in range(40)]
    got_a = run(saw)
    sa, sb, sr, sz = brute(saw)
    assert (got_a.n_above, got_a.n_below, got_a.n_runs) == (sa, sb, sr)
    assert got_a.verdict == "alternating" and got_a.n_runs >= 38

    # shift invariance (the median shifts with the values)
    shifted = run([y + 5000 for y in ys])
    assert tuple(shifted) == tuple(got)

    # degenerates: empty, constant (all median-tied), single sign
    empty = run([])
    assert empty.n_runs == 0 and empty.z_runs is None
    const = run([7] * 12)
    assert (const.n_above, const.n_below) == (0, 0)
    assert const.z_runs is None and const.verdict is None
    one_side = run([10, 10, 10, 1])
    assert one_side.z_runs is None


def test_mcnemar_matches_reference_and_degenerates(spark):
    """operators.analytics.mcnemar_from_pairs (pre-staged for the r12
    window): the continuity-corrected chi-square equals the textbook
    computation on the discordant cells, concordant-pair injections
    change nothing, swapping the flags mirrors the direction, NULL
    flags are dropped, and the no-discordance / empty degenerates
    serve NULLs."""
    import random

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        mcnemar_from_pairs,
    )

    def run(rows):
        df = spark.createDataFrame(rows, "a boolean, b boolean")
        return mcnemar_from_pairs(df).collect()[0]

    rng = random.Random(4)
    rows = [
        (rng.random() < 0.4, rng.random() < 0.25) for _ in range(300)
    ]
    got = run(rows)
    b = sum(1 for x, y in rows if x and not y)
    c = sum(1 for x, y in rows if y and not x)
    assert (got.n_only_a, got.n_only_b) == (b, c)
    assert abs(got.chi2_cc - round((abs(b - c) - 1) ** 2 / (b + c), 6)) < 1e-9
    assert got.significant == ((abs(b - c) - 1) ** 2 / (b + c) > 3.841)
    assert got.direction == ("a_over_b" if b > c else "b_over_a")

    # concordant pairs are uninformative: injecting them moves only
    # the concordant counters
    padded = run(rows + [(True, True)] * 40 + [(False, False)] * 60)
    assert padded.chi2_cc == got.chi2_cc
    assert padded.significant == got.significant
    assert padded.n_both == got.n_both + 40

    # swap symmetry
    swapped = run([(y, x) for x, y in rows])
    assert swapped.chi2_cc == got.chi2_cc
    assert (swapped.n_only_a, swapped.n_only_b) == (c, b)
    assert swapped.direction == "b_over_a"

    # NULL flags dropped
    df_null = spark.createDataFrame(
        rows + [(None, True), (False, None)], "a boolean, b boolean"
    )
    got_null = mcnemar_from_pairs(df_null).collect()[0]
    assert tuple(got_null) == tuple(got)

    # degenerates
    empty = run([])
    assert empty.n_pairs == 0 and empty.chi2_cc is None
    concordant = run([(True, True)] * 5 + [(False, False)] * 3)
    assert concordant.chi2_cc is None and concordant.direction is None


def test_cohens_kappa_matches_reference_and_degenerates(spark):
    """operators.analytics.cohens_kappa_from_pairs (pre-staged for
    the r12 window): kappa equals the textbook margins computation,
    perfect agreement reads 1/almost_perfect, label-swap symmetry
    holds, independent-margin data sits near 0, NULL labels are
    dropped, and the chance-saturated / empty degenerates serve
    NULLs."""
    import random
    from collections import Counter

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cohens_kappa_from_pairs,
    )

    def run(rows):
        df = spark.createDataFrame(rows, "a string, b string")
        return cohens_kappa_from_pairs(df).collect()[0]

    def ref(rows):
        n = len(rows)
        po = sum(1 for x, y in rows if x == y) / n
        ca = Counter(x for x, _ in rows)
        cb = Counter(y for _, y in rows)
        pe = sum(ca[l] * cb[l] for l in set(ca) | set(cb)) / n / n
        return po, pe, (po - pe) / (1 - pe)

    rng = random.Random(12)
    rows = [
        (
            lab,
            lab if rng.random() < 0.7 else rng.choice("LMH"),
        )
        for lab in (rng.choice("LMH") for _ in range(400))
    ]
    got = run(rows)
    po, pe, kappa = ref(rows)
    assert got.n_items == 400
    assert abs(got.po - round(po, 6)) < 1e-9
    assert abs(got.pe - round(pe, 6)) < 1e-9
    assert abs(got.kappa - round(kappa, 6)) < 1e-9
    assert got.agreement == "substantial"

    # symmetry: kappa(a, b) == kappa(b, a)
    swapped = run([(y, x) for x, y in rows])
    assert swapped.kappa == got.kappa

    # perfect agreement (two labels, so pe < 1)
    perfect = run([("x", "x")] * 5 + [("y", "y")] * 5)
    assert perfect.kappa == 1.0 and perfect.agreement == "almost_perfect"

    # independent raters: near zero, 'slight' or 'poor'
    ind = [(rng.choice("LMH"), rng.choice("LMH")) for _ in range(3000)]
    got_ind = run(ind)
    assert abs(got_ind.kappa) < 0.05

    # NULL labels dropped
    df_null = spark.createDataFrame(
        rows + [(None, "L"), ("M", None)], "a string, b string"
    )
    assert tuple(cohens_kappa_from_pairs(df_null).collect()[0]) == tuple(
        got
    )

    # degenerates: empty; both raters constant on one shared label
    empty = run([])
    assert empty.n_items == 0 and empty.kappa is None
    const = run([("x", "x")] * 7)
    assert const.po == 1.0 and const.pe == 1.0
    assert const.kappa is None and const.agreement is None


def test_gehan_wilcoxon_matches_bruteforce_and_crossing(spark):
    """operators.analytics.gehan_wilcoxon_from_counts (pre-staged for
    the r12 window): the weighted statistic equals a sequential
    at-risk-table computation, chunk-split count frames serve the
    exact union (the streaming additivity contract), a
    crossing-curves design reads opposite emphasis vs the log-rank
    kernel, and the no-event / one-arm / empty degenerates serve
    NULLs."""
    import math
    import random
    from collections import defaultdict

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        gehan_wilcoxon_from_counts,
        log_rank_from_counts,
    )

    def counts_frame(rows):
        cnt = defaultdict(lambda: [0, 0])
        for g, t, ev in rows:
            cnt[(g, t)][0 if ev else 1] += 1
        return spark.createDataFrame(
            [(g, t, d, c) for (g, t), (d, c) in cnt.items()],
            "g string, t long, d long, c long",
        )

    def brute(rows):
        times = sorted({t for _, t, _ in rows})
        u = v = 0.0
        for t in times:
            nat = sum(1 for g, tt, _ in rows if g == "a" and tt >= t)
            nbt = sum(1 for g, tt, _ in rows if g == "b" and tt >= t)
            da = sum(1 for g, tt, ev in rows if g == "a" and tt == t and ev)
            db = sum(1 for g, tt, ev in rows if g == "b" and tt == t and ev)
            dt, nt = da + db, nat + nbt
            if dt == 0:
                continue
            u += nt * da - dt * nat
            if nt > 1:
                v += dt * nat * nbt * (nt - dt) / (nt - 1)
        return u, (u / math.sqrt(v) if v > 0 else None)

    rng = random.Random(8)
    rows = []
    for g, lam in (("a", 0.12), ("b", 0.2)):
        for _ in range(120):
            t = min(int(rng.expovariate(lam)) + 1, 30)
            ev = 0 if t >= 30 or rng.random() < 0.2 else 1
            rows.append((g, t, ev))
    got = gehan_wilcoxon_from_counts(counts_frame(rows)).collect()[0]
    u, z = brute(rows)
    assert (got.n_a, got.n_b) == (120, 120)
    assert got.u_gehan == round(u, 6)
    assert abs(got.z_gehan - round(z, 6)) < 1e-9

    # additivity: two disjoint chunks fed as one frame with duplicate
    # (g, t) rows serve the union exactly
    half = len(rows) // 2
    c1, c2 = counts_frame(rows[:half]), counts_frame(rows[half:])
    merged = gehan_wilcoxon_from_counts(c1.unionByName(c2)).collect()[0]
    assert tuple(merged) == tuple(got)

    # crossing emphasis — the textbook diagnostic: arm a takes its 30
    # deaths EARLY (t=1, all 200 at risk), arm b the same 30 LATE
    # (t=15, 170 at risk) — the equal-weight log-rank nearly cancels
    # while Gehan's at-risk weighting amplifies the early excess
    cross = (
        [("a", 1, 1)] * 30 + [("a", 20, 0)] * 70
        + [("b", 15, 1)] * 30 + [("b", 20, 0)] * 70
    )
    zg = gehan_wilcoxon_from_counts(counts_frame(cross)).collect()[0]
    zl = log_rank_from_counts(counts_frame(cross)).collect()[0]
    # exact hand values: e1 = 30*100/200 + 30*70/170 = 27.352941, so
    # the equal-weight test barely reacts; Gehan's at-risk weighting
    # nearly doubles the standardized early excess
    assert zl.exp_a == 27.352941 and 0 < zl.z_lr < 1.0
    assert zg.u_gehan == 900.0 and zg.z_gehan > zl.z_lr * 1.5

    # degenerates: empty frame, one arm only, censor-only frame
    empty = gehan_wilcoxon_from_counts(
        spark.createDataFrame([], "g string, t long, d long, c long")
    ).collect()[0]
    assert empty.u_gehan == 0.0 and empty.z_gehan is None
    one_arm = gehan_wilcoxon_from_counts(
        spark.createDataFrame(
            [("a", 3, 2, 1)], "g string, t long, d long, c long"
        )
    ).collect()[0]
    assert one_arm.z_gehan is None and one_arm.significant is None
    censored = gehan_wilcoxon_from_counts(
        spark.createDataFrame(
            [("a", 3, 0, 5), ("b", 4, 0, 6)],
            "g string, t long, d long, c long",
        )
    ).collect()[0]
    assert censored.z_gehan is None


def test_page_l_matches_reference_and_permutation_null(spark):
    """operators.analytics.page_l_from_blocks (pre-staged for the r12
    window): L and the tie-corrected z equal an independent mid-rank
    computation, the permutation variance reduces to the classic Page
    form on untied designs AND matches a Monte-Carlo permutation null
    under ties, incomplete blocks drop, order reversal flips the
    sign, and the degenerates (empty, one treatment, fully tied
    blocks) serve NULLs."""
    import math
    import random
    import statistics
    from collections import defaultdict

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        page_l_from_blocks,
    )

    def run(rows):
        df = spark.createDataFrame(rows, "b long, t string, x long")
        return page_l_from_blocks(df).collect()[0]

    def ref(rows):
        blocks = defaultdict(dict)
        for b, t, x in rows:
            blocks[b][t] = x
        ks = sorted({t for _, t, _ in rows})
        k, bn = len(ks), len(blocks)
        L = sr2 = 0.0
        for d in blocks.values():
            vals = sorted(d.values())

            def rank(x):
                lo = sum(1 for v in vals if v < x)
                eq = sum(1 for v in vals if v == x)
                return lo + (eq + 1) / 2

            for j, t in enumerate(ks):
                r = rank(d[t])
                L += (j + 1) * r
                sr2 += (2 * r - (k + 1)) ** 2
        sc4 = sum((2 * (j + 1) - (k + 1)) ** 2 for j in range(k))
        el = bn * (k + 1) * k * (k + 1) / 4
        var = (sc4 / 4) * sr2 / (k - 1) / 4
        return L, el, var, (L - el) / math.sqrt(var) if var > 0 else None

    rng = random.Random(6)
    rows = []
    for b in range(12):
        base = rng.randint(0, 50)
        for j, t in enumerate("ABCD"):
            rows.append((b, t, base + j * 3 + rng.randint(0, 4)))
    got = run(rows)
    L, el, var, z = ref(rows)
    assert (got.k_treatments, got.n_blocks) == (4, 12)
    assert got.l_stat == round(L, 6)
    assert abs(got.z_page - round(z, 6)) < 1e-9
    assert got.trend == "increasing"

    # untied design: the tie-corrected variance must equal the
    # classic Var(L) = b k^2 (k+1)(k^2-1)/144
    untied = [
        (b, t, (b * 7 + j * j + (b + j) % 3) * 4 + j)
        for b in range(8)
        for j, t in enumerate("ABC")
    ]
    # force untied within each block by construction check
    for b in range(8):
        xs = [x for bb, _, x in untied if bb == b]
        assert len(set(xs)) == 3
    _, _, var_u, _ = ref(untied)
    k, bn = 3, 8
    classic = bn * k * k * (k + 1) * (k * k - 1) / 144
    assert abs(var_u - classic) < 1e-9
    got_u = run(untied)
    _, _, _, z_u = ref(untied)
    assert abs(got_u.z_page - round(z_u, 6)) < 1e-9

    # Monte-Carlo permutation null under HEAVY ties: the formula
    # variance of L must match the empirical one (within-block
    # shuffles preserve the tie pattern)
    tied_rows = [
        (b, t, rng.randint(0, 2))
        for b in range(30)
        for t in "ABCD"
    ]
    _, el_t, var_t, _ = ref(tied_rows)
    blocks = defaultdict(dict)
    for b, t, x in tied_rows:
        blocks[b][t] = x
    sims = []
    for _ in range(3000):
        Ls = 0.0
        for d in blocks.values():
            vals = sorted(d.values())

            def rank(x):
                lo = sum(1 for v in vals if v < x)
                eq = sum(1 for v in vals if v == x)
                return lo + (eq + 1) / 2

            perm = list(d.values())
            rng.shuffle(perm)
            Ls += sum((j + 1) * rank(x) for j, x in enumerate(perm))
        sims.append(Ls)
    assert abs(statistics.mean(sims) - el_t) < 4 * math.sqrt(
        var_t / len(sims)
    )
    assert abs(statistics.variance(sims) / var_t - 1) < 0.1
    got_t = run(tied_rows)
    _, _, _, z_t = ref(tied_rows)
    assert abs(got_t.z_page - round(z_t, 6)) < 1e-9

    # incomplete blocks drop (the friedman contract, shared helper)
    got_inc = run(rows + [(99, "A", 5), (99, "B", 7)])
    assert tuple(got_inc) == tuple(got)

    # order reversal flips the sign exactly
    rev = run(
        [
            (b, {"A": "Z4", "B": "Z3", "C": "Z2", "D": "Z1"}[t], x)
            for b, t, x in rows
        ]
    )
    assert abs(rev.z_page + got.z_page) < 2e-6

    # degenerates
    empty = run([])
    assert empty.k_treatments == 0 and empty.z_page is None
    one_t = run([(1, "A", 5), (2, "A", 9)])
    assert one_t.z_page is None and one_t.trend is None
    all_tied = run([(b, t, 7) for b in range(5) for t in "AB"])
    assert all_tied.z_page is None and all_tied.l_stat is not None


def test_cochran_q_matches_reference_and_mcnemar(spark):
    """operators.analytics.cochran_q_from_blocks (pre-staged for the
    r12 window): Q equals the textbook totals computation, reduces at
    k=2 to the UNcorrected McNemar chi-square, all-0/all-1 blocks
    cancel, incomplete blocks drop, nonzero x coerces to 1, and the
    saturated / empty degenerates serve NULLs."""
    import random
    from collections import defaultdict

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cochran_q_from_blocks,
    )

    def run(rows):
        df = spark.createDataFrame(rows, "b long, t string, x long")
        return cochran_q_from_blocks(df).collect()[0]

    def ref(rows):
        ks = sorted({t for _, t, _ in rows})
        k = len(ks)
        tj, ui = defaultdict(int), defaultdict(int)
        for b, t, x in rows:
            tj[t] += x
            ui[b] += x
        n = sum(tj.values())
        den = k * n - sum(v * v for v in ui.values())
        if den <= 0:
            return None
        return (
            (k - 1)
            * (k * sum(v * v for v in tj.values()) - n * n)
            / den
        )

    rng = random.Random(2)
    rows = []
    for b in range(80):
        for j, t in enumerate("ABC"):
            rows.append((b, t, 1 if rng.random() < (0.3, 0.45, 0.5)[j] else 0))
    got = run(rows)
    assert (got.k_treatments, got.n_blocks) == (3, 80)
    assert abs(got.q_stat - round(ref(rows), 6)) < 1e-9

    # k=2 == UNcorrected McNemar chi-square (b-c)^2/(b+c)
    rows2 = [(b, t, x) for b, t, x in rows if t in "AB"]
    per_b = defaultdict(dict)
    for b, t, x in rows2:
        per_b[b][t] = x
    disc_b = sum(1 for d in per_b.values() if d["A"] == 1 and d["B"] == 0)
    disc_c = sum(1 for d in per_b.values() if d["A"] == 0 and d["B"] == 1)
    got2 = run(rows2)
    assert abs(
        got2.q_stat
        - round((disc_b - disc_c) ** 2 / (disc_b + disc_c), 6)
    ) < 1e-9

    # all-0 / all-1 blocks cancel: injecting them changes Q not at all
    padded = run(
        rows
        + [(900 + i, t, 1) for i in range(5) for t in "ABC"]
        + [(800 + i, t, 0) for i in range(7) for t in "ABC"]
    )
    assert padded.q_stat == got.q_stat
    assert padded.n_blocks == got.n_blocks + 12

    # incomplete blocks drop; nonzero x coerces to 1
    got_inc = run(rows + [(999, "A", 1)])
    assert tuple(got_inc) == tuple(got)
    # a block with a DUPLICATED treatment and a missing one has k rows
    # but only k-1 distinct treatments — it must drop too (ADVICE r11:
    # row count alone passed it as complete)
    got_dup = run(rows + [(998, "A", 1), (998, "A", 0), (998, "B", 1)])
    assert tuple(got_dup) == tuple(got)
    got_coerce = run([(b, t, x * 7) for b, t, x in rows])
    assert tuple(got_coerce) == tuple(got)

    # degenerates: empty; saturated (every block all-0 or all-1)
    empty = run([])
    assert empty.k_treatments == 0 and empty.q_stat is None
    sat = run(
        [(1, "A", 1), (1, "B", 1), (2, "A", 0), (2, "B", 0)]
    )
    assert sat.q_stat is None and sat.significant is None


def test_wilcoxon_signed_rank_matches_reference_and_mc_null(spark):
    """operators.analytics.wilcoxon_signed_rank_from_pairs
    (pre-staged for the r12 window): W+ and the tie-corrected z equal
    an independent doubled-rank computation, the variance matches a
    Monte-Carlo sign-flip null under heavy ties, swap antisymmetry
    and shift-of-both invariance hold, zero diffs and NULL pairs
    drop, and the all-tied / empty degenerates serve NULLs."""
    import math
    import random
    import statistics
    from collections import Counter

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        wilcoxon_signed_rank_from_pairs,
    )

    def run(rows):
        df = spark.createDataFrame(rows, "a long, b long")
        return wilcoxon_signed_rank_from_pairs(df).collect()[0]

    def ref(rows):
        d = [x - y for x, y in rows if x is not None and y is not None]
        d = [x for x in d if x != 0]
        n = len(d)
        cnt = Counter(abs(x) for x in d)
        cum, r2 = 0, {}
        for v in sorted(cnt):
            c = cnt[v]
            r2[v] = 2 * cum + c + 1
            cum += c
        w2p = sum(r2[abs(x)] for x in d if x > 0)
        ties = sum(c**3 - c for c in cnt.values())
        var = n * (n + 1) * (2 * n + 1) / 24 - ties / 48
        z = (w2p / 2 - n * (n + 1) / 4) / math.sqrt(var) if var > 0 else None
        return w2p / 2, n, var, z, [r2[abs(x)] / 2 for x in d]

    rng = random.Random(5)
    rows = [(rng.randint(0, 30), rng.randint(0, 25)) for _ in range(120)]
    got = run(rows)
    w_plus, n, var, z, ranks = ref(rows)
    assert (got.n_pairs, got.n_nonzero) == (120, n)
    assert got.w_plus == round(w_plus, 6)
    assert abs(got.z_wsr - round(z, 6)) < 1e-9
    assert got.direction == "a_over_b" and got.significant is True

    # Monte-Carlo sign-flip null under the SAME tie pattern: the
    # formula variance must match the empirical one
    sims = [
        sum(r for r in ranks if rng.random() < 0.5) for _ in range(6000)
    ]
    assert abs(statistics.mean(sims) - n * (n + 1) / 4) < 4 * math.sqrt(
        var / 6000
    )
    assert abs(statistics.variance(sims) / var - 1) < 0.1

    # swap antisymmetry; shifting BOTH sides is invariant
    swapped = run([(y, x) for x, y in rows])
    assert abs(swapped.z_wsr + got.z_wsr) < 2e-6
    assert swapped.direction == "b_over_a"
    shifted = run([(x + 500, y + 500) for x, y in rows])
    assert tuple(shifted) == tuple(got)

    # zero diffs and NULL pairs drop
    df_pad = spark.createDataFrame(
        rows + [(7, 7)] * 10 + [(None, 3), (4, None)], "a long, b long"
    )
    got_pad = wilcoxon_signed_rank_from_pairs(df_pad).collect()[0]
    assert got_pad.n_pairs == 130  # zero diffs counted as pairs
    assert got_pad.n_nonzero == got.n_nonzero
    assert got_pad.w_plus == got.w_plus and got_pad.z_wsr == got.z_wsr

    # degenerates: empty; all-tied (every diff zero)
    empty = run([])
    assert empty.n_pairs == 0 and empty.z_wsr is None
    all_zero = run([(5, 5)] * 9)
    assert all_zero.n_nonzero == 0 and all_zero.w_plus is None
    assert all_zero.direction is None


def test_kuiper_and_cvm_match_bruteforce_and_mc_criticals(spark):
    """operators.analytics.kuiper_from_value_counts /
    cvm_from_value_counts (pre-staged for the r12 window): both equal
    sequential pooled-CDF computations, Kuiper catches a cyclic shift
    KS underrates, the asymptotic critical points match Monte-Carlo
    H0 nulls (the series-bisection 1.747 and the published 0.46136),
    and the one-arm / empty degenerates serve NULLs (CvM's empty fold
    is 0.0, the AD family convention)."""
    import math
    import random
    from collections import Counter

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cvm_from_value_counts,
        ks_from_value_counts,
        kuiper_critical,
        kuiper_from_value_counts,
    )

    def frame(a, b):
        rows = {}
        for val, cnt in Counter(a).items():
            rows.setdefault(val, [0, 0])[0] = cnt
        for val, cnt in Counter(b).items():
            rows.setdefault(val, [0, 0])[1] = cnt
        return spark.createDataFrame(
            [(v, x, y) for v, (x, y) in rows.items()],
            "v long, ca long, cb long",
        )

    def refs(a, b):
        na, nb = len(a), len(b)
        ca, cb = Counter(a), Counter(b)
        fa = fb = 0
        dplus = dminus = ssum = 0.0
        for v in sorted(set(a) | set(b)):
            fa += ca[v]
            fb += cb[v]
            d = fa / na - fb / nb
            dplus = max(dplus, d)
            dminus = max(dminus, -d)
            ssum += (ca[v] + cb[v]) * d * d
        return dplus + dminus, na * nb / (na + nb) ** 2 * ssum

    rng = random.Random(1)
    a = [rng.randint(0, 40) for _ in range(150)]
    b = [(rng.randint(0, 40) + 6) % 41 for _ in range(130)]
    v_ref, t_ref = refs(a, b)
    kp = kuiper_from_value_counts(frame(a, b)).collect()[0]
    cv = cvm_from_value_counts(frame(a, b)).collect()[0]
    assert (kp.n_a, kp.n_b) == (150, 130)
    assert abs(kp.kuiper_v - round(v_ref, 6)) < 1e-9
    assert abs(cv.cvm_t - round(t_ref, 6)) < 1e-9

    # the cyclic diagnostic: a center-peaked distribution shifted
    # halfway around the cycle produces two near-equal one-sided
    # excursions — Kuiper's V keeps both, KS's single max gap only
    # the larger one
    big_a = [
        (rng.randint(0, 99) + rng.randint(0, 99)) // 2
        for _ in range(1500)
    ]
    big_b = [
        ((rng.randint(0, 99) + rng.randint(0, 99)) // 2 + 50) % 100
        for _ in range(1500)
    ]
    kp2 = kuiper_from_value_counts(frame(big_a, big_b)).collect()[0]
    ks2 = ks_from_value_counts(frame(big_a, big_b)).collect()[0]
    assert kp2.significant is True
    assert kp2.kuiper_v > 1.5 * ks2.ks_d  # both excursions survive

    # Monte-Carlo H0 nulls pin both asymptotic criticals
    n = m = 150
    ne = n * m / (n + m)
    sims_v, sims_t = [], []
    for _ in range(1500):
        xs = sorted(rng.random() for _ in range(n))
        ys = sorted(rng.random() for _ in range(m))
        ia = ib = 0
        dp = dm = ss = 0.0
        for x in sorted(xs + ys):
            while ia < n and xs[ia] <= x:
                ia += 1
            while ib < m and ys[ib] <= x:
                ib += 1
            d = ia / n - ib / m
            dp = max(dp, d)
            dm = max(dm, -d)
            ss += d * d
        sims_v.append((dp + dm) * math.sqrt(ne))
        sims_t.append(n * m / (n + m) ** 2 * ss)
    sims_v.sort()
    sims_t.sort()
    crit_v = kuiper_critical(0.05)
    assert abs(crit_v - 1.7472599458506268) < 1e-12
    assert abs(sims_v[int(0.95 * 1500)] - crit_v) < 0.12
    assert abs(sims_t[int(0.95 * 1500)] - 0.46136) < 0.08

    # degenerates: one arm -> NULL statistics; empty frames
    one = frame([3, 3, 7], [])
    kp1 = kuiper_from_value_counts(one).collect()[0]
    cv1 = cvm_from_value_counts(one).collect()[0]
    assert kp1.kuiper_v is None and kp1.significant is None
    assert cv1.cvm_t is None and cv1.significant is None
    e = spark.createDataFrame([], "v long, ca long, cb long")
    assert kuiper_from_value_counts(e).collect()[0].kuiper_v is None
    cve = cvm_from_value_counts(e).collect()[0]
    assert cve.cvm_t is None and cve.significant is None


@given(
    ga=st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=12),
    gb=st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=12),
    gc=st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=12),
)
@settings(**_PROP_SETTINGS)
def test_jonckheere_property_matches_bruteforce(spark, ga, gb, gc):
    """Property (hypothesis): jonckheere_terpstra_from_counts equals
    the all-pairs brute force for arbitrary small tied groups,
    including empty groups, degenerate alphabets and k collapsing
    below 2 when groups are empty."""
    import math
    from collections import Counter

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        jonckheere_terpstra_from_counts,
    )

    groups = {k: v for k, v in (("a", ga), ("b", gb), ("c", gc)) if v}
    rows = [
        (g, val, cnt)
        for g, xs in groups.items()
        for val, cnt in Counter(xs).items()
    ]
    got = jonckheere_terpstra_from_counts(
        spark.createDataFrame(rows, "g string, v long, c long")
    ).collect()[0]

    keys = sorted(groups)
    j2 = sum(
        2 if a < b else (1 if a == b else 0)
        for i, ki in enumerate(keys)
        for kj in keys[i + 1 :]
        for a in groups[ki]
        for b in groups[kj]
    )
    ns = [len(groups[k]) for k in keys]
    nt = sum(ns)
    tv = Counter(x for xs in groups.values() for x in xs).values()
    sn2 = sum(n * n for n in ns)
    assert got.k_groups == len(keys) and got.n_total == nt
    if nt * nt - sn2 > 0:
        assert abs(got.jt_auc - round(j2 / (nt * nt - sn2), 6)) < 1e-9
    else:
        assert got.jt_auc is None
    if len(keys) >= 2 and nt >= 3:
        a_term = (
            nt * (nt - 1) * (2 * nt + 5)
            - sum(n * (n - 1) * (2 * n + 5) for n in ns)
            - sum(t * (t - 1) * (2 * t + 5) for t in tv)
        )
        var = (
            a_term / 72
            + sum(n * (n - 1) * (n - 2) for n in ns)
            * sum(t * (t - 1) * (t - 2) for t in tv)
            / (36 * nt * (nt - 1) * (nt - 2))
            + sum(n * (n - 1) for n in ns)
            * sum(t * (t - 1) for t in tv)
            / (8 * nt * (nt - 1))
        )
        if var > 0:
            z = (j2 - (nt * nt - sn2) / 2) / (2 * math.sqrt(var))
            assert abs(got.z_jt - round(z, 6)) < 1e-9
        else:
            assert got.z_jt is None
    else:
        assert got.z_jt is None


@given(
    ys=st.lists(
        st.integers(min_value=-9, max_value=9), min_size=0, max_size=20
    ),
)
@settings(**_PROP_SETTINGS)
def test_runs_test_property_matches_bruteforce(spark, ys):
    """Property (hypothesis): runs_test_from_series equals the
    sequential computation (same median probe, same tie-drop) for
    arbitrary short integer series including constants, two-point
    series and empties."""
    import math

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        runs_test_from_series,
    )

    got = runs_test_from_series(
        spark.createDataFrame(list(enumerate(ys)), "t long, v long"),
        "t",
        "v",
    ).collect()[0]
    if not ys:
        assert (got.n_above, got.n_below, got.n_runs) == (0, 0, 0)
        assert got.z_runs is None
        return
    sy, n = sorted(ys), len(ys)
    med = sy[math.ceil((n + 1) / 2) - 1]
    signs = [1 if y > med else 0 for y in ys if y != med]
    r = (1 if signs else 0) + sum(
        1 for i in range(1, len(signs)) if signs[i] != signs[i - 1]
    )
    a, b = sum(signs), len(signs) - sum(signs)
    assert (got.n_above, got.n_below, got.n_runs) == (a, b, r)
    if a > 0 and b > 0 and 2 * a * b - a - b > 0:
        mu = 2 * a * b / (a + b) + 1
        var = (
            2 * a * b * (2 * a * b - a - b) / ((a + b) ** 2 * (a + b - 1))
        )
        assert abs(got.z_runs - round((r - mu) / math.sqrt(var), 6)) < 1e-9
    else:
        assert got.z_runs is None


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=-10, max_value=10),
            st.integers(min_value=-10, max_value=10),
        ),
        min_size=0,
        max_size=25,
    ),
)
@settings(**_PROP_SETTINGS)
def test_wilcoxon_signed_rank_property_matches_bruteforce(spark, pairs):
    """Property (hypothesis): wilcoxon_signed_rank_from_pairs equals
    the doubled-rank sequential computation for arbitrary small
    paired integers, including all-zero-diff and empty frames."""
    import math
    from collections import Counter

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        wilcoxon_signed_rank_from_pairs,
    )

    got = wilcoxon_signed_rank_from_pairs(
        spark.createDataFrame(pairs, "a long, b long")
    ).collect()[0]
    d = [x - y for x, y in pairs if x != y]
    assert (got.n_pairs, got.n_nonzero) == (len(pairs), len(d))
    if not d:
        assert got.w_plus is None and got.z_wsr is None
        return
    cnt = Counter(abs(x) for x in d)
    cum, r2 = 0, {}
    for v in sorted(cnt):
        c = cnt[v]
        r2[v] = 2 * cum + c + 1
        cum += c
    w2p = sum(r2[abs(x)] for x in d if x > 0)
    n = len(d)
    assert got.w_plus == round(w2p / 2, 6)
    ties = sum(c**3 - c for c in cnt.values())
    var = n * (n + 1) * (2 * n + 1) / 24 - ties / 48
    if var > 0:
        z = (w2p / 2 - n * (n + 1) / 4) / math.sqrt(var)
        assert abs(got.z_wsr - round(z, 6)) < 1e-9
    else:
        assert got.z_wsr is None


def test_g_test_matches_reference_and_mi_bridge(spark):
    """operators.analytics.g_test_from_contingency (pre-staged for
    the r12 window): G equals the textbook log-likelihood-ratio sum,
    equals 2*N*MI from the mutual-information kernel on the same
    cells (the tier bridge), detects a planted dependence chi2 also
    detects, and the empty / single-level degenerates serve NULLs."""
    import math
    import random
    from collections import Counter

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        chi2_from_contingency,
        contingency_counts,
        g_test_from_contingency,
        mutual_info_from_contingency,
    )

    def cells_of(rows):
        return contingency_counts(
            spark.createDataFrame(rows, "a string, b string"), "a", "b"
        )

    rng = random.Random(7)
    rows = [(rng.choice("XYZ"), rng.choice("PQ")) for _ in range(400)]
    got = g_test_from_contingency(cells_of(rows)).collect()[0]
    ca = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    cab = Counter(rows)
    g_ref = 2 * sum(
        n * math.log(n * 400 / (ca[a] * cb[b]))
        for (a, b), n in cab.items()
    )
    assert (got.ka, got.kb, got.n_total) == (3, 2, 400)
    assert abs(got.g_stat - round(g_ref, 6)) < 1e-9

    # the tier bridge: G == 2 * N * mi_nats to the shared fold
    mi = mutual_info_from_contingency(cells_of(rows)).collect()[0]
    assert abs(got.g_stat - 2 * 400 * mi.mi_nats) < 1e-2  # mi rounded

    # planted dependence: both G and chi2 fire, and they approximate
    # each other (Pearson is G's second-order expansion)
    dep = [
        ("X" if rng.random() < 0.8 else "Y", "P")
        for _ in range(300)
    ] + [
        ("Y" if rng.random() < 0.8 else "X", "Q")
        for _ in range(300)
    ]
    got_dep = g_test_from_contingency(cells_of(dep)).collect()[0]
    chi_dep = chi2_from_contingency(cells_of(dep)).collect()[0]
    assert got_dep.significant is True and chi_dep.significant is True
    assert abs(got_dep.g_stat / chi_dep.chi2 - 1) < 0.15

    # degenerates: empty; single row-level (dof 0)
    empty = g_test_from_contingency(
        cells_of([])
    ).collect()[0]
    assert empty.ka == 0 and empty.g_stat is None
    one = g_test_from_contingency(
        cells_of([("x", "p"), ("x", "q")])
    ).collect()[0]
    assert one.dof == 0.0 and one.g_stat is None and one.z_wh is None


def test_mood_median_matches_reference_and_degenerates(spark):
    """operators.analytics.mood_median_from_counts (pre-staged for
    the r12 window): chi2 equals the textbook 2 x k computation with
    the same median probe and at-median-goes-below convention, a
    single wild outlier moves NOTHING (the robustness contract
    Kruskal-Wallis can't make), count-row splitting is invariant,
    and the one-group / one-sided / empty degenerates serve NULLs."""
    import math
    import random
    from collections import Counter

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        mood_median_from_counts,
    )

    def run(rows):
        df = spark.createDataFrame(rows, "g string, v long, c long")
        return mood_median_from_counts(df).collect()[0]

    def counts_of(groups):
        return [
            (g, v, c)
            for g, xs in groups.items()
            for v, c in Counter(xs).items()
        ]

    def ref(groups):
        pooled = sorted(x for xs in groups.values() for x in xs)
        n = len(pooled)
        med = pooled[math.ceil((n + 1) / 2) - 1]
        a_tot = sum(1 for x in pooled if x > med)
        if a_tot == 0 or a_tot == n or len(groups) < 2:
            return med, a_tot, None
        chi2 = 0.0
        for g in sorted(groups):
            ng = len(groups[g])
            ag = sum(1 for x in groups[g] if x > med)
            e = ng * a_tot / n
            chi2 += (ag - e) ** 2 / (e * (1 - a_tot / n))
        return med, a_tot, chi2

    rng = random.Random(3)
    groups = {
        "a": [rng.randint(0, 20) for _ in range(50)],
        "b": [rng.randint(4, 24) for _ in range(60)],
        "c": [rng.randint(2, 22) for _ in range(40)],
    }
    got = run(counts_of(groups))
    _, a_tot, chi2 = ref(groups)
    assert (got.k_groups, got.n_total, got.n_above) == (3, 150, a_tot)
    assert abs(got.chi2 - round(chi2, 6)) < 1e-9

    # robustness: one absurd outlier leaves the statistic UNCHANGED
    # as long as it doesn't cross the median (it replaces a value on
    # the same side)
    wild = dict(groups)
    wild["b"] = groups["b"][:-1] + [10**12]
    if groups["b"][-1] > sorted(
        x for xs in groups.values() for x in xs
    )[math.ceil(151 / 2) - 1]:
        got_w = run(counts_of(wild))
        assert got_w.chi2 == got.chi2

    # count-row splitting is invariant
    split = run(
        [(g, v, 1) for g, v, c in counts_of(groups) for _ in range(c)]
    )
    assert tuple(split) == tuple(got)

    # degenerates: empty / one group / everything at or below the
    # pooled median (A = 0)
    empty = run([])
    assert empty.k_groups == 0 and empty.chi2 is None
    one_g = run([("only", 3, 5), ("only", 9, 2)])
    assert one_g.chi2 is None and one_g.significant is None
    tied = run([("a", 5, 3), ("b", 5, 4)])
    assert tied.n_above == 0 and tied.chi2 is None


# ---------------------------------------------------------------------------
# Round-12 property tests: the registered r12 kernels that had
# example/MC tests but no hypothesis property-vs-bruteforce coverage
# (the r11 pattern extended to the rest of the tier at its closure).
# ---------------------------------------------------------------------------


def _wh_z(chi2: float, dof: float) -> float:
    """Python twin of the shared WH_CHI2_Z string."""
    return ((chi2 / dof) ** (1.0 / 3.0) - (1.0 - 2.0 / (9.0 * dof))) / math.sqrt(
        2.0 / (9.0 * dof)
    )


def _doubled_block_ranks(xs: list[int]) -> list[int]:
    """Doubled within-block average ranks (2r = 2*#less + #eq + 1)."""
    return [
        2 * sum(1 for y in xs if y < x) + sum(1 for y in xs if y == x) + 1
        for x in xs
    ]


@given(
    blocks=st.lists(
        st.lists(st.integers(min_value=0, max_value=5), min_size=3, max_size=3),
        min_size=0,
        max_size=8,
    ),
)
@settings(**_PROP_SETTINGS)
def test_friedman_property_matches_bruteforce(spark, blocks):
    """Property (hypothesis): friedman_from_blocks equals the
    sequential tie-corrected Conover T1 (in doubled-rank units) for
    arbitrary small complete-block designs, including all-tied blocks
    (NULL T1) and the empty design."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        friedman_from_blocks,
    )

    rows = [
        (bi, t, x)
        for bi, xs in enumerate(blocks)
        for t, x in zip("ABC", xs)
    ]
    got = friedman_from_blocks(
        spark.createDataFrame(rows, "b long, t string, x long")
    ).collect()[0]

    b, k = len(blocks), (3 if blocks else 0)
    assert (got.k_treatments, got.n_blocks) == (k, b)
    rs2 = {t: 0 for t in "ABC"}
    a2 = 0
    for xs in blocks:
        r2s = _doubled_block_ranks(xs)
        for t, r2 in zip("ABC", r2s):
            rs2[t] += r2
            a2 += r2 * r2
    if not blocks:
        assert got.t1_stat is None and got.significant is None
        return
    sr2 = sum((rs2[t] - b * (k + 1)) ** 2 for t in "ABC")
    denom = a2 - b * k * (k + 1) ** 2
    if denom > 0:
        t1 = (k - 1) * sr2 / denom
        assert abs(got.t1_stat - round(t1, 6)) < 1e-9
        z = _wh_z(t1, k - 1)
        assert abs(got.z_wh - round(z, 6)) < 1e-9
        assert got.significant == (z > 1.645)
    else:
        assert got.t1_stat is None and got.z_wh is None


@given(
    blocks=st.lists(
        st.lists(st.integers(min_value=0, max_value=5), min_size=3, max_size=3),
        min_size=0,
        max_size=8,
    ),
)
@settings(**_PROP_SETTINGS)
def test_page_l_property_matches_bruteforce(spark, blocks):
    """Property (hypothesis): page_l_from_blocks equals the sequential
    L statistic and its exact-permutation normal moments (doubled
    units) for arbitrary small complete-block designs."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        page_l_from_blocks,
    )

    rows = [
        (bi, t, x)
        for bi, xs in enumerate(blocks)
        for t, x in zip("ABC", xs)
    ]
    got = page_l_from_blocks(
        spark.createDataFrame(rows, "b long, t string, x long")
    ).collect()[0]

    b, k = len(blocks), (3 if blocks else 0)
    assert (got.k_treatments, got.n_blocks) == (k, b)
    if not blocks:
        assert got.l_stat is None and got.z_page is None
        return
    pos = {"A": 1, "B": 2, "C": 3}
    l2 = 0
    sr2_cells = 0
    for xs in blocks:
        r2s = _doubled_block_ranks(xs)
        for t, r2 in zip("ABC", r2s):
            l2 += pos[t] * r2
            sr2_cells += (r2 - (k + 1)) ** 2
    assert abs(got.l_stat - round(l2 / 2.0, 6)) < 1e-9
    sc4 = sum((2 * p - (k + 1)) ** 2 for p in pos.values())
    if sr2_cells > 0:
        var = (sc4 / 4.0) * sr2_cells / (k - 1)
        z = (l2 - b * (k + 1.0) * k * (k + 1.0) / 2.0) / math.sqrt(var)
        assert abs(got.z_page - round(z, 6)) < 1e-9
        want_trend = (
            "no_trend"
            if abs(z) <= 1.96
            else ("increasing" if z > 0 else "decreasing")
        )
        assert got.trend == want_trend
    else:
        assert got.z_page is None and got.trend is None


@given(
    blocks=st.lists(
        st.lists(st.integers(min_value=0, max_value=1), min_size=3, max_size=3),
        min_size=0,
        max_size=12,
    ),
)
@settings(**_PROP_SETTINGS)
def test_cochran_q_property_matches_bruteforce(spark, blocks):
    """Property (hypothesis): cochran_q_from_blocks equals the
    textbook totals computation for arbitrary small binary designs,
    including saturated (all-0/all-1) and empty designs."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cochran_q_from_blocks,
    )

    rows = [
        (bi, t, x)
        for bi, xs in enumerate(blocks)
        for t, x in zip("ABC", xs)
    ]
    got = cochran_q_from_blocks(
        spark.createDataFrame(rows, "b long, t string, x long")
    ).collect()[0]

    b, k = len(blocks), (3 if blocks else 0)
    assert (got.k_treatments, got.n_blocks) == (k, b)
    tj = {t: 0 for t in "ABC"}
    ui = []
    for xs in blocks:
        for t, x in zip("ABC", xs):
            tj[t] += x
        ui.append(sum(xs))
    nsucc = sum(ui)
    assert got.n_success == nsucc
    den = k * nsucc - sum(u * u for u in ui)
    if blocks and k >= 2 and den > 0:
        q = (k - 1) * (k * sum(v * v for v in tj.values()) - nsucc * nsucc) / den
        assert abs(got.q_stat - round(q, 6)) < 1e-9
        z = _wh_z(q, k - 1)
        assert abs(got.z_wh - round(z, 6)) < 1e-9
        assert got.significant == (z > 1.645)
    else:
        assert got.q_stat is None and got.significant is None


@given(
    flags=st.lists(
        st.tuples(st.booleans(), st.booleans()), min_size=0, max_size=25
    ),
)
@settings(**_PROP_SETTINGS)
def test_mcnemar_property_matches_bruteforce(spark, flags):
    """Property (hypothesis): mcnemar_from_pairs equals the
    continuity-corrected discordant-cell computation for arbitrary
    paired boolean samples, including all-concordant (NULL chi2)."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        mcnemar_from_pairs,
    )

    df = spark.createDataFrame(
        [(bool(a), bool(b)) for a, b in flags] or [],
        "a boolean, b boolean",
    ) if flags else spark.createDataFrame([], "a boolean, b boolean")
    got = mcnemar_from_pairs(df).collect()[0]

    n_both = sum(1 for a, b in flags if a and b)
    only_a = sum(1 for a, b in flags if a and not b)
    only_b = sum(1 for a, b in flags if b and not a)
    neither = sum(1 for a, b in flags if not a and not b)
    assert (
        got.n_pairs,
        got.n_both,
        got.n_only_a,
        got.n_only_b,
        got.n_neither,
    ) == (len(flags), n_both, only_a, only_b, neither)
    if only_a + only_b > 0:
        chi2 = (abs(only_a - only_b) - 1.0) ** 2 / (only_a + only_b)
        assert abs(got.chi2_cc - round(chi2, 6)) < 1e-9
        sig = chi2 > 3.841
        assert got.significant == sig
        want_dir = (
            "none"
            if not sig
            else ("a_over_b" if only_a > only_b else "b_over_a")
        )
        assert got.direction == want_dir
    else:
        assert got.chi2_cc is None and got.significant is None
        assert got.direction is None


@given(
    pairs=st.lists(
        st.tuples(
            st.sampled_from(["x", "y", "z"]),
            st.sampled_from(["x", "y", "z"]),
        ),
        min_size=0,
        max_size=25,
    ),
)
@settings(**_PROP_SETTINGS)
def test_cohens_kappa_property_matches_bruteforce(spark, pairs):
    """Property (hypothesis): cohens_kappa_from_pairs equals the
    margin-product chance correction for arbitrary small label pairs,
    including the perfect-agreement degenerate (pe == N^2 -> NULL)."""
    from collections import Counter

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cohens_kappa_from_pairs,
    )

    df = (
        spark.createDataFrame(list(pairs), "a string, b string")
        if pairs
        else spark.createDataFrame([], "a string, b string")
    )
    got = cohens_kappa_from_pairs(df).collect()[0]

    n = len(pairs)
    assert got.n_items == n
    if n == 0:
        assert got.po is None and got.pe is None and got.kappa is None
        return
    po_num = sum(1 for a, b in pairs if a == b)
    ra = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)
    pe_num = sum(ra[l] * cb.get(l, 0) for l in ra)
    assert abs(got.po - round(po_num / n, 6)) < 1e-9
    assert abs(got.pe - round(pe_num / (n * n), 6)) < 1e-9
    if n * n - pe_num > 0:
        kappa = (po_num * n - pe_num) / (n * n - pe_num)
        assert abs(got.kappa - round(kappa, 6)) < 1e-9
    else:
        assert got.kappa is None and got.agreement is None


@given(
    ga=st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=12),
    gb=st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=12),
    gc=st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=12),
)
@settings(**_PROP_SETTINGS)
def test_mood_median_property_matches_bruteforce(spark, ga, gb, gc):
    """Property (hypothesis): mood_median_from_counts equals the
    sequential pooled-median 2xk chi-square for arbitrary small tied
    groups, including one-sided (A=0 or A=N -> NULL) and empty
    degenerates."""
    from collections import Counter

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        mood_median_from_counts,
    )

    groups = {k: v for k, v in (("a", ga), ("b", gb), ("c", gc)) if v}
    rows = [
        (g, val, cnt)
        for g, xs in groups.items()
        for val, cnt in Counter(xs).items()
    ]
    df = (
        spark.createDataFrame(rows, "g string, v long, c long")
        if rows
        else spark.createDataFrame([], "g string, v long, c long")
    )
    got = mood_median_from_counts(df).collect()[0]

    pooled = sorted(x for xs in groups.values() for x in xs)
    n = len(pooled)
    k = len(groups)
    assert (got.k_groups, got.n_total) == (k, n)
    if n == 0:
        assert got.chi2 is None and got.n_above == 0
        return
    # exact lower-middle median: min v with 2*cum >= n+1
    cum = 0
    med = None
    for v in sorted(set(pooled)):
        cum += pooled.count(v)
        if 2 * cum >= n + 1:
            med = v
            break
    a_tot = sum(1 for x in pooled if x > med)
    assert got.n_above == a_tot
    if k >= 2 and 0 < a_tot < n:
        chi2 = 0.0
        for g in sorted(groups):
            ng = len(groups[g])
            ag = sum(1 for x in groups[g] if x > med)
            e = ng * a_tot / n
            chi2 += (ag - e) ** 2 / (e * (1 - a_tot / n))
        assert abs(got.chi2 - round(chi2, 6)) < 1e-9
        z = _wh_z(chi2, k - 1)
        assert abs(got.z_wh - round(z, 6)) < 1e-9
        assert got.significant == (z > 1.645)
    else:
        assert got.chi2 is None and got.significant is None


@given(
    pairs=st.lists(
        st.tuples(
            st.sampled_from(["p", "q", "r"]),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=0,
        max_size=25,
    ),
)
@settings(**_PROP_SETTINGS)
def test_g_test_property_matches_bruteforce_and_mi(spark, pairs):
    """Property (hypothesis): g_test_from_contingency equals the
    sequential 2 * sum n*ln(n*N/(ra*cb)) over positive cells for
    arbitrary small label pairs (and hence 2*N*MI), including
    single-level margins (NULL G)."""
    from collections import Counter

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        contingency_counts,
        g_test_from_contingency,
    )

    df = (
        spark.createDataFrame(list(pairs), "a string, b long")
        if pairs
        else spark.createDataFrame([], "a string, b long")
    )
    got = g_test_from_contingency(
        contingency_counts(df, "a", "b")
    ).collect()[0]

    n = len(pairs)
    cells = Counter(pairs)
    ra = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)
    ka, kb = len(ra), len(cb)
    if n == 0:
        assert got.g_stat is None and got.significant is None
        return
    assert (got.ka, got.kb, got.n_total) == (ka, kb, n)
    if ka >= 2 and kb >= 2:
        g = 2.0 * sum(
            c * math.log(c * n / (ra[a] * cb[b]))
            for (a, b), c in cells.items()
        )
        assert abs(got.g_stat - round(g, 6)) < 2e-6
        dof = (ka - 1.0) * (kb - 1.0)
        z = _wh_z(max(g, 0.0), dof) if g != 0 else _wh_z(g, dof)
        assert abs(got.z_wh - round(z, 6)) < 2e-6
    else:
        assert got.g_stat is None and got.z_wh is None


@given(
    ys=st.lists(
        st.integers(min_value=-9, max_value=9), min_size=0, max_size=18
    ),
)
@settings(**_PROP_SETTINGS)
def test_ljung_box_property_matches_bruteforce(spark, ys):
    """Property (hypothesis): ljung_box_from_series equals the
    sequential Q = n(n+2) sum rho_k^2/(n-k) with the kernel's exact
    lag-pair ACF estimator for arbitrary short integer series,
    including constants (zero variance -> NULL Q), series shorter
    than the lag horizon (fewer lag rows) and empties."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        ljung_box_from_series,
    )

    max_lag = 4
    got = ljung_box_from_series(
        spark.createDataFrame(list(enumerate(ys)), "t long, v long"),
        "t",
        "v",
        max_lag,
    ).collect()[0]

    n = len(ys)
    assert got.n_obs == n
    if n == 0:
        assert got.n_lags == 0 and got.q_stat is None
        return
    s = sum(ys)
    q = sum(y * y for y in ys)
    den = q - s * s / n
    m = s / n
    terms = []
    for lag in range(1, max_lag + 1):
        pairs = [(ys[i], ys[i - lag]) for i in range(lag, n)]
        if not pairs:
            continue
        cnt = len(pairs)
        pk = sum(a * b for a, b in pairs)
        sa = sum(a for a, _ in pairs)
        sb = sum(b for _, b in pairs)
        if den > 0:
            rho = (pk - (sa + sb) * m + cnt * m * m) / den
            terms.append(rho * rho / (n - lag))
        else:
            terms.append(None)
    h = len(terms)
    assert got.n_lags == h
    if h >= 1 and all(t is not None for t in terms):
        chi2 = n * (n + 2.0) * sum(terms)
        assert abs(got.q_stat - round(chi2, 6)) < 2e-6
        z = _wh_z(chi2, h) if chi2 >= 0 else None
        assert abs(got.z_wh - round(z, 6)) < 2e-6
        assert got.significant == (z > 1.645)
    else:
        assert got.q_stat is None and got.significant is None


def test_ewma_chunked_fold_matches_plain_fold(spark):
    """r14 §5: the ewma mapInPandas fold streams Arrow batches with a
    carried per-user state instead of buffering the whole shuffle
    partition. Force tiny batches so user series straddle batch
    boundaries, and pin the result against the plain left fold the
    oracle computes (acc = a*x + (1-a)*acc over the (ts, event_id)
    order, rounded with Python round)."""
    from collections import defaultdict

    from lambda_refarch_mapreduce_spark.plans.catalog import REGISTRY
    from lambda_refarch_mapreduce_spark.plans.catalog_analytics import (
        EWMA_ALPHA,
    )
    from lambda_refarch_mapreduce_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        df = REGISTRY["ewma_user_value"].spark(spark, sf)
        got = {r.user_id: (r.n_events, r.ewma) for r in df.collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    rows = (
        load_table(spark, sf, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    series = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
        series[r.user_id].append(float(r.value))
    want = {}
    for uid, vals in series.items():
        acc = vals[0]
        for x in vals[1:]:
            acc = EWMA_ALPHA * x + (1 - EWMA_ALPHA) * acc
        want[uid] = (len(vals), round(acc, 6))
    assert got == want
