"""Every scaling-measurement case, as config entries for
tools/scaling_harness.py (VERDICT r12 next-round #5 — consolidation of
the 13 one-off ``scaling_*.py`` scripts; the per-round result tables
in SCALING.md are the record these cases reproduce).

Each case keeps its original script's claims in its docstring and its
original CLI contract in ``args`` (workdir and/or MEASURE_KEY), so the
SCALING.md invocation lines still map 1:1:

    old: python tools/scaling_bench.py WD [--full]
    new: python tools/scaling_harness.py dedup WD [--full]
    old: python tools/scaling_round12.py mood_rows_1m
    new: python tools/scaling_harness.py round12 mood_rows_1m

Keyed cases (round8..round12) still run ONE variant per process —
fresh JVM, UI on — so AQE exchange reuse and warm caches can't flatter
later variants.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

from tools.scaling_harness import (
    SF_DIR,
    case,
    load,
    measure,
    replicated_parquet,
    union_replicas,
    write_once,
)


def _err(msg: str) -> None:
    print(msg, file=sys.stderr)


# ---------------------------------------------------------------------------
# Round 3: Ed-Join fuzzy join + graph tier (was tools/scaling_analytics.py)
# ---------------------------------------------------------------------------


@case("analytics")
def analytics_tier(spark, args):
    """Round-3 analytics tier (fuzzy join, PageRank, triangles, label
    propagation) at 1x/10x/100x. Replicas preserve within-replica
    structure and forbid cross-replica matches: customers get a 4-char
    duplicated-digit tag (any two tags differ in >= 2 chars, so k=1
    edit distance can't pair replicas — true pair count exactly
    linear); document tokens are prefixed "r{r}" so the word graph is
    r disjoint copies. Counted, not collected: the row count is the
    workload (pairs / nodes)."""
    from lambda_refarch_mapreduce_spark.operators import graph, linkage

    workdir = args[0] if args else "/tmp/scaling_analytics"
    scales = (1, 10, 100)

    def tag(r: int) -> str:
        return f"{r // 10}{r // 10}{r % 10}{r % 10}"

    out = {
        "fuzzy_join": {},
        "pagerank": {},
        "triangle_stats": {},
        "label_propagation": {},
    }
    for scale in scales:
        cust = replicated_parquet(
            spark,
            os.path.join(workdir, f"cust_{scale}x"),
            load(spark, "customer"),
            scale,
            lambda df, r: df.select(
                (F.col("c_custkey") + r * 10_000_000).alias("c_custkey"),
                F.concat(F.lit(tag(r)), F.col("c_name")).alias("c_name"),
                "c_nationkey",
            ),
        )
        out["fuzzy_join"][f"{scale}x"] = measure(
            spark,
            linkage.fuzzy_self_join(
                cust, "c_custkey", "c_name", k=1, block_col="c_nationkey"
            ),
            mode="count",
        )
    for scale in scales:
        docs = replicated_parquet(
            spark,
            os.path.join(workdir, f"docs_{scale}x"),
            load(spark, "documents"),
            scale,
            lambda df, r: df.select(
                (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"r{r}$1").alias("text"),
            ),
        )
        edges = graph.token_bigram_edges(docs, "text")
        out["pagerank"][f"{scale}x"] = measure(
            spark, graph.pagerank(edges, n_iter=3), mode="count"
        )
        out["triangle_stats"][f"{scale}x"] = measure(
            spark, graph.triangle_stats(edges), mode="count"
        )
        out["label_propagation"][f"{scale}x"] = measure(
            spark, graph.label_propagation(edges, n_iter=3), mode="count"
        )
    return out


# ---------------------------------------------------------------------------
# ANN index lifecycle (was tools/scaling_ann.py)
# ---------------------------------------------------------------------------


@case("ann")
def ann_lifecycle(spark, args):
    """retrain_index (train + full re-encode + atomic swap) and
    search_current at 1x/10x/100x corpus replicas; replica r offsets
    vec_id, vector values unchanged (quantizer geometry fixed, so the
    workload scales linearly by construction — what's measured is
    whether the IMPLEMENTATION does)."""
    from lambda_refarch_mapreduce_spark.streaming import ann

    workdir = args[0] if args else "/tmp/ann_scale"
    out: dict[str, dict] = {}
    queries = load(spark, "embeddings").filter(F.col("vec_id") < 20)
    for scale in (1, 10, 100):
        vecs = replicated_parquet(
            spark,
            os.path.join(workdir, f"vecs_x{scale}"),
            load(spark, "embeddings"),
            scale,
            lambda df, r: df.select(
                (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
                "embedding",
            ),
        )
        n = vecs.count()
        index_dir = os.path.join(workdir, f"index_x{scale}")
        shutil.rmtree(index_dir, ignore_errors=True)
        t0 = time.monotonic()
        ann.retrain_index(
            spark, index_dir, vecs, n_centroids=16, m=8, n_codes=16
        )
        retrain_s = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        ann.search_current(
            spark, index_dir, queries, k=5, n_probe=4
        ).write.format("noop").mode("overwrite").save()
        out[f"x{scale}"] = {
            "n_vectors": n,
            "retrain_wall_s": retrain_s,
            "search_wall_s": round(time.monotonic() - t0, 3),
        }
    return out


# ---------------------------------------------------------------------------
# Dedup tiers (was tools/scaling_bench.py)
# ---------------------------------------------------------------------------


@case("dedup")
def dedup_tiers(spark, args):
    """Do the dedup tiers stay ~linear at 10x/100x corpus growth?
    Salted replicas (tokens prefixed with the replica id) preserve
    within-replica near-dup structure and never collide in LSH —
    workload linear by construction. By default 100x runs only the
    judge-relevant tiers; --full runs every tier at every scale."""
    from lambda_refarch_mapreduce_spark.operators import dedup

    plain = [a for a in args if not a.startswith("--")]
    full = "--full" in args
    workdir = plain[0] if plain else "/tmp/spark_graft_scaling"

    def salted(df, r):
        return df.select(
            (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"r{r}$1").alias("text"),
            "lang",
            "source",
            "n_chars",
        )

    frames = {
        "1x": load(spark, "documents"),
        "10x": replicated_parquet(
            spark,
            os.path.join(workdir, "docs_10x"),
            load(spark, "documents"),
            10,
            salted,
        ),
        "100x": replicated_parquet(
            spark,
            os.path.join(workdir, "docs_100x"),
            load(spark, "documents"),
            100,
            salted,
        ),
    }
    tiers = {
        "exact": lambda df: dedup.exact_duplicates(df, "doc_id", "text"),
        "minhash_lsh": lambda df: dedup.minhash_lsh_pairs(
            df, "doc_id", "text"
        ),
        "simhash_pairs": lambda df: dedup.simhash_near_pairs(
            df, "doc_id", "text"
        ),
        "jaccard_pairs": lambda df: dedup.ngram_jaccard_pairs(
            df, "doc_id", "text"
        ),
        "paragraph_dedup": lambda df: dedup.paragraph_dedup(
            dedup.chunk_tokens(df, "doc_id", "text", 8), "doc_id", "text",
            "\n",
        ),
        "substring_spans": lambda df: dedup.duplicate_span_excise(
            df, "doc_id", "text", 8
        ),
    }
    big_tiers = (
        "exact",
        "minhash_lsh",
        "connected_components",
        "paragraph_dedup",
        "substring_spans",
    )
    # warm JIT/codegen on the small tier first; discard
    tiers["minhash_lsh"](frames["1x"]).write.format("noop").mode(
        "overwrite"
    ).save()

    secs: dict[str, dict[str, float]] = {}
    shuffle_mb: dict[str, dict[str, float]] = {}
    for label, frame in frames.items():
        secs[label], shuffle_mb[label] = {}, {}
        for name, build in tiers.items():
            if label == "100x" and not full and name not in big_tiers:
                continue
            m = measure(spark, build(frame), mode="noop")
            secs[label][name] = m["wall_s"]
            if "shuffle_mb" in m:
                shuffle_mb[label][name] = m["shuffle_mb"]
        # connected components over a MATERIALIZED near-dup edge set so
        # the measurement is the clustering alone, not pair generation
        edge_path = os.path.join(workdir, f"edges_{label}")
        dedup.minhash_lsh_pairs(frame, "doc_id", "text").select(
            "id_a", "id_b"
        ).write.mode("overwrite").parquet(edge_path)
        edges = spark.read.parquet(edge_path)
        m = measure(
            spark,
            dedup.connected_components(edges, "id_a", "id_b"),
            mode="noop",
        )
        secs[label]["connected_components"] = m["wall_s"]
        if "shuffle_mb" in m:
            shuffle_mb[label]["connected_components"] = m["shuffle_mb"]

    def ratio(a: str, b: str) -> dict[str, float]:
        return {
            k: round(secs[b][k] / max(secs[a][k], 0.01), 1)
            for k in secs[b]
            if k in secs[a]
        }

    return {
        "metric": "dedup_scaling",
        "n_docs": {k: frames[k].count() for k in frames},
        "secs": secs,
        "shuffle_mb": shuffle_mb,
        "ratio_10x_over_1x": ratio("1x", "10x"),
        "ratio_100x_over_10x": ratio("10x", "100x"),
    }


# ---------------------------------------------------------------------------
# Incremental MV refresh (was tools/scaling_incremental_mv.py)
# ---------------------------------------------------------------------------


@case("incremental_mv")
def incremental_mv(spark, args):
    """incremental_agg_update with FIXED changelog volume against a
    base grown 1x/10x/100x — "MV refresh at change cost, not table
    cost": refresh shuffle must stay flat (measured r5: ~1.5 MB across
    two decades of base growth); the only table-sized stage is the
    old-row key semi-join probe, a parallel scan."""
    from lambda_refarch_mapreduce_spark.operators import analytics

    workdir = args[0] if args else "/tmp/scaling_incr"
    out = {}
    for scale in (1, 10, 100):
        base = replicated_parquet(
            spark,
            os.path.join(workdir, f"base_{scale}x"),
            load(spark, "orders").select(
                "o_orderkey", "o_custkey", "o_totalprice"
            ),
            scale,
            lambda df, r: df.select(
                (F.col("o_orderkey") + r * 10_000_000).alias("o_orderkey"),
                "o_custkey",
                "o_totalprice",
            ),
        ).withColumn("segment", (F.col("o_custkey") % 50).cast("int"))
        # the stored view is materialized OUTSIDE the refresh timer —
        # production reads it, it doesn't recompute it
        mvp = os.path.join(workdir, f"mv_{scale}x")
        if not os.path.exists(os.path.join(mvp, "_SUCCESS")):
            base.groupBy("segment").agg(
                F.sum("o_totalprice").alias("revenue"),
                F.count(F.lit(1)).alias("n_orders"),
            ).write.mode("overwrite").parquet(mvp)
        mv = spark.read.parquet(mvp)
        k = F.col("o_orderkey")
        first = base.filter(k < 10_000_000)
        upd = first.filter(k % 7 == 0).select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
            F.lit(1).alias("seq"),
            F.lit("U").alias("op"),
            "segment",
        )
        dele = first.filter(k % 14 == 0).select(
            "o_orderkey", "o_custkey", "o_totalprice",
            F.lit(2).alias("seq"), F.lit("D").alias("op"), "segment",
        )
        row = measure(
            spark,
            analytics.incremental_agg_update(
                mv, base, upd.unionByName(dele),
                ["o_orderkey"], "seq", "op", ["segment"],
                "o_totalprice", "revenue", "n_orders",
            ),
            mode="count",
        )
        row["base_rows"] = base.count()
        out[f"{scale}x"] = row
        _err(f"  {scale}x: {row}")
    return out


# ---------------------------------------------------------------------------
# Round 5: multimodal + funnel/attribution (was tools/scaling_round5.py)
# ---------------------------------------------------------------------------


def _r5_docs(spark, workdir, scale):
    return replicated_parquet(
        spark,
        os.path.join(workdir, f"docs_{scale}x"),
        load(spark, "documents").select("doc_id"),
        scale,
        lambda df, r: df.select(
            (F.col("doc_id") + r * 1_000_000).alias("doc_id")
        ),
    )


@case("round5")
def round5(spark, args):
    """Round-5 additions at 1x/10x/100x: image aHash dedup (media keys
    doc_id % 60, so the SAME 60 images recur and duplicate groups grow
    linearly — the realistic dedup regime), audio VAD, video scene
    cuts, the strict-order funnel and last-touch attribution (user
    populations disjoint per replica, so stage counts scale linearly
    while every window partition keeps its original size)."""
    from pyspark.sql.window import Window

    from lambda_refarch_mapreduce_spark.operators import (
        analytics,
        multimodal,
    )
    from lambda_refarch_mapreduce_spark.plans import catalog_llm

    workdir = args[0] if args else "/tmp/scaling_round5"
    out: dict[str, dict] = {}

    def run(tier, scale, df):
        row = measure(spark, df, mode="count")
        out.setdefault(tier, {})[f"{scale}x"] = row
        _err(f"  {tier} {scale}x: {row}")

    def ahash_dedup(docs):
        key = (F.col("doc_id") % catalog_llm.AHASH_IMAGE_KEYS).cast(
            "string"
        )
        raster = F.concat(
            *[
                F.unhex(F.md5(F.concat(key, F.lit(f":{k}"))))
                for k in range(12)
            ]
        )
        media = docs.select(
            F.col("doc_id").cast("long").alias("media_id"),
            F.concat(F.lit(b"P6\n8 8\n255\n"), raster).alias("content"),
        )
        ah = multimodal.image_ahash(media, grid=(4, 4))
        keeper = F.min("media_id").over(Window.partitionBy("ahash"))
        return ah.select(
            "media_id", "ahash", keeper.alias("keeper"),
            (F.col("media_id") != keeper).alias("is_dup"),
        )

    def vad_report(docs):
        sid = (F.col("doc_id") % 1_000_000).cast("string")
        raster = F.concat(
            *[
                F.unhex(F.md5(F.concat(sid, F.lit(f":w{k}"))))
                for k in range(16)
            ]
        )
        media = docs.select(
            F.col("doc_id").alias("media_id"),
            F.concat(
                F.lit(catalog_llm._WAV_HEADER_128), raster
            ).alias("content"),
        )
        return multimodal.audio_activity_windows(
            media, catalog_llm.VAD_WINDOW, catalog_llm.VAD_ENERGY_THRESHOLD
        )

    def scene_report(docs):
        sid = (F.col("doc_id") % 1_000_000).cast("string")
        frames = [
            F.unhex(
                F.substring(
                    F.md5(F.concat(sid, F.lit(f":s{k // 2}"))), 1, 24
                )
            )
            for k in range(8)
        ]
        media = docs.select(
            F.col("doc_id").alias("media_id"),
            F.concat(
                F.lit(catalog_llm._RAWV_SCENES_HEADER), *frames
            ).alias("content"),
        )
        return multimodal.video_scene_cuts(
            media, catalog_llm.SCENE_DIFF_THRESHOLD
        )

    for scale in (1, 10, 100):
        docs = _r5_docs(spark, workdir, scale)
        run("image_ahash_dedup", scale, ahash_dedup(docs))
        run("audio_vad", scale, vad_report(docs))
        run("video_scenes", scale, scene_report(docs))

    for scale in (1, 10, 100):
        ev = replicated_parquet(
            spark,
            os.path.join(workdir, f"events_{scale}x"),
            load(spark, "events").select(
                "event_id", "ts", "user_id", "event_type", "value"
            ),
            scale,
            lambda df, r: df.select(
                (F.col("event_id") + r * 100_000_000).alias("event_id"),
                "ts",
                (F.col("user_id") + r * 1_000_000).alias("user_id"),
                "event_type",
                "value",
            ),
        )
        run(
            "funnel", scale,
            analytics.funnel(ev, ["view", "click", "purchase"]),
        )
        run("attribution", scale, analytics.last_touch_attribution(ev))
    return out


# ---------------------------------------------------------------------------
# Round 6: KS CDF / market basket / MV overlay (was tools/scaling_round6.py)
# ---------------------------------------------------------------------------


@case("round6")
def round6(spark, args):
    """Round-6: (a) prefix_sums keeps the KS CDF distributed — wall/
    shuffle ~linear in distinct values while the naive single-
    partition window loses by a growing factor (measured 1x/10x
    only); (b) the apriori-pruned basket pair join's shuffle tracks
    (basket, item) volume linearly; (c) the merge-on-read MV refresh
    stays change-cost as the base grows 100x. Prints one JSON line
    per experiment."""
    from lambda_refarch_mapreduce_spark.operators import analytics
    from lambda_refarch_mapreduce_spark.operators.relational import (
        prefix_sums,
    )
    from lambda_refarch_mapreduce_spark.plans.catalog_analytics import (
        BASKET_MAX_ITEMS,
        BASKET_MIN_SUPPORT,
        BASKET_PAIR_TOP_N,
    )

    workdir = args[0] if args else "/tmp/scaling_r6"
    scales = (1, 10, 100)

    def ks_cdf():
        out = {}
        for scale in scales:
            e = replicated_parquet(
                spark,
                os.path.join(workdir, f"ks_{scale}x"),
                load(spark, "events")
                .select("event_type", "value")
                .filter(F.col("event_type").isin("click", "error")),
                scale,
                # per-replica value perturbation so the distinct-value
                # (grouped CDF) frame actually grows with scale
                lambda df, r: df.select(
                    "event_type",
                    (F.col("value") + r * 1e-4).alias("value"),
                ),
            )
            g = e.groupBy(F.col("value").alias("v")).agg(
                F.sum(
                    (F.col("event_type") == "click").cast("long")
                ).alias("ca"),
                F.sum(
                    (F.col("event_type") == "error").cast("long")
                ).alias("cb"),
            )
            cum = prefix_sums(g, [F.col("v")], ["ca", "cb"])
            totals = g.agg(
                F.sum("ca").alias("na"), F.sum("cb").alias("nb")
            )
            d = F.abs(
                F.col("ca_cum") / F.col("na")
                - F.col("cb_cum") / F.col("nb")
            )
            distributed = cum.crossJoin(F.broadcast(totals)).agg(
                F.max(d).alias("d")
            )
            row = {"prefix_sums": measure(spark, distributed, mode="count")}
            if scale <= 10:
                from pyspark.sql.window import Window

                w = Window.orderBy("v").rowsBetween(
                    Window.unboundedPreceding, 0
                )
                naive = (
                    g.select(
                        F.sum("ca").over(w).alias("cca"),
                        F.sum("cb").over(w).alias("ccb"),
                    )
                    .crossJoin(F.broadcast(totals))
                    .agg(
                        F.max(
                            F.abs(
                                F.col("cca") / F.col("na")
                                - F.col("ccb") / F.col("nb")
                            )
                        ).alias("d")
                    )
                )
                row["single_partition_window"] = measure(
                    spark, naive, mode="count"
                )
            out[f"{scale}x"] = row
            _err(f"  ks {scale}x: {row}")
        return out

    def basket():
        out = {}
        for scale in scales:
            li = replicated_parquet(
                spark,
                os.path.join(workdir, f"basket_{scale}x"),
                load(spark, "lineitem").select("l_orderkey", "l_partkey"),
                scale,
                lambda df, r: df.select(
                    (F.col("l_orderkey") + r * 10_000_000).alias("o"),
                    F.col("l_partkey").alias("p"),
                ),
            ).distinct()
            sized = (
                li.groupBy("o")
                .agg(F.count(F.lit(1)).alias("__sz"))
                .filter(F.col("__sz") <= BASKET_MAX_ITEMS)
                .select("o")
            )
            kept = li.join(sized, "o", "left_semi")
            freq = (
                kept.groupBy("p")
                .agg(F.count(F.lit(1)).alias("__sup"))
                .filter(F.col("__sup") >= BASKET_MIN_SUPPORT * scale)
                .select("p")
            )
            fi = kept.join(F.broadcast(freq), "p", "left_semi")
            a = fi.select("o", F.col("p").alias("p_a"))
            b = fi.select("o", F.col("p").alias("p_b"))
            pairs = (
                a.join(b, "o")
                .filter(F.col("p_a") < F.col("p_b"))
                .groupBy("p_a", "p_b")
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.col("n").desc(), "p_a", "p_b")
                .limit(BASKET_PAIR_TOP_N)
            )
            out[f"{scale}x"] = measure(spark, pairs, mode="count")
            _err(f"  basket {scale}x: {out[f'{scale}x']}")
        return out

    def mv_overlay_refresh():
        out = {}
        for scale in scales:
            base = replicated_parquet(
                spark,
                os.path.join(workdir, f"base_{scale}x"),
                load(spark, "orders").select(
                    "o_orderkey", "o_custkey", "o_totalprice"
                ),
                scale,
                lambda df, r: df.select(
                    (F.col("o_orderkey") + r * 10_000_000).alias(
                        "o_orderkey"
                    ),
                    "o_custkey",
                    "o_totalprice",
                ),
            ).withColumn("segment", (F.col("o_custkey") % 50).cast("int"))
            mvp = os.path.join(workdir, f"mv_{scale}x")
            if not os.path.exists(os.path.join(mvp, "_SUCCESS")):
                base.groupBy("segment").agg(
                    F.sum("o_totalprice").alias("revenue"),
                    F.count(F.lit(1)).alias("n_orders"),
                ).write.mode("overwrite").parquet(mvp)
            mv = spark.read.parquet(mvp)
            k = F.col("o_orderkey")
            first = base.filter(k < 10_000_000)
            # FIXED overlay (an earlier batch's winners), FIXED batch
            overlay = first.filter(k % 7 == 0).select(
                "o_orderkey", "o_custkey",
                F.round(F.col("o_totalprice") * 1.1, 2).alias(
                    "o_totalprice"
                ),
                "segment", F.lit(1).cast("long").alias("seq"),
                F.lit("U").alias("op"),
            )
            ovp = os.path.join(workdir, f"overlay_{scale}x")
            if not os.path.exists(os.path.join(ovp, "_SUCCESS")):
                overlay.write.mode("overwrite").parquet(ovp)
            ov = spark.read.parquet(ovp)
            batch = first.filter(k % 14 == 0).select(
                "o_orderkey", "o_custkey",
                F.round(F.col("o_totalprice") * 0.9, 2).alias(
                    "o_totalprice"
                ),
                "segment", F.lit(2).cast("long").alias("seq"),
                F.lit("U").alias("op"),
            )
            eff = analytics.apply_cdc(
                base, ov.select(*base.columns, "seq", "op"),
                ["o_orderkey"], "seq",
            )
            refreshed = analytics.incremental_agg_update(
                mv, eff, batch, ["o_orderkey"], "seq", "op",
                ["segment"], "o_totalprice", "revenue", "n_orders",
            )
            row = measure(spark, refreshed, mode="count")
            row["base_rows"] = base.count()
            out[f"{scale}x"] = row
            _err(f"  mv-overlay {scale}x: {row}")
        return out

    print(json.dumps({"ks_cdf": ks_cdf()}))
    print(json.dumps({"market_basket": basket()}))
    print(json.dumps({"mv_overlay_refresh": mv_overlay_refresh()}))
    return None


# ---------------------------------------------------------------------------
# Round 6b: statistical-inference plans (was tools/scaling_round6b.py)
# ---------------------------------------------------------------------------


@case("round6b")
def round6b(spark, args):
    """Round-6b: gini (global_rank machinery — linear in keys, never
    superlinear), pareto (global_rank + prefix_sums chained), ols
    (one aggregate pass — flat ~KB shuffle at every scale),
    mann_whitney (shuffle saturates at the value alphabet), and the
    geo radius join (radius shrunk by sqrt(scale) so pair output is
    ~constant and the grid machinery's ~linear term is isolated).
    Prints one JSON line per experiment."""
    import math as _math

    from lambda_refarch_mapreduce_spark.operators.geo import (
        radius_self_join,
    )
    from lambda_refarch_mapreduce_spark.operators.relational import (
        global_rank,
        prefix_sums,
    )
    from lambda_refarch_mapreduce_spark.plans.catalog_analytics import (
        _OLS_B0,
        _OLS_B1,
        _OLS_B2,
        _OLS_R2,
    )
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        MW_Z_EXPR as _MW_Z,
    )

    workdir = args[0] if args else "/tmp/scaling_r6b"
    os.makedirs(workdir, exist_ok=True)
    scales = (1, 10, 100)

    def rank_gini():
        out = {}
        for scale in scales:
            o = replicated_parquet(
                spark,
                os.path.join(workdir, f"gini_{scale}x"),
                load(spark, "orders").select("o_custkey", "o_totalprice"),
                scale,
                lambda df, r: df.select(
                    (F.col("o_custkey") + r * 10_000_000).alias(
                        "o_custkey"
                    ),
                    "o_totalprice",
                ),
            )
            g = o.groupBy("o_custkey").agg(
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                ).alias("cents")
            )
            ranked = global_rank(
                g, [F.col("cents"), F.col("o_custkey")], rank_col="i"
            )
            gini = ranked.agg(
                F.round(
                    F.lit(2.0)
                    * F.sum(F.col("i") * F.col("cents"))
                    / (F.count(F.lit(1)) * F.sum("cents"))
                    - (F.count(F.lit(1)) + F.lit(1.0))
                    / F.count(F.lit(1)),
                    6,
                ).alias("gini")
            )
            out[f"{scale}x"] = measure(spark, gini, mode="count")
            _err(f"  gini {scale}x: {out[f'{scale}x']}")
        return out

    def pareto():
        out = {}
        for scale in scales:
            li = replicated_parquet(
                spark,
                os.path.join(workdir, f"pareto_{scale}x"),
                load(spark, "lineitem").select(
                    "l_partkey", "l_extendedprice"
                ),
                scale,
                lambda df, r: df.select(
                    (F.col("l_partkey") + r * 10_000_000).alias("p"),
                    F.col("l_extendedprice"),
                ),
            )
            g = li.groupBy("p").agg(
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("long")
                ).alias("cents")
            )
            ranked = global_rank(
                g, [F.col("cents").desc(), F.col("p")], rank_col="rnk"
            )
            cum = prefix_sums(ranked, [F.col("rnk")], ["cents"])
            tot = g.agg(
                F.sum("cents").alias("total"),
                F.count(F.lit(1)).alias("__n"),
            )
            deciles = (
                cum.crossJoin(F.broadcast(tot))
                .select(
                    F.expr(
                        "cast(((rnk - 1) * 10) div __n + 1 as int)"
                    ).alias("decile"),
                    "cents_cum",
                    "total",
                )
                .groupBy("decile")
                .agg(
                    F.count(F.lit(1)).alias("n_parts"),
                    F.round(
                        F.max("cents_cum") * 1.0 / F.max("total"), 6
                    ).alias("share"),
                )
            )
            out[f"{scale}x"] = measure(spark, deciles, mode="count")
            _err(f"  pareto {scale}x: {out[f'{scale}x']}")
        return out

    def ols():
        out = {}
        for scale in scales:
            li = replicated_parquet(
                spark,
                os.path.join(workdir, f"ols_{scale}x"),
                load(spark, "lineitem").select(
                    "l_quantity", "l_discount", "l_extendedprice"
                ),
                scale,
                lambda df, r: df,  # pure row growth
            )
            s = li.select(
                F.col("l_quantity").cast("long").alias("q"),
                F.round(F.col("l_discount") * 100).cast("long").alias("d"),
                F.round(F.col("l_extendedprice") * 100)
                .cast("long")
                .alias("y"),
            )
            a = s.agg(
                F.count(F.lit(1)).cast("double").alias("n"),
                F.sum("q").cast("double").alias("sq"),
                F.sum("d").cast("double").alias("sd"),
                F.sum("y").cast("double").alias("sy"),
                F.sum(F.col("q") * F.col("q")).cast("double").alias("sqq"),
                F.sum(F.col("d") * F.col("d")).cast("double").alias("sdd"),
                F.sum(F.col("q") * F.col("d")).cast("double").alias("sqd"),
                F.sum(F.col("q") * F.col("y")).cast("double").alias("sqy"),
                F.sum(F.col("d") * F.col("y")).cast("double").alias("sdy"),
                F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
                .cast("double")
                .alias("syy"),
            )
            fit = a.selectExpr(
                f"round({_OLS_B0} / 100.0, 4) AS b0",
                f"round({_OLS_B1} / 100.0, 4) AS b1",
                f"round({_OLS_B2} / 100.0, 4) AS b2",
                f"round({_OLS_R2}, 6) AS r2",
            )
            out[f"{scale}x"] = measure(spark, fit, mode="count")
            _err(f"  ols {scale}x: {out[f'{scale}x']}")
        return out

    def mann_whitney():
        out = {}
        for scale in scales:
            e = replicated_parquet(
                spark,
                os.path.join(workdir, f"mw_{scale}x"),
                load(spark, "events")
                .select("event_type", "value")
                .filter(F.col("event_type").isin("purchase", "click")),
                scale,
                lambda df, r: df,  # pure row growth, fixed alphabet
            )
            g = e.groupBy(
                F.round(F.col("value") * 100).cast("long").alias("v")
            ).agg(
                F.sum(
                    (F.col("event_type") == "purchase").cast("long")
                ).alias("cp"),
                F.sum(
                    (F.col("event_type") == "click").cast("long")
                ).alias("cc"),
            )
            cum = prefix_sums(g, [F.col("v")], ["cc"])
            t = F.col("cp") + F.col("cc")
            a = cum.agg(
                F.sum("cp").alias("n1"),
                F.sum("cc").alias("n2"),
                F.sum(
                    F.col("cp")
                    * (2 * (F.col("cc_cum") - F.col("cc")) + F.col("cc"))
                ).alias("u2"),
                F.sum(t * t * t - t).alias("ties"),
            ).selectExpr(
                "round(u2 / (2e0 * n1 * n2), 6) AS auc",
                f"round({_MW_Z}, 6) AS z",
            )
            out[f"{scale}x"] = measure(spark, a, mode="count")
            _err(f"  mw {scale}x: {out[f'{scale}x']}")
        return out

    def geo_radius():
        out = {}
        for scale in scales:
            pts = replicated_parquet(
                spark,
                os.path.join(workdir, f"geo_{scale}x"),
                load(spark, "customer").select("c_custkey"),
                scale,
                lambda df, r: df.select(
                    (F.col("c_custkey") + r * 10_000_000).alias("id")
                ),
            ).selectExpr(
                "id",
                "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8), 16,"
                " 10) AS BIGINT) AS ulat",
                "CAST(conv(substring(md5(CAST(id AS STRING)), 9, 8), 16,"
                " 10) AS BIGINT) AS ulon",
            ).selectExpr(
                "id",
                "(25 + 24 * (ulat / 4294967296e0)) AS lat",
                "(-124 + 57 * (ulon / 4294967296e0)) AS lon",
            )
            r_km = 50.0 / _math.sqrt(scale)
            pairs = radius_self_join(
                pts, "id", "lat", "lon", r_km, max_abs_lat=49.0
            )
            out[f"{scale}x"] = {
                "radius_km": round(r_km, 2),
                **measure(spark, pairs, mode="count"),
            }
            _err(f"  geo {scale}x: {out[f'{scale}x']}")
        return out

    for name, fn in [
        ("rank_gini", rank_gini),
        ("pareto", pareto),
        ("ols", ols),
        ("mann_whitney", mann_whitney),
        ("geo_radius", geo_radius),
    ]:
        print(json.dumps({"experiment": name, "scales": fn()}))
    return None


# ---------------------------------------------------------------------------
# Round 8: bloom prefilter + alphabet saturation (was tools/scaling_round8.py)
# ---------------------------------------------------------------------------


@case("round8")
def round8(spark, args):
    """Round-8: the bloom prefilter's probe-shuffle elimination in the
    no-broadcast regime, log_rank's (group x time) alphabet
    saturation, and cuped's |users| saturation at 1x/10x/100x. Args:
    [workdir] [measure_key] — with a key (e.g. bloom_plain_10x) only
    that variant is measured (one variant per process)."""
    from lambda_refarch_mapreduce_spark.operators import (
        analytics,
        sketch,
    )

    workdir = args[0] if args else "/tmp/spark_graft_scaling_r8"
    only = args[1] if len(args) > 1 else None
    os.makedirs(workdir, exist_ok=True)

    def wanted(key: str) -> bool:
        return only is None or key == only

    def bloom_prefilter():
        n_keys, key_space = 50_000, 5_000_000
        n_bits, k = 1 << 20, 2
        keys_path = write_once(
            spark.range(n_keys).select((F.col("id") * 97).alias("k")),
            os.path.join(workdir, "bloom_keys"),
        )
        probes = {}
        for scale in (1, 10):
            probes[scale] = os.path.join(
                workdir, f"bloom_probe_{scale}x"
            )
            if not os.path.exists(
                os.path.join(probes[scale], "_SUCCESS")
            ):
                o = load(spark, "orders")
                big = union_replicas(
                    o,
                    scale,
                    lambda df, r: df.select(
                        F.pmod(
                            F.xxhash64(
                                F.col("o_orderkey") + F.lit(r * 1_000_000)
                            ),
                            F.lit(key_space),
                        ).alias("pk"),
                        "o_totalprice",
                    ),
                )
                write_once(big, probes[scale])
        keys = spark.read.parquet(keys_path)
        words = sketch.bloom_words(
            sketch.bloom_bits(keys, "k", n_bits, k), n_bits
        )
        out = {
            "exp": "bloom_prefilter",
            "n_keys": n_keys,
            "n_bits": n_bits,
        }
        old_static = spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        )
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
            )
            for scale, path in probes.items():
                probe = spark.read.parquet(path)
                plain = probe.join(
                    keys, probe["pk"] == keys["k"], "left_semi"
                ).agg(
                    F.sum(F.round(F.col("o_totalprice") * 100)).alias("s")
                )
                bloomed = (
                    probe.filter(
                        sketch.bloom_might_contain(
                            F.col("pk"), words, n_bits, k
                        )
                    )
                    .join(keys, F.col("pk") == keys["k"], "left_semi")
                    .agg(
                        F.sum(F.round(F.col("o_totalprice") * 100)).alias(
                            "s"
                        )
                    )
                )
                if wanted(f"bloom_plain_{scale}x"):
                    out[f"plain_{scale}x"] = measure(
                        spark, plain, mode="count"
                    )
                if wanted(f"bloom_bloom_{scale}x"):
                    out[f"bloom_{scale}x"] = measure(
                        spark, bloomed, mode="count"
                    )
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", old_static
            )
            spark.conf.unset(
                "spark.sql.adaptive.autoBroadcastJoinThreshold"
            )
        return out

    def orders_replicated(scale):
        """Row growth WITHOUT key growth: same customers, same dates —
        the per-key collapse must absorb every replica map-side."""
        return replicated_parquet(
            spark,
            os.path.join(workdir, f"orders_rep_{scale}x"),
            load(spark, "orders").select("o_custkey", "o_orderdate"),
            scale,
            lambda df, r: df,
        )

    def log_rank_saturation():
        seg = load(spark, "customer").select(
            F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
        )
        out = {"exp": "log_rank_saturation"}
        for scale in (1, 10, 100):
            o = orders_replicated(scale).select(
                "o_custkey", F.to_date("o_orderdate").alias("d")
            )
            pu = o.groupBy("o_custkey").agg(
                F.min("d").alias("f"), F.max("d").alias("l")
            )
            hz = o.agg(F.max("d").alias("h"))
            subj = (
                pu.join(seg, "o_custkey")
                .crossJoin(F.broadcast(hz))
                .select(
                    (F.datediff("l", "f") + 1).cast("long").alias("t"),
                    (F.datediff("h", "l") >= 365).cast("int").alias(
                        "event"
                    ),
                    F.col("c_mktsegment").alias("g"),
                )
            )
            df = analytics.log_rank_from_subjects(
                subj, "t", "event", "g", "BUILDING", "MACHINERY"
            )
            if wanted(f"logrank_{scale}x"):
                out[f"{scale}x"] = measure(spark, df, mode="count")
        return out

    def cuped_saturation():
        out = {"exp": "cuped_saturation"}
        for scale in (1, 10, 100):
            e = replicated_parquet(
                spark,
                os.path.join(workdir, f"events_rep_{scale}x"),
                load(spark, "events").select(
                    "user_id",
                    F.to_date("ts").alias("dd"),
                    "event_type",
                    F.round(F.col("value") * 100)
                    .cast("long")
                    .alias("cents"),
                ),
                scale,
                lambda df, r: df,
            )
            mn = e.agg(F.min("dd").alias("m"))
            pre = F.datediff("dd", "m") < 15
            pu = (
                e.crossJoin(F.broadcast(mn))
                .groupBy("user_id")
                .agg(
                    F.sum(
                        F.when(pre, F.col("cents")).otherwise(0)
                    ).alias("x"),
                    F.sum(
                        F.when(
                            (~pre)
                            & (F.col("event_type") == "purchase"),
                            F.col("cents"),
                        ).otherwise(0)
                    ).alias("y"),
                )
            )
            units = pu.select(
                "y",
                "x",
                F.when(
                    F.pmod(F.col("user_id"), F.lit(2)) == 0, F.lit("a")
                )
                .otherwise(F.lit("b"))
                .alias("g"),
            )
            df = analytics.cuped_adjusted_diff(
                units, "y", "x", "g", "a", "b"
            )
            if wanted(f"cuped_{scale}x"):
                out[f"{scale}x"] = measure(spark, df, mode="count")
        return out

    for fn in (bloom_prefilter, log_rank_saturation, cuped_saturation):
        row = fn()
        if len(row) > (3 if row["exp"] == "bloom_prefilter" else 1):
            print(json.dumps(row), flush=True)
    return None


# ---------------------------------------------------------------------------
# Round 9: interval-overlap growth + skew regimes (was scaling_round9.py)
# ---------------------------------------------------------------------------

_R9_BASE_ROWS = 150_000  # ~ sf0.1 orders
_R9_ROWS_PER_KEY = 15
_R9_KEY_WINDOW = 400
_R9_BUCKET_W = 16
_R9_HOT_FRAC = 0.005
_R9_HOT_BUCKETS = 10


@case(
    "round9",
    extra_conf={
        # SMJ regime at every scale: the curve and the skew claim are
        # about the shuffled join, not broadcast
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    },
)
def round9(spark, args):
    """Round-9: interval_overlap_join's growth curve (per-key density
    fixed, key alphabet grows — expect linear) and its two hot-cell
    regimes: the SELF-JOIN hot cell is output-bound (AQE skew split
    correctly no-fires — no input split shrinks an |L|x|R| product;
    mitigations are semantic: bucket_width, max_fanout) while the
    ASYMMETRIC hot cell is input-bound and OptimizeSkewedJoin must
    engage (skew=true under proportionate thresholds). Plus spearman/
    sprt/attribution growth. Args: [workdir] [measure_key]."""
    from lambda_refarch_mapreduce_spark.operators.relational import (
        interval_overlap_join,
        prefix_sums,
    )
    from tools import scaling_harness

    workdir = args[0] if args else "/tmp/spark_graft_scaling_r9"
    only = args[1] if len(args) > 1 else None
    os.makedirs(workdir, exist_ok=True)

    def wanted(key: str) -> bool:
        return only is None or key == only

    def intervals(scale: int, hot: bool):
        """Deterministic synthetic intervals: n rows over n/15 keys,
        each key's ~15 intervals uniform in its own 400-unit window
        (per-key overlap density scale-invariant); ``hot`` reassigns
        HOT_FRAC of all rows to key 0 in HOT_BUCKETS buckets."""
        n = _R9_BASE_ROWS * scale
        n_keys = n // _R9_ROWS_PER_KEY
        base = spark.range(n).select(
            F.col("id"),
            F.pmod(F.col("id"), F.lit(n_keys)).alias("key"),
            F.pmod(F.xxhash64("id"), F.lit(_R9_KEY_WINDOW)).alias("off"),
            (10 + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(20))).alias(
                "len"
            ),
        )
        ivl = base.select(
            "id",
            "key",
            (F.col("key") * 1000 + F.col("off")).alias("s"),
            (F.col("key") * 1000 + F.col("off") + F.col("len")).alias("e"),
        )
        if hot:
            n_hot = int(n * _R9_HOT_FRAC)
            span = _R9_HOT_BUCKETS * _R9_BUCKET_W
            ivl = ivl.select(
                "id",
                F.when(F.col("id") < n_hot, F.lit(0))
                .otherwise(F.col("key"))
                .alias("key"),
                F.when(
                    F.col("id") < n_hot,
                    F.pmod(F.xxhash64("id", F.lit(2)), F.lit(span)),
                )
                .otherwise(F.col("s"))
                .alias("s"),
                F.when(
                    F.col("id") < n_hot,
                    F.pmod(F.xxhash64("id", F.lit(2)), F.lit(span))
                    + F.col("e")
                    - F.col("s"),
                )
                .otherwise(F.col("e"))
                .alias("e"),
            )
        return ivl

    def pairs(path):
        df = spark.read.parquet(path)
        left = df.select(
            "key", F.col("id").alias("ka"), F.col("s").alias("sa"),
            F.col("e").alias("ea"),
        )
        right = df.select(
            "key", F.col("id").alias("kb"), F.col("s").alias("sb"),
            F.col("e").alias("eb"),
        )
        return interval_overlap_join(
            left, right, ["key"], "sa", "ea", "sb", "eb", _R9_BUCKET_W
        ).filter(F.col("ka") < F.col("kb"))

    def growth():
        out = {
            "exp": "interval_overlap_growth",
            "bucket_w": _R9_BUCKET_W,
        }
        for scale in (1, 10, 100):
            path = os.path.join(workdir, f"ivl_uniform_{scale}x")
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                write_once(intervals(scale, hot=False), path)
            if wanted(f"uniform_{scale}x"):
                out[f"uniform_{scale}x"] = measure(
                    spark, pairs(path), mode="count_self"
                )
        return out

    def asym_tables():
        """A 1.5M-row probe with HALF its rows on key 0 inside a
        10-bucket hot window, joined to the thin 150k uniform side."""
        n = _R9_BASE_ROWS * 10
        n_hot = n // 2
        span = _R9_HOT_BUCKETS * _R9_BUCKET_W
        probe = intervals(10, hot=False).select(
            "id",
            F.when(F.col("id") < n_hot, F.lit(0))
            .otherwise(F.col("key"))
            .alias("key"),
            F.when(
                F.col("id") < n_hot,
                F.pmod(F.xxhash64("id", F.lit(3)), F.lit(span)),
            )
            .otherwise(F.col("s"))
            .alias("s"),
            F.when(
                F.col("id") < n_hot,
                F.pmod(F.xxhash64("id", F.lit(3)), F.lit(span))
                + F.col("e")
                - F.col("s"),
            )
            .otherwise(F.col("e"))
            .alias("e"),
        )
        ppath = os.path.join(workdir, "ivl_asym_probe")
        if not os.path.exists(os.path.join(ppath, "_SUCCESS")):
            write_once(probe, ppath)
        wpath = os.path.join(workdir, "ivl_asym_windows")
        if not os.path.exists(os.path.join(wpath, "_SUCCESS")):
            write_once(intervals(1, hot=False), wpath)
        return ppath, wpath

    def asym_pairs(ppath, wpath):
        p = spark.read.parquet(ppath)
        w = spark.read.parquet(wpath)
        left = p.select(
            "key", F.col("id").alias("ka"), F.col("s").alias("sa"),
            F.col("e").alias("ea"),
        )
        right = w.select(
            "key", F.col("id").alias("kb"), F.col("s").alias("sb"),
            F.col("e").alias("eb"),
        )
        return interval_overlap_join(
            left, right, ["key"], "sa", "ea", "sb", "eb", _R9_BUCKET_W
        )

    def skew():
        out = {
            "exp": "interval_overlap_skew",
            "hot_frac": _R9_HOT_FRAC,
            "hot_buckets": _R9_HOT_BUCKETS,
        }
        if only is None or only.startswith("selfjoin"):
            path = os.path.join(workdir, "ivl_hot_10x")
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                write_once(intervals(10, hot=True), path)
        if wanted("selfjoin_hot"):
            out["selfjoin_hot"] = measure(
                spark, pairs(path), mode="count_self"
            )
            out["selfjoin_hot"]["aqe_skew_split"] = (
                "skew=true" in scaling_harness.LAST_PLAN
            )
        if only is None or only.startswith("asym"):
            ppath, wpath = asym_tables()
        if wanted("asym_default"):
            out["asym_default"] = measure(
                spark, asym_pairs(ppath, wpath), mode="count_self"
            )
            out["asym_default"]["aqe_skew_split"] = (
                "skew=true" in scaling_harness.LAST_PLAN
            )
        if wanted("asym_scaled_thresholds"):
            old = {
                k: spark.conf.get(k, None)
                for k in (
                    "spark.sql.adaptive.skewJoin."
                    "skewedPartitionThresholdInBytes",
                    "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                    "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                )
            }
            try:
                # cluster defaults (256 MB / 5x) scaled to sf0.1-size
                # partitions — proportionate, not exotic
                spark.conf.set(
                    "spark.sql.adaptive.skewJoin."
                    "skewedPartitionThresholdInBytes",
                    "2m",
                )
                spark.conf.set(
                    "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                    "2",
                )
                spark.conf.set(
                    "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                    "1m",
                )
                out["asym_scaled_thresholds"] = measure(
                    spark, asym_pairs(ppath, wpath), mode="count_self"
                )
                out["asym_scaled_thresholds"]["aqe_skew_split"] = (
                    "skew=true" in scaling_harness.LAST_PLAN
                )
            finally:
                for k, v in old.items():
                    if v is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, v)
        return out

    def events_replicated(scale):
        """Row growth WITHOUT alphabet growth: same users, same days,
        same value distribution."""
        return replicated_parquet(
            spark,
            os.path.join(workdir, f"events_rep_{scale}x"),
            load(spark, "events").select(
                "user_id", "ts", "event_type", "value", "event_id"
            ),
            scale,
            lambda df, r: df,
        )

    def spearman_growth():
        """Rank-building saturates at the VALUE ALPHABET under row
        replication; the rank join-back is the honest linear term."""
        from lambda_refarch_mapreduce_spark.operators.analytics import (
            spearman_rho,
        )

        out = {"exp": "spearman_growth"}
        for scale in (1, 10, 100):
            e = events_replicated(scale).select(
                F.pmod(F.col("user_id"), F.lit(97)).alias("x"),
                F.round(F.col("value") * 100).cast("long").alias("y"),
            )
            if wanted(f"spearman_{scale}x"):
                out[f"spearman_{scale}x"] = measure(
                    spark, spearman_rho(e, "x", "y"), mode="count_self"
                )
        return out

    def sprt_growth():
        """Rows collapse map-side into the DAY alphabet before the
        prefix-sum exchange — shuffle saturates at |days|."""
        out = {"exp": "sprt_growth"}
        for scale in (1, 10, 100):
            if not wanted(f"sprt_{scale}x"):
                continue
            day = (
                events_replicated(scale)
                .filter(F.col("event_type").isin("purchase", "click"))
                .select(
                    F.datediff(
                        F.to_date("ts"), F.lit("1970-01-01").cast("date")
                    )
                    .cast("long")
                    .alias("dd"),
                    F.when(F.col("event_type") == "purchase", 1)
                    .otherwise(0)
                    .alias("is_x"),
                )
                .groupBy("dd")
                .agg(
                    F.sum("is_x").alias("x"),
                    F.count(F.lit(1)).alias("m"),
                )
            )
            cum = prefix_sums(day, [F.col("dd")], ["x", "m"])
            walk = cum.select(
                "dd",
                (
                    F.col("x_cum") * 223144
                    + (F.col("m_cum") - F.col("x_cum")) * (-182322)
                ).alias("v"),
            )
            out[f"sprt_{scale}x"] = measure(
                spark, walk, mode="count_self"
            )
        return out

    def attribution_growth():
        """ONE user-keyed window pass — rows replicate with a FIXED
        user population, so shuffle is honestly LINEAR; measured
        COLLECTED (count would let Catalyst prune credit, the windows
        and the whole user-keyed exchange — the r9 lesson)."""
        from pyspark.sql.window import Window

        out = {"exp": "attribution_growth"}
        for scale in (1, 10, 100):
            if not wanted(f"attribution_{scale}x"):
                continue
            e = events_replicated(scale)
            w = Window.partitionBy("user_id").orderBy("ts", "event_id")
            wk = Window.partitionBy("user_id")
            j = e.select(
                F.col("event_type").alias("channel"),
                F.row_number().over(w).alias("rn"),
                F.count(F.lit(1)).over(wk).alias("k"),
            )
            cr = j.select(
                "channel",
                F.when(F.col("k") == 1, F.lit(10000000000))
                .when(F.col("k") == 2, F.lit(5000000000))
                .when(
                    (F.col("rn") == 1) | (F.col("rn") == F.col("k")),
                    F.lit(4000000000),
                )
                .otherwise(F.expr("2000000000 div (k - 2)"))
                .alias("credit"),
            )
            out[f"attribution_{scale}x"] = measure(
                spark,
                cr.groupBy("channel").agg(F.sum("credit").alias("c")),
            )
        return out

    for fn in (
        growth,
        skew,
        spearman_growth,
        sprt_growth,
        attribution_growth,
    ):
        row = fn()
        if any(isinstance(v, dict) for v in row.values()):
            print(json.dumps(row), flush=True)
    return None


# ---------------------------------------------------------------------------
# Rounds 10-12: keyed single-variant statistics measurements
# (were tools/scaling_round10.py / 11 / 11b / 12)
# ---------------------------------------------------------------------------


def _series_by_keys(spark, n_keys: int, series_days: int = 360):
    """n_keys keys x series_days days, integer values with a weekly
    wobble — per-key length fixed, key alphabet grows."""
    n = n_keys * series_days
    return spark.range(n).select(
        F.pmod(F.col("id"), F.lit(n_keys)).alias("k"),
        (F.col("id") / F.lit(n_keys)).cast("long").alias("t"),
        (
            1000
            + F.pmod(F.col("id"), F.lit(7)) * 10
            + F.pmod(F.xxhash64("id"), F.lit(100))
        ).alias("v"),
    )


def _day_series(spark, n_days: int, level_shift: bool = False):
    v = (
        1000
        + F.pmod(F.col("id"), F.lit(7)) * 10
        + F.pmod(F.xxhash64("id"), F.lit(100))
    )
    if level_shift:
        # a level shift mid-series so the located changepoint is real
        v = v + F.when(F.col("id") * 2 > n_days, 500).otherwise(0)
    return spark.range(n_days).select(
        F.col("id").alias("t"), v.alias("v")
    )


def _group_value_counts(spark, n_rows: int, alphabet: int, shifted=False):
    """(g, v, c) over 5 groups x a hashed value alphabet; ``shifted``
    adds a mild per-group location shift (the mood/KW frames)."""
    v = F.pmod(F.xxhash64("id"), F.lit(alphabet))
    if shifted:
        v = v + F.pmod(F.col("id"), F.lit(5)) * (alphabet // 100 + 1)
    rows = spark.range(n_rows).select(
        F.pmod(F.col("id"), F.lit(5)).cast("string").alias("g"),
        v.alias("v"),
    )
    return rows.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))


def _block_cells(spark, n_blocks: int, k: int = 5):
    return spark.range(n_blocks * k).select(
        (F.col("id") / k).cast("long").alias("b"),
        F.pmod(F.col("id"), F.lit(k)).cast("string").alias("t"),
        (
            1000
            + F.pmod(F.col("id"), F.lit(k)) * 3
            + F.pmod(F.xxhash64("id"), F.lit(50))
        ).alias("x"),
    )


@case("round10")
def round10(spark, args):
    """Round-10 keyed measurements: the sorted-array fold tier
    (holt_winters / backtest — linear in keys; one key's series sits
    in ONE agg buffer, so series growth is the measured adversarial
    axis), isotonic_fit_binned's O(n^3/6) bin-alphabet term, BH/FDR
    corpus growth, and the pre-staged r11 kernels (decompose /
    changepoint / AD). One MEASURE_KEY per process; keys as in
    SCALING.md round 10."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        TWO_PROP_Z_EXPR,
        anderson_darling_from_value_counts,
        bh_fdr_from_z,
        bh_thresholds,
        cusum_changepoint,
        holt_winters_from_series,
        isotonic_fit_binned,
        rolling_backtest_holt,
        seasonal_decompose_additive,
    )

    BASE_KEYS = 1_000
    BASE_DAYS = 36_500  # a century of daily points, single key
    ISO_ROWS = 10_000_000
    BH_ROWS = 1_000_000
    key = args[0]

    def single_series(n_days):
        return _day_series(spark, n_days).select(
            F.lit(0).alias("k"), "t", "v"
        )

    def iso_corpus(n_bins):
        rows = spark.range(ISO_ROWS).select(
            F.pmod(F.xxhash64("id"), F.lit(n_bins)).alias("bin"),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100)) < 40)
            .cast("long")
            .alias("is_s"),
        )
        return rows.groupBy("bin").agg(
            F.count(F.lit(1)).alias("w"), F.sum("is_s").alias("x")
        )

    def bh_corpus(n_rows):
        rows = spark.range(n_rows).select(
            F.pmod(F.col("id"), F.lit(7)).alias("dow"),
            (F.pmod(F.xxhash64("id"), F.lit(100)) < 30)
            .cast("long")
            .alias("is_p"),
        )
        g = rows.groupBy("dow").agg(
            F.count(F.lit(1)).alias("nd"), F.sum("is_p").alias("xd")
        )
        tot = g.agg(F.sum("nd").alias("nt"), F.sum("xd").alias("xt"))
        z = g.crossJoin(F.broadcast(tot)).selectExpr(
            "dow", "nd", "xd", f"{TWO_PROP_Z_EXPR} AS z"
        )
        return bh_fdr_from_z(z, ["dow"], "z", bh_thresholds(7, 0.05))

    if key.startswith("hw_keys_"):
        scale = int(key.removeprefix("hw_keys_").removesuffix("x"))
        df = holt_winters_from_series(
            _series_by_keys(spark, BASE_KEYS * scale), ["k"], ["t"], "v"
        )
        row = measure(spark, df)
        row["n_keys"] = BASE_KEYS * scale
    elif key.startswith("hw_series_"):
        scale = int(key.removeprefix("hw_series_").removesuffix("x"))
        df = holt_winters_from_series(
            single_series(BASE_DAYS * scale), ["k"], ["t"], "v"
        )
        row = measure(spark, df)
        row["n_days"] = BASE_DAYS * scale
    elif key == "backtest_keys_100x":
        df = rolling_backtest_holt(
            _series_by_keys(spark, BASE_KEYS * 100), ["k"], ["t"], "v"
        )
        row = measure(spark, df)
        row["n_keys"] = BASE_KEYS * 100
    elif key.startswith("iso_bins_"):
        n_bins = int(key.removeprefix("iso_bins_"))
        df = isotonic_fit_binned(iso_corpus(n_bins), "bin", "w", "x")
        row = measure(spark, df)
        row["n_bins"] = n_bins
        row["span_rows_est"] = n_bins ** 3 // 6
    elif key.startswith("dc_keys_"):
        scale = int(key.removeprefix("dc_keys_").removesuffix("x"))
        df = seasonal_decompose_additive(
            _series_by_keys(spark, BASE_KEYS * scale), ["k"], "t", "v"
        )
        row = measure(spark, df)
        row["n_keys"] = BASE_KEYS * scale
    elif key.startswith("cp_series_"):
        scale = int(key.removeprefix("cp_series_").removesuffix("x"))
        df = cusum_changepoint(
            single_series(BASE_DAYS * scale).select("t", "v"), "t", "v"
        )
        row = measure(spark, df)
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
        row = measure(spark, df)
        row["n_values"] = n_vals
    elif key.startswith("bh_rows_"):
        scale = int(key.removeprefix("bh_rows_").removesuffix("x"))
        row = measure(spark, bh_corpus(BH_ROWS * scale))
        row["n_rows"] = BH_ROWS * scale
    else:
        raise SystemExit(f"unknown key {key!r}")
    row["key"] = key
    return row


@case("round11")
def round11(spark, args):
    """Round-11 keyed measurements: Pettitt's quadratic-in-days pair
    set (difference array keeps the split dimension free), Kruskal-
    Wallis corpus/alphabet growth, the 3-state HW backtest's byte
    parity with the r10 fold, and the pre-staged Friedman block
    growth. One MEASURE_KEY per process; keys as in SCALING.md."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        friedman_from_blocks,
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
    key = args[0]

    if key.startswith("pt_series_"):
        scale = int(key.removeprefix("pt_series_").removesuffix("x"))
        n = PT_BASE_DAYS * scale
        df = pettitt_changepoint(
            _day_series(spark, n, level_shift=True), "t", "v"
        )
        row = measure(spark, df)
        row["n_days"] = n
        row["n_pairs"] = n * (n - 1) // 2
    elif key.startswith("kw_rows_"):
        scale = int(key.removeprefix("kw_rows_").removesuffix("x"))
        n = KW_BASE_ROWS * scale
        df = kruskal_wallis_from_counts(
            _group_value_counts(spark, n, KW_ROWS_ALPHA)
        )
        row = measure(spark, df)
        row["n_rows"] = n
    elif key.startswith("kw_alpha_"):
        alpha = {"1k": 1_000, "10k": 10_000, "100k": 100_000}[
            key.removeprefix("kw_alpha_")
        ]
        df = kruskal_wallis_from_counts(
            _group_value_counts(spark, KW_ALPHA_ROWS, alpha)
        )
        row = measure(spark, df)
        row["alphabet"] = alpha
    elif key.startswith("hwbt_keys_"):
        scale = int(key.removeprefix("hwbt_keys_").removesuffix("x"))
        df = rolling_backtest_hw(
            _series_by_keys(spark, HWBT_BASE_KEYS * scale),
            ["k"],
            ["t"],
            "v",
        )
        row = measure(spark, df)
        row["n_keys"] = HWBT_BASE_KEYS * scale
    elif key.startswith("fd_blocks_"):
        scale = int(key.removeprefix("fd_blocks_").removesuffix("x"))
        nb = 1_000 * scale
        df = friedman_from_blocks(
            _block_cells(spark, nb), "b", "t", "x"
        )
        row = measure(spark, df)
        row["n_blocks"] = nb
    elif key == "hw_keys_ref_100x":
        df = holt_winters_from_series(
            _series_by_keys(spark, HWBT_BASE_KEYS * 100),
            ["k"],
            ["t"],
            "v",
        )
        row = measure(spark, df)
        row["n_keys"] = HWBT_BASE_KEYS * 100
    else:
        raise SystemExit(f"unknown key {key!r}")
    row["key"] = key
    return row


@case("round11b")
def round11b(spark, args):
    """Round-11 second wave: the eight newly pre-staged statistics
    kernels on their claimed scale axes (JT corpus/alphabet, runs/
    Ljung-Box day series, Gehan time alphabet, Page's L blocks,
    McNemar/WSR row growth, Cochran's Q blocks, Kuiper/CvM alphabet).
    One MEASURE_KEY per process; keys as in SCALING.md."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cochran_q_from_blocks,
        cvm_from_value_counts,
        gehan_wilcoxon_from_counts,
        jonckheere_terpstra_from_counts,
        kuiper_from_value_counts,
        ljung_box_from_series,
        mcnemar_from_pairs,
        page_l_from_blocks,
        runs_test_from_series,
        wilcoxon_signed_rank_from_pairs,
    )

    JT_BASE_ROWS = 1_000_000
    JT_ROWS_ALPHA = 10_000
    JT_ALPHA_ROWS = 10_000_000
    key = args[0]

    if key.startswith("jt_rows_"):
        scale = int(key.removeprefix("jt_rows_").removesuffix("x"))
        n = JT_BASE_ROWS * scale
        df = jonckheere_terpstra_from_counts(
            _group_value_counts(spark, n, JT_ROWS_ALPHA)
        )
        row = measure(spark, df)
        row["n_rows"] = n
    elif key.startswith("jt_alpha_"):
        alpha = {"1k": 1_000, "10k": 10_000, "100k": 100_000}[
            key.removeprefix("jt_alpha_")
        ]
        df = jonckheere_terpstra_from_counts(
            _group_value_counts(spark, JT_ALPHA_ROWS, alpha)
        )
        row = measure(spark, df)
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
        row = measure(spark, df)
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
                    (F.pmod("id", F.lit(2)) == 1) & (F.col("id") > nt),
                    10,
                ).otherwise(0)
            ).alias("d"),
            (10 + F.pmod(F.xxhash64("id", "id"), F.lit(10))).alias("c"),
        )
        row = measure(spark, gehan_wilcoxon_from_counts(per_gt))
        row["n_times"] = nt
    elif key.startswith("page_blocks_"):
        scale = int(key.removeprefix("page_blocks_").removesuffix("x"))
        nb = 1_000 * scale
        row = measure(
            spark,
            page_l_from_blocks(_block_cells(spark, nb), "b", "t", "x"),
        )
        row["n_blocks"] = nb
    elif key.startswith("mcnemar_rows_"):
        n = {"1m": 1_000_000, "10m": 10_000_000, "100m": 100_000_000}[
            key.removeprefix("mcnemar_rows_")
        ]
        pairs = spark.range(n).select(
            (F.pmod(F.xxhash64("id"), F.lit(10)) < 4).alias("a"),
            (F.pmod(F.xxhash64("id", "id"), F.lit(10)) < 3).alias("b"),
        )
        row = measure(spark, mcnemar_from_pairs(pairs))
        row["n_rows"] = n
    elif key.startswith("wsr_rows_"):
        n = {"1m": 1_000_000, "10m": 10_000_000, "100m": 100_000_000}[
            key.removeprefix("wsr_rows_")
        ]
        pairs = spark.range(n).select(
            F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("a"),
            F.pmod(F.xxhash64("id", "id"), F.lit(10_500)).alias("b"),
        )
        row = measure(spark, wilcoxon_signed_rank_from_pairs(pairs))
        row["n_rows"] = n
    elif key.startswith("cq_blocks_"):
        scale = int(key.removeprefix("cq_blocks_").removesuffix("x"))
        nb = 1_000 * scale
        k = 5
        cells = spark.range(nb * k).select(
            (F.col("id") / k).cast("long").alias("b"),
            F.pmod(F.col("id"), F.lit(k)).cast("string").alias("t"),
            (
                F.pmod(F.xxhash64("id"), F.lit(10))
                < 3 + F.pmod("id", F.lit(k))
            )
            .cast("long")
            .alias("x"),
        )
        row = measure(
            spark, cochran_q_from_blocks(cells, "b", "t", "x")
        )
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
        row = measure(spark, kern(counts))
        row["alphabet"] = alpha
    else:
        raise SystemExit(f"unknown key {key!r}")
    row["key"] = key
    return row


@case("round12")
def round12(spark, args):
    """Round-12 keyed measurements: Mood's median, the G-test and
    Cohen's kappa on their claimed axes (corpus growth = scan term
    only; alphabet/cell growth = the adversarial linear term). One
    MEASURE_KEY per process; keys as in SCALING.md round 12."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cohens_kappa_from_pairs,
        contingency_counts,
        g_test_from_contingency,
        mood_median_from_counts,
    )

    MOOD_ROWS_ALPHA = 10_000
    MOOD_ALPHA_ROWS = 10_000_000
    GTEST_ALPHA_ROWS = 10_000_000
    KAPPA_ALPHA_ROWS = 10_000_000
    key = args[0]

    def gtest_frame(n_rows, ka, kb):
        return spark.range(n_rows).select(
            F.pmod(F.xxhash64("id"), F.lit(ka)).cast("string").alias("a"),
            # a weak dependence between a and b so G is non-trivial
            F.pmod(
                F.xxhash64("id", "id") + F.pmod(F.col("id"), F.lit(ka)),
                F.lit(kb),
            ).alias("b"),
        )

    def kappa_pairs(n_rows, n_labels):
        # rater b agrees with rater a ~60% of the time
        a = F.pmod(F.xxhash64("id"), F.lit(n_labels))
        return spark.range(n_rows).select(
            a.cast("string").alias("a"),
            F.when(F.pmod(F.xxhash64("id", "id"), F.lit(10)) < 6, a)
            .otherwise(
                F.pmod(F.xxhash64("id", "id", "id"), F.lit(n_labels))
            )
            .cast("string")
            .alias("b"),
        )

    if key.startswith("mood_rows_"):
        n = {"1m": 1_000_000, "10m": 10_000_000, "100m": 100_000_000}[
            key.removeprefix("mood_rows_")
        ]
        df = mood_median_from_counts(
            _group_value_counts(spark, n, MOOD_ROWS_ALPHA, shifted=True)
        )
        row = measure(spark, df)
        row["n_rows"] = n
    elif key.startswith("mood_alpha_"):
        alpha = {"1k": 1_000, "10k": 10_000, "100k": 100_000}[
            key.removeprefix("mood_alpha_")
        ]
        df = mood_median_from_counts(
            _group_value_counts(
                spark, MOOD_ALPHA_ROWS, alpha, shifted=True
            )
        )
        row = measure(spark, df)
        row["alphabet"] = alpha
    elif key.startswith("gtest_rows_"):
        n = {"1m": 1_000_000, "10m": 10_000_000, "100m": 100_000_000}[
            key.removeprefix("gtest_rows_")
        ]
        cells = contingency_counts(gtest_frame(n, 5, 7), "a", "b")
        row = measure(spark, g_test_from_contingency(cells))
        row["n_rows"] = n
        row["cells"] = 35
    elif key.startswith("gtest_cells_"):
        ka, kb = {
            "35": (5, 7),
            "3500": (50, 70),
            "350k": (500, 700),
        }[key.removeprefix("gtest_cells_")]
        cells = contingency_counts(
            gtest_frame(GTEST_ALPHA_ROWS, ka, kb), "a", "b"
        )
        row = measure(spark, g_test_from_contingency(cells))
        row["cells"] = ka * kb
    elif key.startswith("kappa_rows_"):
        n = {"1m": 1_000_000, "10m": 10_000_000, "100m": 100_000_000}[
            key.removeprefix("kappa_rows_")
        ]
        row = measure(spark, cohens_kappa_from_pairs(kappa_pairs(n, 3)))
        row["n_rows"] = n
    elif key.startswith("kappa_labels_"):
        nl = int(key.removeprefix("kappa_labels_"))
        row = measure(
            spark,
            cohens_kappa_from_pairs(kappa_pairs(KAPPA_ALPHA_ROWS, nl)),
        )
        row["n_labels"] = nl
        row["cells_max"] = nl * nl
    else:
        raise SystemExit(f"unknown key {key!r}")
    row["key"] = key
    return row


# ---------------------------------------------------------------------------
# Round 13: run ONE registered catalog entry at an arbitrary sf tier
# ---------------------------------------------------------------------------


@case("catalog_entry")
def catalog_entry(spark, args):
    """Measure one registered catalog entry at any sf tier (round 13:
    the sf0.1 -> sf1 headline scaling record beside the sf1 SPOT
    oracle gate). Same execution contract as bench.py — noop sink, no
    driver materialization, pin_scope released per run — but pointed
    at an arbitrary tier, so one config entry covers every
    "does this key scale ~linearly one tier up?" question instead of
    a per-round script. Usage:

        python tools/scaling_harness.py catalog_entry NAME [sf_dir]

    Fresh JVM per invocation (the harness runs one case per process),
    so no warm-cache flattery across tiers."""
    if not args:
        raise SystemExit("usage: catalog_entry NAME [sf_dir]")
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else SF_DIR
    from lambda_refarch_mapreduce_spark.operators.relational import pin_scope
    from lambda_refarch_mapreduce_spark.plans import (  # noqa: F401
        catalog,
        catalog_analytics,
        catalog_llm,
    )

    qd = catalog.REGISTRY[name]
    with pin_scope():
        row = measure(spark, qd.spark(spark, sf_dir), mode="noop")
    row["entry"] = name
    row["sf_dir"] = sf_dir
    return row
