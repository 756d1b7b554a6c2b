"""Declarative JobSpec — the reference's user experience, made a plan.

In the reference, "writing a query" means editing mapper.py/reducer.py
and re-zipping the Lambdas (README.md:63-65, driverconfig.json:10-24);
the driver config points at code. Here the same job is a declarative
spec the engine lowers onto a DataFrame, so Catalyst sees the whole
plan (pushdown/pruning work), and the custom-code seam survives as
explicit UDF hooks (SURVEY.md §2.2) instead of a zip file:

    JobSpec(
        source={"format": "csv", "path": ..., "schema": schema},
        filter="pageRank > 1000",              # queries 1a/1b
        select={"src": "substring(sourceIP, 1, 8)",
                "rev": "cast(adRevenue as double)"},
        group_by=["src"], aggs={"sum_rev": "sum(rev)"},   # query 2a
        sink={"format": "parquet", "path": ...},
    )

Expressions are SQL strings compiled with ``F.expr`` — one dialect for
spec authors, full Catalyst underneath. ``map_udf`` / ``agg_udf`` are
the escape hatches equivalent to the reference's mapper/reducer seams
(///YOUR REDUCER LOGIC///, reducer.js:46): an Arrow-batched function
applied with mapInPandas / applyInPandas.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from lambda_refarch_mapreduce_spark.sources.readers import (
    read_csv,
    read_json,
    read_parquet,
    read_text,
)


@dataclass
class JobSpec:
    source: dict
    # Each join: {"source": <source dict>, "on": [cols] | "SQL condition",
    #             "how": "inner", "broadcast": bool}. Applied in order
    # before filter/select, so downstream clauses see joined columns.
    # "on" as a list is a USING-style equi-join (join keys deduplicated);
    # as a string it is any Catalyst boolean expression over unambiguous
    # column names. broadcast=True hints the joined side — the right
    # call for star-schema dimensions, which is what a declarative
    # multi-source spec is for.
    joins: list[dict] = field(default_factory=list)
    # Training-data prep steps, applied in order after joins and before
    # filter. Each step is a dict with an "op" key:
    #   {"op": "quality_filter", "text": col, "min_quality": 0.3}
    #   {"op": "repetition_filter", "text": col, "n": 2, "max_dup_frac": 0.75}
    #   {"op": "pii_redact", "text": col}            # rewrites col in place
    #   {"op": "dedup_exact", "id": col, "text": col}  # corpus keep-first
    #   {"op": "classifier_filter", "text": col, "weights": {tok: w},
    #    "bias": 0.0, "min_score": 0.5}   # linear model quality gate
    #   {"op": "c4_clean", "text": col, "min_words_per_line": 5,
    #    "require_terminal_punct": True, "bad_line_words": [...],
    #    "bad_doc_substrings": [...], "min_kept_lines": 1}  # rewrites col
    #   {"op": "domain_cap", "id": col, "domain": col, "cap": 1000}
    #   {"op": "dedup_spans", "id": col, "text": col, "k": 8,
    #    "drop_empty": False}   # substring dedup, rewrites col
    # Filters, the redaction, the classifier gate and the C4 cleaner are
    # row-local Catalyst expressions (zero shuffle); dedup_exact and
    # domain_cap are one keyed window shuffle each; dedup_spans adds
    # the span-excision shuffles (digest window + rebuild).
    prep: list[dict] = field(default_factory=list)
    # Sketch-prefiltered semi-join (applied right after joins, before
    # prep/filter, so the row-local membership test sits in the probe
    # side's scan stage) — the declarative surface over
    # operators/sketch.py's Bloom filter, completing the sketch tier's
    # declarative story the way stats_test did for inference:
    #   prefilter={"keys": <source dict>, "key": "c_custkey",
    #              "probe": "o_custkey", "filter": "SQL over keys"?,
    #              "n_bits": 8192, "k": 2, "exact": True}
    # lowers to: build bloom_bits over the (optionally filtered,
    # deduplicated) build-side keys, pack to an n_bits/8-byte word
    # array that ships as a PLAN LITERAL, filter df row-locally with
    # bloom_might_contain, then (exact=True, the default) strip the
    # false positives with a semi-join against the real key set —
    # whose broadcast decision is AQE's, from runtime size. The build
    # is one bounded side job over the key alphabet; no exchange
    # touches the probe corpus before the candidate join.
    #   exact=False keeps the raw candidates (no semi-join): the mode
    # for when the consumer tolerates the ~(1-e^{-kn/m})^k false-
    # positive rate in exchange for zero joins.
    prefilter: dict | None = None
    filter: str | None = None
    # Reshaping stages (applied after filter, before select) — each
    # REPLACES the row shape, so downstream select/aggs see the new
    # columns:
    #   sessionize={"user": col, "ts": col, "order": [cols], "gap_s": N}
    #     -> (user, session_id, n_events, duration_s) per session
    #     (operators.relational.gap_sessionize: one hash shuffle).
    #   fuzzy_join={"id": col, "text": col, "k": 1, "block": col?,
    #               "strategy": "auto"}
    #     -> (id_a, id_b, dist): all pairs within Levenshtein k
    #     (operators.linkage.fuzzy_self_join: deletion-signature /
    #     Ed-Join candidates, never all-pairs).
    #   stats_test={"method": "mann_whitney" | "ks" | "welch",
    #               "group_col": col, "group_a": v, "group_b": v,
    #               "value": col}
    #     -> ONE row: the two-sample statistic between the groups'
    #     value distributions (mann_whitney: n_a, n_b, auc, z,
    #     significant; ks: n_a, n_b, ks_d, significant; welch: n_a,
    #     n_b, mean_a, mean_b, mean_diff, t_stat, significant). Lowers onto
    #     operators.analytics.group_value_counts + the matching
    #     *_from_value_counts kernel — the SAME kernels behind the
    #     catalog entries and the streaming A/B monitor, so rows
    #     collapse map-side into the value alphabet before any
    #     exchange.
    #     Beyond two samples (round 10): method "anova" ignores
    #     group_a/group_b and tests the mean across ALL groups of
    #     group_col — "value" here is a SQL EXPRESSION that must
    #     produce an exact integer (the caller quantizes, e.g.
    #     "CAST(round(value * 100) AS BIGINT)"); lowers onto
    #     anova_f_from_groups over per-group integer moments -> ONE
    #     row (k_groups, n_total, f_stat, z_wh, significant). Method
    #     "kruskal" (round 11) is the distribution-free companion to
    #     "anova" on the same spec shape — Kruskal-Wallis rank test
    #     across ALL groups via kruskal_wallis_from_counts -> ONE row
    #     (k_groups, n_total, h_stat, z_wh, significant). Method
    #     "brown_forsythe" (round 11) is the SPREAD member on the same
    #     shape (Levene-with-median via brown_forsythe_from_counts)
    #     -> ONE row (k_groups, n_total, f_stat, z_wh, significant).
    #     Method "cochran_armitage" (round 11) tests a linear trend in
    #     a PROPORTION across ordered scores: "score" is a SQL
    #     expression yielding the integer group score, "success" a
    #     boolean predicate per row -> ONE row (n_groups, n_total,
    #     n_success, z_ca, trend). Method
    #     "chi2" tests homogeneity of the value DISTRIBUTION across
    #     all groups over a fixed "bin_width" alphabet (default 50);
    #     lowers onto contingency_counts + chi2_from_contingency ->
    #     ONE row (ka, kb, n_total, dof, chi2, cramers_v, z_wh,
    #     significant); "g_test" (round 11) is the log-likelihood-
    #     ratio twin on the same binned cells -> ONE row (ka, kb,
    #     n_total, dof, g_stat, z_wh, significant). Both collapse map-side to alphabet-sized
    #     frames before any exchange. Method "anderson_darling" is
    #     the tail-weighted two-sample member over the same
    #     group_a/group_b count frame -> ONE row (n_a, n_b, a2,
    #     significant). Method "qq" (round 11) is the WHERE companion
    #     to those WHETHER tests: the quantile-shift table between
    #     the two groups over the same count frame, one row per
    #     interior grid point (grid_i, q_a, q_b, shift); "n_grid"
    #     picks the grid (default 20 = ventiles). Method
    #     "cliffs_delta" (round 11) is the EFFECT-SIZE member over
    #     the same two-group count frame -> ONE row (n_a, n_b, delta,
    #     magnitude, z, significant; Romano bands). Methods "kuiper"
    #     / "cvm" (round 11) complete the CDF-distance family over
    #     the same frame: V = D+ + D- (cyclic-sensitive) and the
    #     plain integral of the squared gap -> ONE row each. Method
    #     "jonckheere" (round 11) is the ORDERED k-sample trend on
    #     the kruskal spec shape (group order = natural sort of
    #     group_col) -> ONE row (k_groups, n_total, jt_auc, z_jt,
    #     trend); "mood_median" (round 11) is the one-bit
    #     outlier-proof member on the same shape -> ONE row
    #     (k_groups, n_total, n_above, chi2, z_wh, significant).
    #     Methods "friedman" / "page" (round 11) are the
    #     repeated-measures pair over "block" / "treatment" / "value"
    #     SQL expressions (any-difference vs ordered, block effect
    #     cancelled) -> ONE row. Method "mcnemar" (round 11) tests
    #     paired binary "flag_a" / "flag_b" exprs (one row per
    #     subject upstream) -> ONE row (n_pairs, cells, chi2_cc,
    #     significant, direction); "wilcoxon_signed_rank" (round 11)
    #     is its NUMERIC sibling over "val_a" / "val_b" exact-integer
    #     expressions -> ONE row (n_pairs, n_nonzero, w_plus, z_wsr,
    #     significant, direction). Method "cohens_kappa" (round 11)
    #     scores agreement between "rater_a" / "rater_b" label exprs
    #     -> ONE row (n_items, po, pe, kappa, agreement). Methods
    #     "runs" / "ljung_box" (round 11) are series diagnostics over
    #     "key" / "value" exprs: Wald-Wolfowitz randomness around the
    #     median, and the portmanteau white-noise Q at lags
    #     1.."max_lag" (default 7).
    #   interval_join={"source": <source dict>, "on": [cols],
    #                  "l_select": {alias: SQL}?, "r_select": {alias: SQL}?,
    #                  "l_start": col, "l_end": col,
    #                  "r_start": col, "r_end": col,
    #                  "bucket_width": int?, "max_fanout": int?,
    #                  "filter": "SQL over the joined row"?}
    #     -> df becomes the interval-OVERLAP join of df (left) against
    #     the named source (right) on the shared key columns — pairs
    #     whose integer [start, end] ranges intersect
    #     (operators.relational.interval_overlap_join: binning
    #     decomposition to ONE co-keyed equi-join on (keys, bucket),
    #     canonical-bucket dedup, never a theta/nested-loop plan).
    #     l_select / r_select reshape each side FIRST (same SQL-string
    #     dialect as select) since the spec's own select clause runs
    #     after reshaping; start/end must be integers (caller
    #     quantizes: days, epoch seconds). bucket_width omitted =
    #     auto-derived from the left side's p90 interval length;
    #     "filter" post-filters pairs (e.g. "ka < kb" for self-joins).
    #     Column names across the two sides must not collide except
    #     the key columns — alias in l_select/r_select.
    sessionize: dict | None = None
    fuzzy_join: dict | None = None
    stats_test: dict | None = None
    interval_join: dict | None = None
    # Warehouse-maintenance clauses (applied after filter, before
    # sessionize; df is the BASE snapshot). Mutually exclusive — the
    # refresh needs the PRE-apply base, so chaining them in one spec
    # is a contradiction:
    #   cdc_apply={"changes": <source dict>, "keys": [cols],
    #              "seq": "seq", "op": "op"}
    #     -> replaces df with the net-effect applied table
    #        (operators.analytics.apply_cdc: per key the highest-seq
    #        change wins, a trailing 'D' deletes). Downstream clauses
    #        see the new snapshot — aggregate it and you have the
    #        full-recompute view; sink it and you have published the
    #        hourly table.
    #   mv_refresh={"changes": <source dict>, "keys": [cols],
    #               "seq": "seq", "op": "op", "group_by": [cols],
    #               "value": col, "sum_name": "total",
    #               "cnt_name": "n_rows", "derive": {alias: SQL},
    #               "mv": <source dict>?}
    #     -> replaces df with the refreshed per-group (sum, count)
    #        view at CHANGE cost (operators.analytics.
    #        incremental_agg_update); the prior view is derived from
    #        the base when "mv" is omitted. "derive" adds computed
    #        grouping columns (SQL strings, same dialect as select)
    #        to base AND changes before the refresh.
    cdc_apply: dict | None = None
    mv_refresh: dict | None = None
    select: dict[str, str] | None = None  # alias -> SQL expression
    group_by: list[str] = field(default_factory=list)
    aggs: dict[str, str] | None = None  # alias -> SQL aggregate expression
    having: str | None = None
    order_by: list[str] = field(default_factory=list)
    limit: int | None = None
    sink: dict | None = None
    # UDF seams (reference §2.2): applied after select, before group_by.
    map_udf: Callable | None = None  # (iter[pd.DataFrame]) -> iter[pd.DataFrame]
    map_udf_schema: StructType | str | None = None
    agg_udf: Callable | None = None  # (pd.DataFrame) -> pd.DataFrame per group
    agg_udf_schema: StructType | str | None = None


def _read(spark: SparkSession, source: dict) -> DataFrame:
    fmt = source.get("format", "parquet")
    if "df" in source:  # pre-built DataFrame passthrough
        return source["df"]
    path = source["path"]
    if fmt == "parquet":
        return read_parquet(spark, path)
    if fmt == "csv":
        return read_csv(
            spark,
            path,
            source["schema"],
            header=source.get("header", False),
            drop_malformed=source.get("drop_malformed", True),
            required=source.get("required"),
        )
    if fmt == "json":
        return read_json(spark, path, source.get("schema"))
    if fmt == "text":
        return read_text(spark, path)
    raise ValueError(f"unknown source format {fmt!r}")


def _apply_prep(df: DataFrame, step: dict) -> DataFrame:
    from pyspark.sql.window import Window

    from lambda_refarch_mapreduce_spark.operators import text as text_ops

    op = step.get("op")
    text_col = step.get("text", "text")
    if op == "quality_filter":
        return df.filter(
            text_ops.quality_expr(F.col(text_col)) >= step.get("min_quality", 0.3)
        )
    if op == "repetition_filter":
        return df.filter(
            text_ops.dup_ngram_frac_expr(F.col(text_col), step.get("n", 2))
            <= step.get("max_dup_frac", 0.75)
        )
    if op == "pii_redact":
        return df.withColumn(text_col, text_ops.pii_redact_expr(F.col(text_col)))
    if op == "dedup_exact":
        id_col = step.get("id", "doc_id")
        w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    if op == "classifier_filter":
        # fastText-style linear model gate (operators.text.classifier_score
        # semantics, expressed inline so the gate composes with other
        # row-local prep steps in ONE scan): keep rows whose
        # sigmoid(bias + mean token weight) >= min_score.
        from lambda_refarch_mapreduce_spark.functions.scalar import tokenize

        weights: dict[str, float] = step["weights"]
        from itertools import chain

        wmap = F.create_map(
            *[F.lit(x) for x in chain.from_iterable(weights.items())]
        )
        toks = tokenize(F.col(text_col))
        staged = df.withColumn("__toks", toks).withColumn("__w", wmap)
        raw = F.aggregate(
            F.col("__toks"),
            F.lit(0.0),
            lambda acc, t: acc
            + F.coalesce(F.element_at(F.col("__w"), t), F.lit(0.0)),
        )
        logit = F.lit(float(step.get("bias", 0.0))) + raw / F.greatest(
            F.size(F.col("__toks")), F.lit(1)
        )
        score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
        return (
            staged.filter(score >= F.lit(float(step.get("min_score", 0.5))))
            .drop("__toks", "__w")
        )
    if op == "c4_clean":
        # C4 boilerplate line cleaning (operators.text.c4_line_clean),
        # rewriting text_col in place and dropping documents the
        # cleaner rejects; other columns pass through via join-free
        # reconstruction on the same row.
        import re as _re

        sep = step.get("sep", "\n")
        min_words = step.get("min_words_per_line", 5)
        punct = step.get("require_terminal_punct", True)
        bad_words = tuple(step.get("bad_line_words", ("javascript",)))
        bad_docs = tuple(step.get("bad_doc_substrings", ("lorem ipsum", "{")))
        min_kept = step.get("min_kept_lines", 1)
        from lambda_refarch_mapreduce_spark.functions.scalar import tokenize

        def _line_ok(line: Column) -> Column:
            cond = F.size(tokenize(line)) >= F.lit(min_words)
            if punct:
                cond = cond & F.trim(line).rlike('[.!?"]$')
            low = F.lower(line)
            for wword in bad_words:
                cond = cond & ~low.contains(wword.lower())
            return cond

        staged = df.withColumn(
            "__lines", F.split(F.col(text_col), _re.escape(sep))
        ).withColumn("__kept", F.filter(F.col("__lines"), _line_ok))
        doc_ok = F.lit(True)
        low_text = F.lower(F.col(text_col))
        for s in bad_docs:
            doc_ok = doc_ok & ~low_text.contains(s.lower())
        return (
            staged.filter(doc_ok & (F.size(F.col("__kept")) >= min_kept))
            .withColumn(text_col, F.array_join(F.col("__kept"), sep))
            .drop("__lines", "__kept")
        )
    if op == "domain_cap":
        # per-domain document cap (operators.text.domain_cap semantics,
        # inline so the WindowGroupLimit plans directly on this frame)
        id_col = step.get("id", "doc_id")
        domain_col = step.get("domain", "source")
        cap = int(step.get("cap", 1000))
        w = Window.partitionBy(domain_col).orderBy(id_col)
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .drop("_rn")
        )
    if op == "dedup_spans":
        # exact substring dedup (operators.dedup.duplicate_span_excise):
        # text_col is rewritten with duplicated k-token spans excised;
        # other columns ride back via the id-keyed join (the operator's
        # rebuild shuffle is the only added data-plane exchange).
        # drop_empty=True also removes fully-excised documents.
        from lambda_refarch_mapreduce_spark.operators.dedup import (
            duplicate_span_excise,
        )

        id_col = step.get("id", "doc_id")
        k = int(step.get("k", 8))
        cleaned = duplicate_span_excise(
            df.select(id_col, text_col), id_col, text_col, k
        ).select(id_col, F.col("text_cleaned").alias(text_col))
        out = df.drop(text_col).join(cleaned, id_col)
        if step.get("drop_empty", False):
            out = out.filter(F.col(text_col) != "")
        return out
    raise ValueError(f"unknown prep op {op!r}")


def build(spark: SparkSession, spec: JobSpec) -> DataFrame:
    """Lower a JobSpec to a DataFrame (no action triggered)."""
    if spec.aggs and spec.agg_udf is not None:
        raise ValueError(
            "JobSpec is ambiguous: 'aggs' and 'agg_udf' are both set — "
            "use SQL aggregates or the applyInPandas seam, not both"
        )
    df = _read(spark, spec.source)
    for j in spec.joins:
        other = _read(spark, j["source"])
        if j.get("broadcast"):
            other = F.broadcast(other)
        on = j["on"]
        cond = F.expr(on) if isinstance(on, str) else on
        df = df.join(other, cond, j.get("how", "inner"))
    if spec.prefilter:
        from lambda_refarch_mapreduce_spark.operators import sketch

        p = spec.prefilter
        keys = _read(spark, p["keys"])
        if p.get("filter"):
            keys = keys.filter(F.expr(p["filter"]))
        keyframe = keys.select(F.col(p["key"]).alias("__k")).distinct()
        n_bits = p.get("n_bits", 1 << 13)
        n_hashes = p.get("k", 2)
        words = sketch.bloom_words(
            sketch.bloom_bits(keyframe, "__k", n_bits, n_hashes), n_bits
        )
        df = df.filter(
            sketch.bloom_might_contain(
                F.col(p["probe"]), words, n_bits, n_hashes
            )
        )
        if p.get("exact", True):
            df = df.join(
                keyframe, df[p["probe"]] == F.col("__k"), "left_semi"
            )
    if spec.prep:
        # prep gates are CPU-bound row-local text expressions: spread a
        # few-split scan across the cluster first (no-op when the input
        # is already parallel)
        from lambda_refarch_mapreduce_spark.partitioning import ensure_parallelism

        df = ensure_parallelism(df)
    for step in spec.prep:
        df = _apply_prep(df, step)
    if spec.filter:
        df = df.filter(F.expr(spec.filter))
    if spec.cdc_apply and spec.mv_refresh:
        raise ValueError(
            "JobSpec is ambiguous: 'cdc_apply' and 'mv_refresh' are both "
            "set — the refresh needs the PRE-apply base, so run them as "
            "two specs (publish the snapshot; refresh the view)"
        )
    if spec.cdc_apply:
        from lambda_refarch_mapreduce_spark.operators.analytics import (
            apply_cdc,
        )

        c = spec.cdc_apply
        df = apply_cdc(
            df,
            _read(spark, c["changes"]),
            c["keys"],
            c.get("seq", "seq"),
            c.get("op", "op"),
        )
    if spec.mv_refresh:
        from lambda_refarch_mapreduce_spark.operators.analytics import (
            incremental_agg_update,
        )

        m = spec.mv_refresh
        base, changes = df, _read(spark, m["changes"])
        for a, e in (m.get("derive") or {}).items():
            base = base.withColumn(a, F.expr(e))
            changes = changes.withColumn(a, F.expr(e))
        sum_name = m.get("sum_name", "total")
        cnt_name = m.get("cnt_name", "n_rows")
        if "mv" in m:
            mv = _read(spark, m["mv"])
        else:
            mv = base.groupBy(*m["group_by"]).agg(
                F.sum(m["value"]).alias(sum_name),
                F.count(F.lit(1)).alias(cnt_name),
            )
        df = incremental_agg_update(
            mv,
            base,
            changes,
            m["keys"],
            m.get("seq", "seq"),
            m.get("op", "op"),
            m["group_by"],
            m["value"],
            sum_name,
            cnt_name,
        )
    if spec.interval_join:
        from lambda_refarch_mapreduce_spark.operators.relational import (
            interval_overlap_join,
        )

        ij = spec.interval_join
        right = _read(spark, ij["source"])
        if ij.get("r_select"):
            right = right.select(
                *[F.expr(e).alias(a) for a, e in ij["r_select"].items()]
            )
        if ij.get("l_select"):
            df = df.select(
                *[F.expr(e).alias(a) for a, e in ij["l_select"].items()]
            )
        df = interval_overlap_join(
            df,
            right,
            ij["on"],
            ij["l_start"],
            ij["l_end"],
            ij["r_start"],
            ij["r_end"],
            bucket_width=ij.get("bucket_width"),
            max_fanout=ij.get("max_fanout", 64),
        )
        if ij.get("filter"):
            df = df.filter(F.expr(ij["filter"]))
    if spec.sessionize:
        from lambda_refarch_mapreduce_spark.operators.relational import (
            gap_sessionize,
        )

        s = spec.sessionize
        df = gap_sessionize(
            df,
            s.get("user", "user_id"),
            s.get("ts", "ts"),
            s.get("order"),
            int(s.get("gap_s", 1800)),
        )
    if spec.fuzzy_join:
        from lambda_refarch_mapreduce_spark.operators.linkage import (
            fuzzy_self_join,
        )

        fj = spec.fuzzy_join
        df = fuzzy_self_join(
            df,
            fj.get("id", "doc_id"),
            fj.get("text", "text"),
            k=int(fj.get("k", 1)),
            block_col=fj.get("block"),
            strategy=fj.get("strategy", "auto"),
        )
    if spec.stats_test:
        from lambda_refarch_mapreduce_spark.operators.analytics import (
            group_value_counts,
            ks_from_value_counts,
            mann_whitney_from_value_counts,
        )

        t = spec.stats_test
        method = t.get("method", "mann_whitney")
        if method in (
            "mann_whitney",
            "ks",
            "welch",
            "anderson_darling",
            "qq",
            "cliffs_delta",
            "kuiper",
            "cvm",
        ):
            counts = group_value_counts(
                df,
                t["group_a"],
                t["group_b"],
                t.get("group_col", "event_type"),
                t.get("value", "value"),
            )
            if method == "mann_whitney":
                df = mann_whitney_from_value_counts(
                    counts, ca="ca", cb="cb"
                )
            elif method == "cliffs_delta":
                from lambda_refarch_mapreduce_spark.operators.analytics import (
                    cliffs_delta_from_value_counts,
                )

                df = cliffs_delta_from_value_counts(
                    counts, ca="ca", cb="cb"
                )
            elif method == "ks":
                df = ks_from_value_counts(counts)
            elif method == "anderson_darling":
                from lambda_refarch_mapreduce_spark.operators.analytics import (
                    anderson_darling_from_value_counts,
                )

                df = anderson_darling_from_value_counts(counts)
            elif method == "kuiper":
                from lambda_refarch_mapreduce_spark.operators.analytics import (
                    kuiper_from_value_counts,
                )

                df = kuiper_from_value_counts(counts)
            elif method == "cvm":
                from lambda_refarch_mapreduce_spark.operators.analytics import (
                    cvm_from_value_counts,
                )

                df = cvm_from_value_counts(counts)
            elif method == "qq":
                from lambda_refarch_mapreduce_spark.operators.analytics import (
                    qq_from_value_counts,
                )

                df = qq_from_value_counts(
                    counts, int(t.get("n_grid", 20))
                )
            else:
                from lambda_refarch_mapreduce_spark.operators.analytics import (
                    welch_from_value_counts,
                )

                df = welch_from_value_counts(counts)
        elif method == "anova":
            # k-sample mean test across ALL groups; "value" is a SQL
            # expression yielding an exact integer (caller quantizes)
            from lambda_refarch_mapreduce_spark.operators.analytics import (
                anova_f_from_groups,
            )

            v = F.expr(t.get("value", "value"))
            groups = (
                df.select(
                    F.col(t.get("group_col", "event_type")).alias("g"),
                    v.alias("__v"),
                )
                .groupBy("g")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("__v").alias("s"),
                    F.sum(
                        F.col("__v").cast("decimal(38,0)") * F.col("__v")
                    ).alias("q"),
                )
            )
            df = anova_f_from_groups(groups)
        elif method == "kruskal":
            # k-sample RANK test across ALL groups — the
            # distribution-free companion to "anova" on the same
            # spec shape; "value" is a SQL expression yielding an
            # exact integer (caller quantizes)
            from lambda_refarch_mapreduce_spark.operators.analytics import (
                kruskal_wallis_from_counts,
            )

            v = F.expr(t.get("value", "value"))
            counts = (
                df.select(
                    F.col(t.get("group_col", "event_type")).alias("g"),
                    v.alias("__v"),
                )
                .groupBy("g", "__v")
                .agg(F.count(F.lit(1)).alias("c"))
            )
            df = kruskal_wallis_from_counts(counts, "g", "__v", "c")
        elif method == "brown_forsythe":
            # k-sample SPREAD test across ALL groups — the variance
            # member beside "anova" (means) and "kruskal" (ranks);
            # same spec shape, same exact-integer value contract
            from lambda_refarch_mapreduce_spark.operators.analytics import (
                brown_forsythe_from_counts,
            )

            v = F.expr(t.get("value", "value"))
            counts = (
                df.select(
                    F.col(t.get("group_col", "event_type")).alias("g"),
                    v.alias("__v"),
                )
                .groupBy("g", "__v")
                .agg(F.count(F.lit(1)).alias("c"))
            )
            df = brown_forsythe_from_counts(counts, "g", "__v", "c")
        elif method == "cochran_armitage":
            # linear trend in a PROPORTION across ordered integer
            # scores: "score" is a SQL expression yielding the group
            # score, "success" a boolean SQL predicate per row
            from lambda_refarch_mapreduce_spark.operators.analytics import (
                cochran_armitage_trend,
            )

            grp = (
                df.select(
                    F.expr(t["score"]).cast("long").alias("s"),
                    F.expr(t["success"]).cast("long").alias("__p"),
                )
                .groupBy("s")
                .agg(
                    F.sum("__p").alias("x"),
                    F.count(F.lit(1)).alias("n"),
                )
            )
            df = cochran_armitage_trend(grp)
        elif method in ("chi2", "g_test"):
            # distribution homogeneity across ALL groups over a fixed
            # bin alphabet — dense zero cells included by the kernel
            from lambda_refarch_mapreduce_spark.operators.analytics import (
                chi2_from_contingency,
                contingency_counts,
            )

            bw = int(t.get("bin_width", 50))
            val = t.get("value", "value")
            s2 = df.select(
                F.col(t.get("group_col", "event_type")).alias("a"),
                F.expr(f"CAST(floor(({val}) / {bw}) AS BIGINT)").alias(
                    "b"
                ),
            )
            cells = contingency_counts(s2, "a", "b")
            if method == "g_test":
                # the log-likelihood-ratio twin on the same cells —
                # preferred when expected counts are small/sparse
                from lambda_refarch_mapreduce_spark.operators.analytics import (
                    g_test_from_contingency,
                )

                df = g_test_from_contingency(cells)
            else:
                df = chi2_from_contingency(cells)
        elif method == "mood_median":
            # one-bit outlier-proof k-sample test on the kruskal spec
            # shape: every value reduces to above-pooled-median or not
            from lambda_refarch_mapreduce_spark.operators.analytics import (
                mood_median_from_counts,
            )

            v = F.expr(t.get("value", "value"))
            counts = (
                df.select(
                    F.expr(t.get("group_col", "event_type")).alias("g"),
                    v.alias("__v"),
                )
                .groupBy("g", "__v")
                .agg(F.count(F.lit(1)).alias("c"))
            )
            df = mood_median_from_counts(counts, "g", "__v", "c")
        elif method == "jonckheere":
            # ordered k-sample trend — KW's direction-aware sibling
            # on the same spec shape; groups take their hypothesized
            # order from the natural sort of group_col's value
            from lambda_refarch_mapreduce_spark.operators.analytics import (
                jonckheere_terpstra_from_counts,
            )

            v = F.expr(t.get("value", "value"))
            counts = (
                df.select(
                    F.expr(t.get("group_col", "event_type")).alias("g"),
                    v.alias("__v"),
                )
                .groupBy("g", "__v")
                .agg(F.count(F.lit(1)).alias("c"))
            )
            df = jonckheere_terpstra_from_counts(counts, "g", "__v", "c")
        elif method in ("friedman", "page", "cochran_q"):
            # repeated-measures modes over (block, treatment, value)
            # SQL expressions — Friedman = any-difference with the
            # block effect cancelled, Page = the ordered alternative
            # (treatment order = natural sort of the treatment expr),
            # Cochran's Q = the BINARY member (value coerces 0/1)
            from lambda_refarch_mapreduce_spark.operators.analytics import (
                friedman_from_blocks,
                page_l_from_blocks,
            )

            cells = df.select(
                F.expr(t["block"]).alias("b"),
                F.expr(t["treatment"]).alias("t"),
                F.expr(t.get("value", "value")).alias("x"),
            )
            from lambda_refarch_mapreduce_spark.operators.analytics import (
                cochran_q_from_blocks,
            )

            kern = {
                "friedman": friedman_from_blocks,
                "page": page_l_from_blocks,
                "cochran_q": cochran_q_from_blocks,
            }[method]
            df = kern(cells, "b", "t", "x")
        elif method == "wilcoxon_signed_rank":
            # paired NUMERIC values per row of the incoming frame
            # (one row per subject upstream): val_a / val_b are
            # exact-integer SQL expressions (caller quantizes)
            from lambda_refarch_mapreduce_spark.operators.analytics import (
                wilcoxon_signed_rank_from_pairs,
            )

            pairs = df.select(
                F.expr(t["val_a"]).alias("a"),
                F.expr(t["val_b"]).alias("b"),
            )
            df = wilcoxon_signed_rank_from_pairs(pairs)
        elif method == "mcnemar":
            # paired binary flags per row of the incoming frame (the
            # caller shapes one row per subject upstream — e.g. a
            # group_by stage): flag_a / flag_b are boolean SQL exprs
            from lambda_refarch_mapreduce_spark.operators.analytics import (
                mcnemar_from_pairs,
            )

            pairs = df.select(
                F.expr(t["flag_a"]).alias("a"),
                F.expr(t["flag_b"]).alias("b"),
            )
            df = mcnemar_from_pairs(pairs)
        elif method == "cohens_kappa":
            # chance-corrected agreement between two categorical
            # labelings: rater_a / rater_b are SQL expressions
            from lambda_refarch_mapreduce_spark.operators.analytics import (
                cohens_kappa_from_pairs,
            )

            pairs = df.select(
                F.expr(t["rater_a"]).alias("a"),
                F.expr(t["rater_b"]).alias("b"),
            )
            df = cohens_kappa_from_pairs(pairs)
        elif method == "runs":
            # Wald-Wolfowitz randomness of the (key, value) series
            # around its median; key orders the sequence
            from lambda_refarch_mapreduce_spark.operators.analytics import (
                runs_test_from_series,
            )

            series = df.select(
                F.expr(t["key"]).alias("k"),
                F.expr(t.get("value", "value")).alias("v"),
            )
            df = runs_test_from_series(series, "k", "v")
        elif method == "ljung_box":
            # portmanteau white-noise test of the (key, value) series
            # at lags 1..max_lag
            from lambda_refarch_mapreduce_spark.operators.analytics import (
                ljung_box_from_series,
            )

            series = df.select(
                F.expr(t["key"]).alias("k"),
                F.expr(t.get("value", "value")).alias("v"),
            )
            df = ljung_box_from_series(
                series, "k", "v", int(t.get("max_lag", 7))
            )
        else:
            raise ValueError(
                f"stats_test method {method!r} not supported "
                "(mann_whitney, ks, welch, anderson_darling, qq, "
                "kuiper, cvm, "
                "cliffs_delta, anova, kruskal, jonckheere, "
                "mood_median, "
                "brown_forsythe, cochran_armitage, chi2, g_test, "
                "friedman, "
                "page, cochran_q, mcnemar, wilcoxon_signed_rank, "
                "cohens_kappa, runs, ljung_box)"
            )
    if spec.select:
        df = df.select(*[F.expr(e).alias(a) for a, e in spec.select.items()])
    if spec.map_udf is not None:
        if spec.map_udf_schema is None:
            raise ValueError("map_udf requires map_udf_schema")
        df = df.mapInPandas(spec.map_udf, schema=spec.map_udf_schema)
    if spec.aggs:
        aggs = [F.expr(e).alias(a) for a, e in spec.aggs.items()]
        df = df.groupBy(*spec.group_by).agg(*aggs) if spec.group_by else df.agg(*aggs)
    elif spec.agg_udf is not None:
        if not spec.group_by or spec.agg_udf_schema is None:
            raise ValueError("agg_udf requires group_by and agg_udf_schema")
        df = df.groupBy(*spec.group_by).applyInPandas(
            spec.agg_udf, schema=spec.agg_udf_schema
        )
    if spec.having:
        df = df.filter(F.expr(spec.having))
    if spec.order_by:
        df = df.orderBy(*[F.expr(e) for e in spec.order_by])
    if spec.limit is not None:
        df = df.limit(spec.limit)
    return df


def run_jobspec(spark: SparkSession, spec: JobSpec) -> DataFrame:
    """Build and, if a sink is specified, execute the write.

    Returns the result DataFrame either way (reference driver returns
    the S3 result key; we return the plan, the caller picks the
    action — no implicit collect, per the 100TB contract).
    """
    df = build(spark, spec)
    if spec.sink:
        fmt = spec.sink.get("format", "parquet")
        writer = df.write.mode(spec.sink.get("mode", "overwrite"))
        if "partition_by" in spec.sink:
            writer = writer.partitionBy(*spec.sink["partition_by"])
        getattr(writer, fmt)(spec.sink["path"])
    return df
