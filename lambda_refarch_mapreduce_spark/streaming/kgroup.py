"""Continuous k-GROUP monitoring: events stream in, each micro-batch
folds its per-(group, distinct-value) count frame into committed
running state, and the whole k-sample family — ANOVA on means,
Kruskal-Wallis on ranks, Brown-Forsythe on spreads,
Jonckheere-Terpstra on an ordered alternative, Mood's median on the
outlier-proof one-bit reduction — is computable at any moment from
that alphabet-sized state. This generalizes the
two-arm A/B monitor (streaming/abtest.py) the same way the round-11
batch kernels generalize the two-sample tests: abtest's (v, ca, cb)
frame is the k=2 special case of this (g, v, c) frame, and a k-armed
experiment (five variants, five event types) no longer needs one
monitor per pair.

Shared-kernel contract: every readout lowers onto the SAME kernels
behind the batch catalog entries (operators.analytics.
kruskal_wallis_from_counts / brown_forsythe_from_counts /
anova_f_from_groups / jonckheere_terpstra_from_counts /
mood_median_from_counts), so streamed-then-tested equals the batch
entry on the union exactly — cross-validated in
tests/test_streaming.py, including after a same-checkpoint restart
drain.

Idempotence, lifecycle, and the checkpoint/index shared-lifecycle
CAVEAT are inherited verbatim from abtest.py: per-batch count rows
land under ``counts/_batch_id=N/`` as an overwrite, the commit log is
appended LAST, readers semi-join the log, and
corpus.guard_checkpoint_epoch makes a fresh checkpoint against a
surviving index fail loudly instead of silently undercounting.

Scale posture: per-batch state is |batch (group, value) alphabet|
rows of integers; the running frame is bounded by |alphabet| x
|batches| rows — metadata, not data-plane (the batch entries' scaling
runs show the alphabet-keyed shuffle SATURATES under row growth,
SCALING.md round 11). Serving runs one prefix-sums/window pass over
the alphabet only when a statistic is asked for.

Readout cache lifetime (ADVICE r12 + r13 staleness find): the
rank-based readouts lower onto prefix_sums/global_rank, which
persist() their range-partitioned frame per invocation (correctness —
see operators.relational.pin). Served lazily, that pin would both
LEAK one CacheManager entry per readout call and — worse — go STALE:
the pinned plan canonicalizes equal across the monitor's growing
on-disk state, so a later call would be served the earlier call's
materialization while data keeps committing. Every ``*_now`` readout
therefore returns through corpus.materialize_readout: computed
eagerly inside a pin_scope (pins released), rows returned as a
local-relation snapshot — callers just call the readout; no scoping
required on their side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_refarch_mapreduce_spark.streaming.corpus import (
    _committed,
    _read_or_empty,
    materialize_readout,
)

_COUNTS_SCHEMA = "g string, v bigint, c bigint"


def batch_group_counts(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(g, v, c) per (group, distinct exact-cents value) — the
    monitor's state unit; the k-group generalization of
    analytics.group_value_counts' two-arm frame, and exactly the
    input shape of kruskal_wallis_from_counts /
    brown_forsythe_from_counts."""
    return (
        events.groupBy(
            F.col(group_col).alias("g"),
            F.round(F.col(value_col) * 100).cast("long").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _apply_group_counts_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    group_col: str = "event_type",
    value_col: str = "value",
) -> None:
    """One idempotent micro-batch application (the abtest scheme):
    reduce the batch to its (g, v, c) frame, overwrite it under
    ``counts/_batch_id=N``, append the commit row LAST. Module-level
    so the at-least-once replay contract is directly testable."""
    spark = batch_df.sparkSession
    counts_path = os.path.join(index_dir, "counts")
    commits_path = os.path.join(index_dir, "commits")
    if batch_df.isEmpty():
        return
    commits = _committed(spark, commits_path)
    if commits.filter(F.col("batch_id") == batch_id).limit(1).count():
        return
    counts = batch_group_counts(batch_df, group_col, value_col)
    counts.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(counts_path, f"_batch_id={batch_id}")
    )
    spark.createDataFrame([(batch_id,)], "batch_id bigint").write.mode(
        "append"
    ).parquet(commits_path)


def ingest_group_counts(
    stream_events: DataFrame,
    index_dir: str,
    checkpoint: str,
    group_col: str = "event_type",
    value_col: str = "value",
    available_now: bool = True,
):
    """foreachBatch pipeline: reduce each micro-batch to its
    (g, v, c) frame and commit it idempotently; epoch-guarded
    (corpus.guard_checkpoint_epoch) like every monitor since round
    8. Returns the DataStreamWriter (caller starts it)."""
    guarded: list[bool] = []

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from lambda_refarch_mapreduce_spark.streaming.corpus import (
            guard_checkpoint_epoch,
        )

        if not guarded:
            guard_checkpoint_epoch(
                batch_df.sparkSession, index_dir, checkpoint
            )
            guarded.append(True)
        _apply_group_counts_batch(
            batch_df, batch_id, index_dir, group_col, value_col
        )

    writer = stream_events.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer


def running_group_counts(
    spark: SparkSession, index_dir: str
) -> DataFrame:
    """(g, v, c) summed over every COMMITTED micro-batch."""
    commits = _committed(spark, os.path.join(index_dir, "commits")).select(
        F.col("batch_id").alias("_batch_id")
    )
    counts = _read_or_empty(
        spark,
        os.path.join(index_dir, "counts"),
        _COUNTS_SCHEMA + ", _batch_id bigint",
    )
    return (
        counts.join(F.broadcast(commits), "_batch_id", "left_semi")
        .groupBy("g", "v")
        .agg(F.sum("c").alias("c"))
    )


def kruskal_now(spark: SparkSession, index_dir: str) -> DataFrame:
    """Kruskal-Wallis readout over the committed state — "do the k
    arms draw their values from one distribution?" by pooled ranks
    (operators.analytics.kruskal_wallis_from_counts, the kernel the
    batch kruskal_wallis_value_by_type entry lowers onto). Returns
    one row: (k_groups, n_total, h_stat, z_wh, significant); NULL
    statistics while fewer than two arms have committed."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        kruskal_wallis_from_counts,
    )

    return materialize_readout(
        lambda: kruskal_wallis_from_counts(
        running_group_counts(spark, index_dir)
    )
    )


def brown_forsythe_now(
    spark: SparkSession, index_dir: str
) -> DataFrame:
    """Brown-Forsythe readout over the same committed state — "did a
    variant's SPREAD change?" (operators.analytics.
    brown_forsythe_from_counts): the volatility alarm beside
    kruskal_now's location test, from the same frame. Returns one
    row: (k_groups, n_total, f_stat, z_wh, significant)."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        brown_forsythe_from_counts,
    )

    return materialize_readout(
        lambda: brown_forsythe_from_counts(
        running_group_counts(spark, index_dir)
    )
    )


def anova_now(spark: SparkSession, index_dir: str) -> DataFrame:
    """One-way ANOVA readout over the same committed state — the
    MEAN member of the family: per-group exact moments (n, sum c*v,
    sum c*v^2 on decimal(38,0)) derived from the count frame feed
    operators.analytics.anova_f_from_groups unchanged. Returns one
    row: (k_groups, n_total, f_stat, z_wh, significant)."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        anova_f_from_groups,
    )

    counts = running_group_counts(spark, index_dir)
    groups = counts.groupBy("g").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("v")).alias("s"),
        F.sum(
            F.col("v").cast("decimal(38,0)") * F.col("v") * F.col("c")
        ).alias("q"),
    )
    return materialize_readout(
        lambda: anova_f_from_groups(groups)
    )


def jt_now(spark: SparkSession, index_dir: str) -> DataFrame:
    """Jonckheere-Terpstra readout over the committed state — the
    ORDERED member of the family: "do the values rise (or fall) with
    the group order?" (operators.analytics.
    jonckheere_terpstra_from_counts; groups ordered by the natural
    sort of g, so the caller encodes the hypothesis in the key —
    week index, dose level, variant rank). Beside kruskal_now's
    any-difference test this is the dose-response alarm, from the
    same frame. Returns one row: (k_groups, n_total, jt_auc, z_jt,
    trend); NULL statistics while fewer than two arms have
    committed."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        jonckheere_terpstra_from_counts,
    )

    return materialize_readout(
        lambda: jonckheere_terpstra_from_counts(
        running_group_counts(spark, index_dir)
    )
    )

def mood_now(spark: SparkSession, index_dir: str) -> DataFrame:
    """Mood's median readout over the committed state — the
    OUTLIER-PROOF member completing the k-group monitor's family
    (operators.analytics.mood_median_from_counts, the kernel the
    batch mood_median_value_by_type entry lowers onto): kruskal_now
    ranks, brown_forsythe_now measures spread, anova_now compares
    means, this reduces every committed value to one bit — above the
    pooled median or not — so a single wild value in one arm cannot
    fire the alarm. The right continuous readout when the monitored
    value is heavy-tailed (payment amounts, latencies). Rides
    running_group_counts verbatim, no new state. Returns one row:
    (k_groups, n_total, n_above, chi2, z_wh, significant); NULL
    statistics while fewer than two arms have committed or every
    value sits on one side of the median."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        mood_median_from_counts,
    )

    return materialize_readout(
        lambda: mood_median_from_counts(
        running_group_counts(spark, index_dir)
    )
    )
