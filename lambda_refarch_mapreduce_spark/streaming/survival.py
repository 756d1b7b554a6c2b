"""Continuous survival monitoring: subject outcomes stream in — one
row per subject ``(t, event, g)``, duration t in integer time units,
event 1 = observed (churned/failed) at t, 0 = right-censored — each
micro-batch folds into a committed per-(group, time) death/censor
count frame, and the Kaplan-Meier curve (per group or pooled) and the
two-group log-rank test are computable at any moment from that
alphabet-sized state. The subject log itself is never retained or
rescanned.

This is the streaming twin of the catalog's
kaplan_meier_customer_churn / log_rank_churn_by_segment entries
(VERDICT r8 'next round' #6) and serves through the SAME kernels
(operators.analytics.kaplan_meier_from_counts /
log_rank_from_counts) — the shared-kernel contract that already binds
the A/B monitor to the MW/KS/Welch entries (streaming/abtest.py), so
the streamed statistic equals the batch kernel on the union EXACTLY
(counts are additive; the fold arithmetic is identical code).

Commit scheme, lifecycle contract and caveat are abtest.py's,
verbatim: per-batch count rows land under ``counts/_batch_id=N`` as
an overwrite, the commit log is appended LAST so at-least-once
replays are no-ops, and the checkpoint-epoch guard
(corpus.guard_checkpoint_epoch) makes a fresh checkpoint against a
surviving index raise instead of silently undercounting.

Scale posture: per-batch state is the batch's (group x time) alphabet
— for churn-style data, |segments| x |days|, metadata-sized. The
serve-time at-risk prefix sums and sorted folds run over the merged
alphabet only (SCALING.md round-8: the log-rank shuffle saturates at
the alphabet under 100x row growth).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_refarch_mapreduce_spark.operators.analytics import (
    kaplan_meier_from_counts,
    log_rank_from_counts,
)
from lambda_refarch_mapreduce_spark.streaming.corpus import (
    _committed,
    _read_or_empty,
    materialize_readout,
)

_COUNTS_SCHEMA = "g string, t bigint, d bigint, c bigint"


def batch_survival_counts(
    subjects: DataFrame,
    group_a: str,
    group_b: str,
    t_col: str = "t",
    event_col: str = "event",
    group_col: str = "g",
) -> DataFrame:
    """(g, t, d, c) per (mapped group, time) — the monitor's state
    unit: the same collapse log_rank_from_subjects performs, with g
    mapped to 'a'/'b' and other groups dropped."""
    s = subjects.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(event_col).cast("long").alias("ev"),
        F.when(F.col(group_col) == group_a, F.lit("a"))
        .when(F.col(group_col) == group_b, F.lit("b"))
        .alias("g"),
    ).filter(F.col("g").isNotNull())
    return s.groupBy("g", "t").agg(
        F.sum("ev").alias("d"),
        F.sum(1 - F.col("ev")).alias("c"),
    )


def _apply_survival_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    group_a: str,
    group_b: str,
    t_col: str = "t",
    event_col: str = "event",
    group_col: str = "g",
) -> None:
    """One idempotent micro-batch application (abtest.py's scheme):
    collapse to the count frame, overwrite ``counts/_batch_id=N``,
    append the commit row LAST. Module-level so the at-least-once
    replay contract is directly testable."""
    spark = batch_df.sparkSession
    counts_path = os.path.join(index_dir, "counts")
    commits_path = os.path.join(index_dir, "commits")
    if batch_df.isEmpty():
        return
    commits = _committed(spark, commits_path)
    if commits.filter(F.col("batch_id") == batch_id).limit(1).count():
        return
    counts = batch_survival_counts(
        batch_df, group_a, group_b, t_col, event_col, group_col
    )
    counts.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(counts_path, f"_batch_id={batch_id}")
    )
    spark.createDataFrame([(batch_id,)], "batch_id bigint").write.mode(
        "append"
    ).parquet(commits_path)


def ingest_survival_counts(
    stream_subjects: DataFrame,
    index_dir: str,
    checkpoint: str,
    group_a: str,
    group_b: str,
    t_col: str = "t",
    event_col: str = "event",
    group_col: str = "g",
    available_now: bool = True,
):
    """foreachBatch pipeline: collapse each micro-batch of subject
    outcomes to its (g, t, d, c) frame and commit it idempotently.
    Returns the DataStreamWriter (caller starts it). The
    checkpoint/index lifecycle contract is enforced via
    corpus.guard_checkpoint_epoch, as in abtest.ingest_value_counts."""
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
        _apply_survival_batch(
            batch_df,
            batch_id,
            index_dir,
            group_a,
            group_b,
            t_col,
            event_col,
            group_col,
        )

    writer = stream_subjects.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer


def running_survival_counts(
    spark: SparkSession, index_dir: str
) -> DataFrame:
    """(g, t, d, c) summed over every COMMITTED micro-batch."""
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
        .groupBy("g", "t")
        .agg(F.sum("d").alias("d"), F.sum("c").alias("c"))
    )


def kaplan_meier_now(
    spark: SparkSession, index_dir: str, group: str | None = None
) -> DataFrame:
    """The monitor's KM readout over everything committed so far:
    ``group`` = 'a' or 'b' for one arm's curve, None for the pooled
    curve — identical arithmetic to the batch catalog entry (shared
    kernel). Returns (t, n_risk, n_events, n_censored, survival)."""
    counts = running_survival_counts(spark, index_dir)
    if group is not None:
        counts = counts.filter(F.col("g") == group)
    return materialize_readout(
        lambda: kaplan_meier_from_counts(counts.select("t", "d", "c"))
    )


def log_rank_now(spark: SparkSession, index_dir: str) -> DataFrame:
    """The monitor's log-rank readout: one row
    (n_a, n_b, obs_a, exp_a, z_lr, significant) between the two arms
    over everything committed so far (shared kernel)."""
    return materialize_readout(
        lambda: log_rank_from_counts(running_survival_counts(spark, index_dir))
    )


def nelson_aalen_now(
    spark: SparkSession, index_dir: str, group: str | None = None
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard readout over everything
    committed so far — the additive companion to kaplan_meier_now on
    the SAME committed count frame (one monitor, every survival
    estimator). ``group`` = 'a'/'b' for one arm, None pooled."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        nelson_aalen_from_counts,
    )

    counts = running_survival_counts(spark, index_dir)
    if group is not None:
        counts = counts.filter(F.col("g") == group)
    return materialize_readout(
        lambda: nelson_aalen_from_counts(counts.select("t", "d", "c"))
    )


def gehan_now(spark: SparkSession, index_dir: str) -> DataFrame:
    """Gehan-Breslow-Wilcoxon readout over the committed survival
    state — the EARLY-difference alarm beside log_rank_now's
    equal-weight test on the same (g, t, d, c) frame (operators.
    analytics.gehan_wilcoxon_from_counts): opposite signs on the two
    readouts flag crossing survival curves. Returns one row: (n_a,
    n_b, u_gehan, z_gehan, significant); NULL statistics while the
    committed frame has no variance (one arm, no events)."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        gehan_wilcoxon_from_counts,
    )

    return materialize_readout(
        lambda: gehan_wilcoxon_from_counts(
        running_survival_counts(spark, index_dir)
    )
    )
