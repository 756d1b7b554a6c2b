"""Continuous sequential testing: conversion events stream in, each
micro-batch folds its per-day (successes, trials) counts into
committed running state, and Wald's SPRT decision — the walk, the
first boundary crossing, accept/continue — is computable at any
moment from that day-alphabet-sized state. This is what the SPRT is
FOR: the experiment stops the moment the evidence suffices, so the
statistic must be servable mid-stream, not at a fixed horizon.

Streaming twin of the catalog's sprt_ab_daily_llr entry through the
SAME kernel (operators.analytics.sprt_walk_from_counts — integer
micro-nat log-likelihood increments, exact-integer prefix-sum walk),
the shared-kernel contract of streaming/abtest.py (MW/KS/Welch) and
streaming/survival.py (KM/log-rank): counts are additive, so the
streamed decision equals the batch kernel on the union EXACTLY.

Commit scheme and lifecycle contract are abtest.py's, verbatim:
per-batch (dd, x, m) rows land under ``counts/_batch_id=N`` as an
overwrite, the commit log is appended LAST so at-least-once replays
are no-ops, and corpus.guard_checkpoint_epoch makes a fresh
checkpoint against a surviving index raise instead of undercounting.

Scale posture: per-batch state is the batch's day alphabet; the walk
at serve time runs over the merged |days| rows (SCALING.md r9: the
batch kernel's shuffle is FLAT at 0.05 MB from 1x to 100x rows).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_refarch_mapreduce_spark.operators.analytics import (
    sprt_walk_from_counts,
)
from lambda_refarch_mapreduce_spark.streaming.corpus import (
    _committed,
    _read_or_empty,
    materialize_readout,
)

_COUNTS_SCHEMA = "dd bigint, x bigint, m bigint"


def batch_day_counts(
    events: DataFrame,
    success_pred: str,
    trial_pred: str,
    ts_col: str = "ts",
) -> DataFrame:
    """(dd, x, m) per epoch day — the monitor's state unit: successes
    are rows matching ``success_pred`` (SQL boolean over the event
    row), trials are rows matching ``trial_pred``."""
    return (
        events.filter(F.expr(trial_pred))
        .select(
            F.datediff(
                F.to_date(ts_col), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("dd"),
            F.when(F.expr(success_pred), 1).otherwise(0).alias("is_x"),
        )
        .groupBy("dd")
        .agg(F.sum("is_x").alias("x"), F.count(F.lit(1)).alias("m"))
    )


def _apply_day_counts_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    success_pred: str,
    trial_pred: str,
    ts_col: str = "ts",
) -> None:
    """One idempotent micro-batch application (abtest.py's scheme):
    collapse to the day-count frame, overwrite ``counts/_batch_id=N``,
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
    counts = batch_day_counts(batch_df, success_pred, trial_pred, ts_col)
    counts.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(counts_path, f"_batch_id={batch_id}")
    )
    spark.createDataFrame([(batch_id,)], "batch_id bigint").write.mode(
        "append"
    ).parquet(commits_path)


def ingest_day_counts(
    stream_events: DataFrame,
    index_dir: str,
    checkpoint: str,
    success_pred: str,
    trial_pred: str,
    ts_col: str = "ts",
    available_now: bool = True,
):
    """foreachBatch pipeline: collapse each micro-batch to its
    (dd, x, m) frame and commit it idempotently. Returns the
    DataStreamWriter (caller starts it); checkpoint/index lifecycle
    enforced via corpus.guard_checkpoint_epoch."""
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
        _apply_day_counts_batch(
            batch_df, batch_id, index_dir, success_pred, trial_pred, ts_col
        )

    writer = stream_events.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer


def running_day_counts(spark: SparkSession, index_dir: str) -> DataFrame:
    """(dd, x, m) summed over every COMMITTED micro-batch."""
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
        .groupBy("dd")
        .agg(F.sum("x").alias("x"), F.sum("m").alias("m"))
    )


def sprt_now(
    spark: SparkSession,
    index_dir: str,
    l1_micro: int,
    l2_micro: int,
    a_micro: int,
) -> DataFrame:
    """The monitor's readout: one row (n_days, llr_final_micro,
    first_h1_day, first_h0_day, decision) over everything committed
    so far — identical arithmetic to the batch catalog entry (shared
    kernel, exact-integer walk)."""
    return materialize_readout(
        lambda: sprt_walk_from_counts(
        running_day_counts(spark, index_dir), l1_micro, l2_micro, a_micro
    )
    )


def trend_now(spark: SparkSession, index_dir: str) -> DataFrame:
    """Mann-Kendall trend readout over the committed daily conversion
    series — the same committed (dd, x, m) frame the SPRT serves
    from, read as "is the daily success COUNT monotonically moving?"
    (operators.analytics.mann_kendall_trend; one monitor, the
    sequential decision AND the trend diagnosis). Returns one row:
    (n_obs, s_mk, var_s, z_mk, trend)."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        mann_kendall_trend,
    )

    return materialize_readout(
        lambda: mann_kendall_trend(
        running_day_counts(spark, index_dir), "dd", "x"
    )
    )


def forecast_now(
    spark: SparkSession,
    index_dir: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    m: int = 7,
) -> DataFrame:
    """Holt-Winters one-step forecast of the daily TRIAL volume over
    the committed day frame (operators.analytics.
    holt_winters_from_series, weekly seasonality by default) — the
    capacity-planning readout beside the SPRT decision and the
    Mann-Kendall trend on the same state: "how many observations
    should tomorrow bring?" feeds both alerting (volume collapse) and
    the decision-time estimate. Returns one row: (n_obs, level,
    trend, season_next, forecast_next); NULL smoothed columns until
    2*m days are committed."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        holt_winters_from_series,
    )

    day = running_day_counts(spark, index_dir).withColumn(
        "__one", F.lit(1)
    )
    return materialize_readout(
        lambda: holt_winters_from_series(
        day, ["__one"], ["dd"], "m", alpha, beta, gamma, m
    ).drop("__one")
    )


def backtest_now(
    spark: SparkSession,
    index_dir: str,
    alpha: float = 0.3,
    beta: float = 0.1,
) -> DataFrame:
    """Rolling-origin backtest of the daily trial-volume forecast
    over the committed day frame (operators.analytics.
    rolling_backtest_holt — the round-10 batch kernel, consumed here
    the way forecast_now consumes Holt-Winters): before anyone acts
    on forecast_now's number, this readout says whether the smoother
    has actually been beating the naive carry-forward on THIS
    series — MAE/RMSE for both plus the skill score, recomputed over
    everything committed so far. Same shared-kernel contract as every
    monitor readout: identical arithmetic to the batch catalog entry,
    so streamed-then-scored equals batch-scored exactly. Returns one
    row: (n_obs, n_forecasts, mae_holt, rmse_holt, mae_naive,
    rmse_naive, skill_vs_naive); NULL metrics until 3 days commit."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        rolling_backtest_holt,
    )

    return materialize_readout(
        lambda: rolling_backtest_holt(
        running_day_counts(spark, index_dir), [], ["dd"], "m", alpha, beta
    )
    )


def decompose_now(
    spark: SparkSession, index_dir: str, m: int = 7
) -> DataFrame:
    """Seasonal decomposition of the committed daily trial volume
    (operators.analytics.seasonal_decompose_additive, weekly by
    default) — the DIAGNOSTIC readout beside forecast_now's
    Holt-Winters number: trend / day-of-week seasonal / remainder per
    committed day, so a volume alert can say "the drop is the usual
    Sunday dip" or "the trend itself broke". Same shared-kernel
    contract: streamed-then-decomposed equals the batch kernel on the
    union exactly. Returns one row per committed day: (dd, m, trend,
    seasonal, remainder); edge/gap days carry NULL trend."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        seasonal_decompose_additive,
    )

    return materialize_readout(
        lambda: seasonal_decompose_additive(
        running_day_counts(spark, index_dir), [], "dd", "m", m
    )
    )


def changepoint_now(
    spark: SparkSession, index_dir: str, alpha: float = 0.05
) -> DataFrame:
    """Retrospective changepoint readout over the committed daily
    conversion RATE (operators.analytics.cusum_changepoint on
    micro-rate units x*1e6 div m — exact integer floor division):
    WHERE did the success rate shift, with the Brownian-bridge
    significance the sequential SPRT decision doesn't give. One
    monitor answers "stop now?" (sprt_now), "is there a trend?"
    (trend_now), and "when did it break?" (this). Returns one row:
    (n_obs, cp_index, cp_t, mean_before, mean_after, k_stat,
    significant) in micro-rate units."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cusum_changepoint,
    )

    day = running_day_counts(spark, index_dir).selectExpr(
        "dd", "(x * 1000000) div m AS rate_micro"
    )
    return materialize_readout(
        lambda: cusum_changepoint(day, "dd", "rate_micro", alpha)
    )


def seasonal_trend_now(
    spark: SparkSession, index_dir: str, m: int = 7
) -> DataFrame:
    """Seasonal Mann-Kendall readout over the committed daily success
    counts (operators.analytics.seasonal_mann_kendall, weekly
    phases): the trend decision a weekly cycle cannot fool —
    same-weekday pairs only, per-phase variances summed — beside
    trend_now's plain Mann-Kendall and decompose_now's trend column.
    Returns one row: (n_obs, n_phases, s_mk, var_s, z_mk, trend)."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        seasonal_mann_kendall,
    )

    return materialize_readout(
        lambda: seasonal_mann_kendall(
        running_day_counts(spark, index_dir), "dd", "x", m
    )
    )


def seasonal_backtest_now(
    spark: SparkSession,
    index_dir: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    m: int = 7,
) -> DataFrame:
    """Rolling-origin Holt-WINTERS backtest over the committed daily
    trial volume (operators.analytics.rolling_backtest_hw — the
    round-11 seasonal rung of backtest_now): before anyone acts on
    forecast_now's Holt-Winters number, this readout says whether the
    seasonal smoother has been beating BOTH the plain-Holt forecast
    and the "same weekday last week" carry-forward on THIS series —
    MAE/RMSE for all three plus the two skill scores, recomputed over
    everything committed so far. Same shared-kernel contract as every
    monitor readout: identical arithmetic to the batch catalog entry
    (hw_backtest_daily_events), so streamed-then-scored equals
    batch-scored exactly. Returns one row: (n_obs, n_forecasts,
    mae_hw, rmse_hw, mae_holt, rmse_holt, mae_snaive, rmse_snaive,
    skill_vs_snaive, skill_vs_holt); NULL metrics until 2m+1 days
    commit."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        rolling_backtest_hw,
    )

    return materialize_readout(
        lambda: rolling_backtest_hw(
        running_day_counts(spark, index_dir),
        [],
        ["dd"],
        "m",
        alpha,
        beta,
        gamma,
        m,
    )
    )


def rank_changepoint_now(
    spark: SparkSession, index_dir: str, alpha: float = 0.05
) -> DataFrame:
    """Pettitt rank-based changepoint readout over the committed
    daily conversion rate (operators.analytics.pettitt_changepoint on
    the same micro-rate series changepoint_now feeds CUSUM) — the
    ROBUST second opinion: when both changepoint readouts agree the
    rate regime really moved; when only CUSUM fires, suspect an
    outlier day rather than a shift. Returns one row: (n_obs,
    cp_index, cp_t, u_stat, p_approx, significant)."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        pettitt_changepoint,
    )

    day = running_day_counts(spark, index_dir).selectExpr(
        "dd", "(x * 1000000) div m AS rate_micro"
    )
    return materialize_readout(
        lambda: pettitt_changepoint(day, "dd", "rate_micro", alpha)
    )


def ljung_box_now(
    spark: SparkSession, index_dir: str, max_lag: int = 7
) -> DataFrame:
    """Ljung-Box white-noise readout over the committed daily TRIAL
    series — the residual-memory alarm beside trend_now's monotone
    test on the same (dd, x, m) frame: a significant Q says the
    daily volume still carries autocorrelation (weekly cycle,
    campaign waves) that the forecast readouts must model rather
    than average away (operators.analytics.ljung_box_from_series at
    lags 1..max_lag). Returns one row: (n_obs, n_lags, q_stat, z_wh,
    significant); NULL statistics until at least two distinct days
    with nonconstant volume are committed."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        ljung_box_from_series,
    )

    return materialize_readout(
        lambda: ljung_box_from_series(
        running_day_counts(spark, index_dir), "dd", "m", max_lag
    )
    )


def runs_now(spark: SparkSession, index_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs readout over the committed daily
    conversion RATE series (the changepoint_now micro-rate units) —
    the assumption-free randomness alarm beside the parametric
    family: CUSUM asks WHERE the rate broke, Mann-Kendall whether it
    drifts, this whether the above/below-median pattern is random at
    all (too few runs = regimes, too many = alternation) —
    operators.analytics.runs_test_from_series. Returns one row:
    (n_above, n_below, n_runs, z_runs, verdict); NULL statistics
    until both signs appear in the committed days."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        runs_test_from_series,
    )

    day = running_day_counts(spark, index_dir).selectExpr(
        "dd", "(x * 1000000) div m AS rate_micro"
    )
    return materialize_readout(
        lambda: runs_test_from_series(day, "dd", "rate_micro")
    )
