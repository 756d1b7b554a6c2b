"""Continuous materialized-view maintenance: the streaming twin of the
batch warehouse chain (plans/catalog_analytics.py
``jobspec_cdc_apply_snapshot`` / ``jobspec_mv_refresh_hourly``). A CDC
changelog streams in; each micro-batch refreshes a stored per-group
(sum, count) view at CHANGE cost via
operators.analytics.incremental_agg_update and advances a
merge-on-read key OVERLAY, writing both as a new GENERATION and
atomically flipping CURRENT last (streaming/ann.py's swap
discipline) — readers always see a complete generation; ``read_live``
resolves CURRENT once and hands back a consistent (view, overlay)
pair; a crashed refresh leaves the old generation live.

Why an overlay instead of rewriting the applied base: the refresh
negates the CURRENT value of each re-changed key, so the maintainer
needs the effective (post-all-prior-batches) base — but rewriting the
base table every micro-batch would be table cost, exactly what the
incremental discipline forbids. Instead the immutable base snapshot
stays where it is and the generation carries a compacted
(key -> winning change) overlay: the effective base is
``apply_cdc(base0, overlay)``, a lazy plan whose probe scans base0 in
place (no exchange on the base — the same plan shape
tests/test_scale_plans.py::test_mv_refresh_shuffles_are_changelog_keyed
pins for the batch operator). This is the lakehouse merge-on-read /
delta-log pattern: per-generation state is |groups| view rows plus
|changed keys| overlay rows, both change-sized, never table-sized.

Idempotence and ordering are CONTENT-based, not batch-id-based: each
micro-batch is first filtered to the changes that are strictly NEWER
than the live overlay's winner for their key (a changelog-sized
left join). That single rule makes three failure modes no-ops by
construction:

- an at-least-once replay of an applied batch (every change <= its
  own recorded winner) refreshes nothing and writes no generation;
- a lost-checkpoint restart that lumps replayed AND new files into
  one micro-batch applies exactly the new changes — a batch-id
  watermark would have skipped the new ones wholesale;
- a late, lower-seq change is dropped for BOTH the view and the
  overlay (the same row the overlay compaction would reject), so the
  two can never diverge; a warehouse MERGE with a monotonic version
  column behaves identically.

Retention: every applied batch writes a full (small) new generation;
``keep_generations`` prunes older ones after the flip so a
long-running maintainer's disk use is bounded by
keep x (|groups| + |changed keys|), not by stream lifetime.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_refarch_mapreduce_spark.operators.analytics import (
    apply_cdc,
    incremental_agg_update,
)


def _current_path(view_dir: str) -> str:
    return os.path.join(view_dir, "CURRENT")


def _current_meta(view_dir: str) -> dict:
    p = _current_path(view_dir)
    if not os.path.exists(p):
        return {"generation": 0}
    with open(p) as fh:
        return json.load(fh)


def current_generation(view_dir: str) -> int:
    return int(_current_meta(view_dir)["generation"])


def _gen_path(view_dir: str, n: int) -> str:
    return os.path.join(view_dir, f"gen-{n:06d}")


def _flip_current(view_dir: str, n: int) -> None:
    # write-then-rename: readers of CURRENT never observe a torn file
    tmp = _current_path(view_dir) + ".tmp"
    os.makedirs(view_dir, exist_ok=True)
    with open(tmp, "w") as fh:
        json.dump({"generation": n}, fh)
    os.replace(tmp, _current_path(view_dir))


def _prune_generations(view_dir: str, live: int, keep: int) -> None:
    """Delete generations older than live-keep+1 AFTER the flip — the
    live one and keep-1 predecessors stay for in-flight readers."""
    for n in range(1, live - keep + 1):
        g = _gen_path(view_dir, n)
        if os.path.exists(g):
            shutil.rmtree(g, ignore_errors=True)


def init_view(
    spark: SparkSession,
    view_dir: str,
    base: DataFrame,
    group_cols: list[str],
    value_col: str,
    sum_name: str = "total",
    cnt_name: str = "n_rows",
    seq_col: str = "seq",
    op_col: str = "op",
) -> str:
    """Materialize generation 1: the full aggregate of the base (the
    one table-cost job, paid once at install) and an empty overlay
    whose schema is base + (seq_col, op_col) — the maintainer selects
    batch columns by this schema, so the names must match the
    stream's. Returns the generation directory."""
    gen = _gen_path(view_dir, 1)
    mv = base.groupBy(*group_cols).agg(
        F.sum(value_col).alias(sum_name),
        F.count(F.lit(1)).alias(cnt_name),
    )
    mv.write.mode("overwrite").parquet(os.path.join(gen, "view"))
    base.limit(0).withColumn(seq_col, F.lit(0).cast("long")).withColumn(
        op_col, F.lit("")
    ).write.mode("overwrite").parquet(os.path.join(gen, "overlay"))
    _flip_current(view_dir, 1)
    return gen


def read_live(
    spark: SparkSession, view_dir: str
) -> tuple[int, DataFrame, DataFrame]:
    """(generation, view, overlay) with CURRENT resolved exactly ONCE
    — the only way to get a mutually consistent pair under a
    concurrent flip. read_view/read_overlay are conveniences for
    callers that need one side only."""
    gen = current_generation(view_dir)
    gd = _gen_path(view_dir, gen)
    return (
        gen,
        spark.read.parquet(os.path.join(gd, "view")),
        spark.read.parquet(os.path.join(gd, "overlay")),
    )


def read_view(spark: SparkSession, view_dir: str) -> DataFrame:
    """The LIVE view — resolve CURRENT, read that generation only."""
    return read_live(spark, view_dir)[1]


def read_overlay(spark: SparkSession, view_dir: str) -> DataFrame:
    return read_live(spark, view_dir)[2]


def effective_base(
    spark: SparkSession,
    view_dir: str,
    base: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """The merge-on-read applied snapshot: base0 with the live
    overlay's winning changes applied — a lazy plan (anti-join +
    union), never a rewritten table."""
    ov = read_overlay(spark, view_dir)
    if not ov.head(1):
        return base
    return apply_cdc(base, ov, key_cols, seq_col, op_col)


def maintain_view_stream(
    stream_changes: DataFrame,
    view_dir: str,
    base: DataFrame,
    checkpoint: str,
    key_cols: list[str],
    group_cols: list[str],
    value_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
    sum_name: str = "total",
    cnt_name: str = "n_rows",
    keep_generations: int = 2,
    available_now: bool = True,
):
    """foreachBatch pipeline: per micro-batch, keep only changes
    strictly newer than the live overlay's per-key winner (the
    content-based idempotence/ordering rule in the module docstring),
    refresh the live view at change cost against the EFFECTIVE base
    (base0 + live overlay), advance the overlay, write generation
    N+1, flip CURRENT, prune generations older than
    ``keep_generations``. Returns the DataStreamWriter (caller
    starts it).

    Every per-batch stage is change-sized: the freshness filter and
    overlay advance are joins/windows over |overlay| + |batch| rows;
    the view refresh is the plan-guarded incremental_agg_update; the
    only base touch is the probe scan inside the refresh."""
    from pyspark.sql.window import Window

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        cur = current_generation(view_dir)
        if cur == 0:
            raise ValueError(
                f"no live generation under {view_dir!r} — call init_view "
                "before starting the maintainer"
            )
        gd = _gen_path(view_dir, cur)
        view = spark.read.parquet(os.path.join(gd, "view"))
        overlay = spark.read.parquet(os.path.join(gd, "overlay"))
        # content-based freshness: a change is applied iff it outranks
        # the overlay's recorded winner for its key — replays and
        # late lower-seq arrivals drop here, for view AND overlay
        winners = overlay.select(
            *key_cols, F.col(seq_col).alias("__ov_seq")
        )
        fresh = (
            batch_df.select(*overlay.columns)
            .join(winners, key_cols, "left")
            .filter(
                F.col("__ov_seq").isNull()
                | (F.col(seq_col) > F.col("__ov_seq"))
            )
            .drop("__ov_seq")
        )
        if not fresh.head(1):
            return  # nothing new: no refresh, no generation
        has_overlay = bool(overlay.head(1))
        eff_base = (
            apply_cdc(base, overlay, key_cols, seq_col, op_col)
            if has_overlay
            else base
        )
        new_view = incremental_agg_update(
            view,
            eff_base,
            fresh,
            key_cols,
            seq_col,
            op_col,
            group_cols,
            value_col,
            sum_name,
            cnt_name,
        )
        # overlay advance: union and keep the highest-seq change per
        # key (fresh rows outrank their overlay predecessors by the
        # filter above; the window is belt-and-suspenders)
        w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
        new_overlay = (
            overlay.unionByName(fresh)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        new_gen = _gen_path(view_dir, cur + 1)
        new_view.write.mode("overwrite").parquet(os.path.join(new_gen, "view"))
        new_overlay.write.mode("overwrite").parquet(
            os.path.join(new_gen, "overlay")
        )
        _flip_current(view_dir, cur + 1)  # swap LAST
        _prune_generations(view_dir, cur + 1, keep_generations)

    writer = stream_changes.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer
