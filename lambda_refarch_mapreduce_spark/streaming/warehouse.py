"""Continuous materialized-view maintenance: the streaming twin of the
batch warehouse chain (plans/catalog_analytics.py
``jobspec_cdc_apply_snapshot`` / ``jobspec_mv_refresh_hourly``). A CDC
changelog streams in; each micro-batch refreshes a stored per-group
(sum, count) view at CHANGE cost via
operators.analytics.incremental_agg_update and advances a
merge-on-read key OVERLAY, writing both as a new GENERATION and
atomically flipping CURRENT last (streaming/ann.py's swap
discipline) — readers always see a complete, internally consistent
(view, overlay) pair; a crashed refresh leaves the old generation
live.

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

Ordering contract (same as the funnel/attribution twins in
streaming/stateful.py): the changelog source must deliver a key's
changes in non-decreasing ``seq`` order across micro-batches — within
a batch any order is fine (the compaction window sorts); across
batches a later-arriving LOWER seq would lose to the overlay's
winner, which is also what a warehouse MERGE would do.

Idempotence under at-least-once foreachBatch: CURRENT records the
batch_id that produced the live generation; a replayed batch_id ≤
that watermark is a no-op (applying a changelog batch twice would
double its deltas — the one failure mode an aggregate view cannot
tolerate), the generation directory is written with mode=overwrite,
and CURRENT is flipped only after both artifacts land.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lambda_refarch_mapreduce_spark.operators.analytics import (
    apply_cdc,
    incremental_agg_update,
)


def _current_path(view_dir: str) -> str:
    return os.path.join(view_dir, "CURRENT")


def _current_meta(view_dir: str) -> dict:
    p = _current_path(view_dir)
    if not os.path.exists(p):
        return {"generation": 0, "batch_id": -1}
    with open(p) as fh:
        return json.load(fh)


def current_generation(view_dir: str) -> int:
    return int(_current_meta(view_dir)["generation"])


def _gen_path(view_dir: str, n: int) -> str:
    return os.path.join(view_dir, f"gen-{n:06d}")


def _flip_current(view_dir: str, n: int, batch_id: int = -1) -> None:
    # write-then-rename: readers of CURRENT never observe a torn file
    tmp = _current_path(view_dir) + ".tmp"
    os.makedirs(view_dir, exist_ok=True)
    with open(tmp, "w") as fh:
        json.dump({"generation": n, "batch_id": batch_id}, fh)
    os.replace(tmp, _current_path(view_dir))


def init_view(
    spark: SparkSession,
    view_dir: str,
    base: DataFrame,
    group_cols: list[str],
    value_col: str,
    sum_name: str = "total",
    cnt_name: str = "n_rows",
) -> str:
    """Materialize generation 1: the full aggregate of the base (the
    one table-cost job, paid once at install) and an empty overlay.
    Returns the generation directory."""
    gen = _gen_path(view_dir, 1)
    mv = base.groupBy(*group_cols).agg(
        F.sum(value_col).alias(sum_name),
        F.count(F.lit(1)).alias(cnt_name),
    )
    mv.write.mode("overwrite").parquet(os.path.join(gen, "view"))
    base.limit(0).withColumn("seq", F.lit(0).cast("long")).withColumn(
        "op", F.lit("")
    ).write.mode("overwrite").parquet(os.path.join(gen, "overlay"))
    _flip_current(view_dir, 1)
    return gen


def read_view(spark: SparkSession, view_dir: str) -> DataFrame:
    """The LIVE view — resolve CURRENT, read that generation only."""
    return spark.read.parquet(
        os.path.join(_gen_path(view_dir, current_generation(view_dir)), "view")
    )


def read_overlay(spark: SparkSession, view_dir: str) -> DataFrame:
    return spark.read.parquet(
        os.path.join(
            _gen_path(view_dir, current_generation(view_dir)), "overlay"
        )
    )


def effective_base(
    spark: SparkSession, view_dir: str, base: DataFrame, key_cols: list[str]
) -> DataFrame:
    """The merge-on-read applied snapshot: base0 with the live
    overlay's winning changes applied — a lazy plan (anti-join +
    union), never a rewritten table."""
    ov = read_overlay(spark, view_dir)
    if not ov.head(1):
        return base
    return apply_cdc(base, ov, key_cols, "seq")


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
    available_now: bool = True,
):
    """foreachBatch pipeline: per micro-batch, refresh the live view at
    change cost against the EFFECTIVE base (base0 + live overlay),
    advance the overlay, write generation N+1, flip CURRENT. Returns
    the DataStreamWriter (caller starts it).

    Every per-batch stage is change-sized: the view refresh is the
    plan-guarded incremental_agg_update; the overlay advance is a
    window over |overlay| + |batch| rows; the only base touch is the
    probe scan inside the refresh."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        meta = _current_meta(view_dir)
        cur = int(meta["generation"])
        if cur == 0:
            raise ValueError(
                f"no live generation under {view_dir!r} — call init_view "
                "before starting the maintainer"
            )
        if batch_id <= int(meta.get("batch_id", -1)):
            return  # at-least-once replay of an already-applied batch
        view = spark.read.parquet(os.path.join(_gen_path(view_dir, cur), "view"))
        overlay = spark.read.parquet(
            os.path.join(_gen_path(view_dir, cur), "overlay")
        )
        has_overlay = bool(overlay.head(1))
        eff_base = (
            apply_cdc(base, overlay, key_cols, seq_col) if has_overlay else base
        )
        batch = batch_df.select(*overlay.columns)
        new_view = incremental_agg_update(
            view,
            eff_base,
            batch,
            key_cols,
            seq_col,
            op_col,
            group_cols,
            value_col,
            sum_name,
            cnt_name,
        )
        # overlay advance: union and keep the highest-seq change per
        # key (the batch's changes outrank the overlay's under the
        # ordering contract; the window enforces it either way)
        w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
        new_overlay = (
            overlay.unionByName(batch)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        new_gen = _gen_path(view_dir, cur + 1)
        new_view.write.mode("overwrite").parquet(os.path.join(new_gen, "view"))
        new_overlay.write.mode("overwrite").parquet(
            os.path.join(new_gen, "overlay")
        )
        _flip_current(view_dir, cur + 1, batch_id)  # swap LAST

    writer = stream_changes.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer
