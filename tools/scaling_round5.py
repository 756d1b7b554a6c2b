"""Scaling check for the round-5 additions at 1x / 10x / 100x of
sf0.1: image aHash dedup, the strict-order funnel, and last-touch
attribution.

Replica construction (same discipline as tools/scaling_analytics.py —
within-replica structure preserved, workload growth linear by design):

- documents: replica r shifts doc_id by r*1_000_000. The synthetic
  media keys stay doc_id % 60, so the SAME 60 images recur and each
  duplicate group grows linearly — the realistic dedup regime (more
  corpus, same content universe). Per-doc keeper output must grow
  exactly linearly.
- events: replica r shifts user_id by r*1_000_000 and event_id by
  r*100_000_000 — user populations are disjoint, so funnel stage
  counts and attribution channels scale linearly while every window
  partition stays its original size.

Usage: python tools/scaling_round5.py [workdir]
Prints one JSON line {tier: {scale: {"wall_s", "rows", "shuffle_mb"}}}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lambda_refarch_mapreduce_spark import get_spark, load_table  # noqa: E402
from lambda_refarch_mapreduce_spark.metrics import MeasuredRun  # noqa: E402
from lambda_refarch_mapreduce_spark.operators import analytics  # noqa: E402
from lambda_refarch_mapreduce_spark.plans import catalog_llm  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = (1, 10, 100)


def build_documents(spark, out: str, replicas: int):
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        base = load_table(spark, SF_DIR, "documents").select("doc_id")
        reps = [
            base.select((F.col("doc_id") + r * 1_000_000).alias("doc_id"))
            for r in range(replicas)
        ]
        big = reps[0]
        for rep in reps[1:]:
            big = big.unionByName(rep)
        big.repartition(32).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def build_events(spark, out: str, replicas: int):
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        base = load_table(spark, SF_DIR, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        reps = [
            base.select(
                (F.col("event_id") + r * 100_000_000).alias("event_id"),
                "ts",
                (F.col("user_id") + r * 1_000_000).alias("user_id"),
                "event_type",
                "value",
            )
            for r in range(replicas)
        ]
        big = reps[0]
        for rep in reps[1:]:
            big = big.unionByName(rep)
        big.repartition(32).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def ahash_dedup(docs):
    from pyspark.sql.window import Window

    from lambda_refarch_mapreduce_spark.operators import multimodal

    key = (F.col("doc_id") % catalog_llm.AHASH_IMAGE_KEYS).cast("string")
    raster = F.concat(
        *[F.unhex(F.md5(F.concat(key, F.lit(f":{k}")))) for k in range(12)]
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
    from lambda_refarch_mapreduce_spark.operators import multimodal

    sid = (F.col("doc_id") % 1_000_000).cast("string")
    raster = F.concat(
        *[F.unhex(F.md5(F.concat(sid, F.lit(f":w{k}")))) for k in range(16)]
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.lit(catalog_llm._WAV_HEADER_128), raster).alias("content"),
    )
    return multimodal.audio_activity_windows(
        media, catalog_llm.VAD_WINDOW, catalog_llm.VAD_ENERGY_THRESHOLD
    )


def scene_report(docs):
    from lambda_refarch_mapreduce_spark.operators import multimodal

    sid = (F.col("doc_id") % 1_000_000).cast("string")
    frames = [
        F.unhex(
            F.substring(F.md5(F.concat(sid, F.lit(f":s{k // 2}"))), 1, 24)
        )
        for k in range(8)
    ]
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.lit(catalog_llm._RAWV_SCENES_HEADER), *frames).alias(
            "content"
        ),
    )
    return multimodal.video_scene_cuts(
        media, catalog_llm.SCENE_DIFF_THRESHOLD
    )


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_round5"
    spark = get_spark(
        "scaling-round5", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, dict[str, float]]] = {
        "image_ahash_dedup": {},
        "audio_vad": {},
        "video_scenes": {},
        "funnel": {},
        "attribution": {},
    }

    def run(tier: str, scale: int, make):
        with MeasuredRun(spark) as m:
            n = make().count()
        row = {"wall_s": round(m.stats.wall_secs, 2), "rows": n}
        if m.stats.bytes_measured:
            row["shuffle_mb"] = round(m.stats.shuffle_bytes / 1e6, 1)
        out[tier][f"{scale}x"] = row
        print(f"  {tier} {scale}x: {row}", file=sys.stderr)

    for scale in SCALES:
        docs = build_documents(
            spark, os.path.join(workdir, f"docs_{scale}x"), scale
        )
        run("image_ahash_dedup", scale, lambda: ahash_dedup(docs))
        run("audio_vad", scale, lambda: vad_report(docs))
        run("video_scenes", scale, lambda: scene_report(docs))

    for scale in SCALES:
        ev = build_events(
            spark, os.path.join(workdir, f"events_{scale}x"), scale
        )
        run(
            "funnel",
            scale,
            lambda: analytics.funnel(ev, ["view", "click", "purchase"]),
        )
        run("attribution", scale, lambda: analytics.last_touch_attribution(ev))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
