"""Scaling check for the ANN index lifecycle (streaming/ann.py):
retrain_index (train + full re-encode + atomic swap) and
search_current at 1x / 10x / 100x corpus replicas.

Replica construction: replica r offsets vec_id by r*10_000_000 and
keeps the vector values (quantizer geometry unchanged, so train cost
is corpus-scan-bound and encode cost is exactly per-row — the
workload scales linearly by construction; what's measured is whether
the IMPLEMENTATION does).

Usage: python tools/scaling_ann.py [workdir]
Prints one JSON line {scale: {"n_vectors": ..., "retrain_wall_s": ...,
"search_wall_s": ...}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lambda_refarch_mapreduce_spark import get_spark, load_table  # noqa: E402
from lambda_refarch_mapreduce_spark.streaming import ann  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = (1, 10, 100)


def build_vectors(spark, out: str, replicas: int):
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        base = load_table(spark, SF_DIR, "embeddings")
        reps = [
            base.select(
                (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
                "embedding",
            )
            for r in range(replicas)
        ]
        big = reps[0]
        for rep in reps[1:]:
            big = big.unionByName(rep)
        big.repartition(32).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ann_scale"
    spark = get_spark("scaling-ann")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    queries = load_table(spark, SF_DIR, "embeddings").filter(
        F.col("vec_id") < 20
    )
    for scale in SCALES:
        vec_path = os.path.join(workdir, f"vecs_x{scale}")
        vecs = build_vectors(spark, vec_path, scale)
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
        search_s = round(time.monotonic() - t0, 3)
        out[f"x{scale}"] = {
            "n_vectors": n,
            "retrain_wall_s": retrain_s,
            "search_wall_s": search_s,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
