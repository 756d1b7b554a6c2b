"""Scaling check: do the dedup tiers stay ~linear when the corpus
grows 10x? Generates a salted 10x replica of sf0.1 documents (each
replica's tokens are prefixed with its replica id, so the within-
replica near-dup structure is preserved and replicas never collide in
LSH — workload scales linearly by construction), then times each tier
at 1x and 10x in one warmed JVM.

Usage: python tools/scaling_bench.py [workdir]
Prints one JSON line with timings and ratios.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lambda_refarch_mapreduce_spark import get_spark, load_table  # noqa: E402
from lambda_refarch_mapreduce_spark.operators import dedup  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 10


def build_10x(spark, out: str):
    base = load_table(spark, SF_DIR, "documents")
    reps = [
        base.select(
            (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"r{i}$1").alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for i in range(REPLICAS)
    ]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    big.repartition(32).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scaling"
    spark = get_spark("scaling-bench")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, SF_DIR, "documents")
    big = build_10x(spark, os.path.join(workdir, "docs_10x"))

    tiers = {
        "exact": lambda df: dedup.exact_duplicates(df, "doc_id", "text"),
        "minhash_lsh": lambda df: dedup.minhash_lsh_pairs(df, "doc_id", "text"),
        "simhash_pairs": lambda df: dedup.simhash_near_pairs(df, "doc_id", "text"),
        "jaccard_pairs": lambda df: dedup.ngram_jaccard_pairs(df, "doc_id", "text"),
    }

    # warm JIT/codegen on the small tier first; discard
    tiers["minhash_lsh"](base).write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, float]] = {}
    for label, frame in (("1x", base), ("10x", big)):
        r = {}
        for name, build in tiers.items():
            t0 = time.monotonic()
            build(frame).write.format("noop").mode("overwrite").save()
            r[name] = round(time.monotonic() - t0, 2)
        results[label] = r

    ratios = {
        k: round(results["10x"][k] / max(results["1x"][k], 0.01), 1)
        for k in tiers
    }
    print(
        json.dumps(
            {
                "metric": "dedup_scaling_10x",
                "n_docs": {"1x": base.count(), "10x": big.count()},
                "secs": results,
                "ratio_10x_over_1x": ratios,
            }
        )
    )


if __name__ == "__main__":
    main()
