"""Scaling check for the round-3 analytics tier: Ed-Join fuzzy join
and PageRank at 1x / 10x / 100x.

Replica construction preserves within-replica structure and forbids
cross-replica matches:

- customers: replica r gets custkey + r*10_000_000 and a 4-char tag
  "d1d1d2d2" (digits duplicated) prepended to the name — any two
  distinct tags differ in >= 2 chars, so with k=1 no cross-replica
  pair can verify, and the true pair count scales exactly linearly.
- documents: replica r prefixes every token with "r{r}" (same scheme
  as tools/scaling_bench.py) — the word graph becomes r disjoint
  copies, so PageRank's node/edge workload scales linearly while the
  corpus-scan side scales with bytes.

Usage: python tools/scaling_analytics.py [workdir]
Prints one JSON line {tier: {scale: {"wall_s": ..., "rows": ...}}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lambda_refarch_mapreduce_spark import get_spark, load_table  # noqa: E402
from lambda_refarch_mapreduce_spark.metrics import MeasuredRun  # noqa: E402
from lambda_refarch_mapreduce_spark.operators import graph, linkage  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = (1, 10, 100)


def _tag(r: int) -> str:
    return f"{r // 10}{r // 10}{r % 10}{r % 10}"


def build_customers(spark, out: str, replicas: int):
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        base = load_table(spark, SF_DIR, "customer")
        reps = [
            base.select(
                (F.col("c_custkey") + r * 10_000_000).alias("c_custkey"),
                F.concat(F.lit(_tag(r)), F.col("c_name")).alias("c_name"),
                "c_nationkey",
            )
            for r in range(replicas)
        ]
        big = reps[0]
        for rep in reps[1:]:
            big = big.unionByName(rep)
        big.repartition(32).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def build_documents(spark, out: str, replicas: int):
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        base = load_table(spark, SF_DIR, "documents")
        reps = [
            base.select(
                (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"r{r}$1").alias("text"),
            )
            for r in range(replicas)
        ]
        big = reps[0]
        for rep in reps[1:]:
            big = big.unionByName(rep)
        big.repartition(32).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_analytics"
    # UI on: MeasuredRun reads per-stage shuffle bytes over REST
    spark = get_spark(
        "scaling-analytics", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, dict[str, float]]] = {
        "fuzzy_join": {},
        "pagerank": {},
        "triangle_stats": {},
        "label_propagation": {},
    }

    def run(tier: str, scale: int, make):
        with MeasuredRun(spark) as m:
            n = make().count()
        row = {"wall_s": round(m.stats.wall_secs, 2), "rows": n}
        if m.stats.bytes_measured:
            row["shuffle_mb"] = round(m.stats.shuffle_bytes / 1e6, 1)
        out[tier][f"{scale}x"] = row

    for scale in SCALES:
        cust = build_customers(
            spark, os.path.join(workdir, f"cust_{scale}x"), scale
        )
        run(
            "fuzzy_join",
            scale,
            lambda: linkage.fuzzy_self_join(
                cust, "c_custkey", "c_name", k=1, block_col="c_nationkey"
            ),
        )

    for scale in SCALES:
        docs = build_documents(
            spark, os.path.join(workdir, f"docs_{scale}x"), scale
        )
        run(
            "pagerank",
            scale,
            lambda: graph.pagerank(
                graph.token_bigram_edges(docs, "text"), n_iter=3
            ),
        )
        run(
            "triangle_stats",
            scale,
            lambda: graph.triangle_stats(
                graph.token_bigram_edges(docs, "text")
            ),
        )
        run(
            "label_propagation",
            scale,
            lambda: graph.label_propagation(
                graph.token_bigram_edges(docs, "text"), n_iter=3
            ),
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
