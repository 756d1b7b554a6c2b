"""Generate the sf1 SPOT tier (VERDICT r12 next-round #6): a 10x tile
of /root/testdata/sf0.1 for one-off oracle checks of the
scale-sensitive entry families — the two-phase rank/prefix consumers
(whose only historical wrong answer appeared one tier up), the banded
dedup tiers, and the ANN recall entries.

Replication preserves relational structure so every catalog entry
still computes something meaningful:
- region/nation copy verbatim (dimension FK targets — nationkeys must
  not shift);
- customer/orders/lineitem/part/supplier shift their join keys by
  CONSISTENT per-replica offsets, so FK joins land within a replica;
- events shift event_id/user_id and perturb value by +r*0.07 (a
  distinct cent per replica), so the distinct-value alphabet the
  range-partitioned rank kernels sample over grows ~10x — the axis
  the r12 prefix_sums bug lived on;
- documents shift doc_id and salt every token with "r{r}" (the
  scaling-harness scheme: within-replica near-dup structure preserved,
  no cross-replica LSH collisions);
- embeddings shift vec_id, vectors unchanged (quantizer geometry
  fixed, corpus 10x).

Correctness of the gate does NOT depend on these semantics — Spark
and DuckDB read the SAME files — but realistic structure keeps the
entries exercising their intended plan shapes at the bigger size.

Usage: python tools/make_sf1.py [out_dir]   (default /tmp/spark_graft_sf1)
Then:  python tools/check_oracle.py <out_dir> <spot entries...>
Writes each table as one parquet FILE tree per table name, matching
the sf-dir layout check_oracle expects (<dir>/<table>.parquet).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 10


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    from lambda_refarch_mapreduce_spark import get_spark, load_table

    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")

    def shifts(name, df, r):
        c = F.col
        if name == "customer":
            return df.withColumn("c_custkey", c("c_custkey") + r * 10_000_000)
        if name == "orders":
            return df.withColumn(
                "o_orderkey", c("o_orderkey") + r * 100_000_000
            ).withColumn("o_custkey", c("o_custkey") + r * 10_000_000)
        if name == "lineitem":
            return (
                df.withColumn(
                    "l_orderkey", c("l_orderkey") + r * 100_000_000
                )
                .withColumn("l_partkey", c("l_partkey") + r * 10_000_000)
                .withColumn("l_suppkey", c("l_suppkey") + r * 1_000_000)
            )
        if name == "part":
            return df.withColumn("p_partkey", c("p_partkey") + r * 10_000_000)
        if name == "supplier":
            return df.withColumn("s_suppkey", c("s_suppkey") + r * 1_000_000)
        if name == "events":
            return (
                df.withColumn(
                    "event_id", c("event_id") + r * 1_000_000_000
                )
                .withColumn("user_id", c("user_id") + r * 10_000_000)
                .withColumn("value", c("value") + r * 0.07)
            )
        if name == "documents":
            return df.withColumn(
                "doc_id", c("doc_id") + r * 1_000_000
            ).withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"r{r}$1")
            )
        if name == "embeddings":
            return df.withColumn("vec_id", c("vec_id") + r * 10_000_000)
        return df  # region, nation: verbatim

    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(os.path.join(dst, "_SUCCESS")):
            print(f"{name}: exists")
            continue
        base = load_table(spark, SRC, name)
        if name in ("region", "nation"):
            big = base
        else:
            big = shifts(name, base, 0)
            for r in range(1, REPLICAS):
                big = big.unionByName(shifts(name, base, r))
        big.repartition(32).write.mode("overwrite").parquet(dst)
        print(f"{name}: {spark.read.parquet(dst).count()} rows")


if __name__ == "__main__":
    main()
