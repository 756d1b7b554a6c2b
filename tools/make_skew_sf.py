"""Generate the SKEW tier: /root/testdata/sf0.1 with the three hot-key
pathologies a 100 TB corpus is guaranteed to contain and the uniform
sf tiers never exercise:

- documents gains a MEGA EXACT-DUPLICATE CLUSTER (1,000 verbatim
  copies of one boilerplate page, fresh doc_ids, same source/lang) —
  the classic web-corpus shape (cookie banners, license pages). Exact
  duplicates collide in EVERY LSH band at ANY banding parameter, so
  this is the hazard corpus-size-aware banding (r13's auto_planes
  fix) cannot touch: candidate pairs grow C(m,2) in the CLUSTER size.
- events gains a HOT USER holding ~1/3 of all rows (every other base
  event replicated onto one existing user_id with fresh event_ids) —
  the per-user window / applyInPandas-group / shuffle-key hazard.
- lineitem gains a HOT SUPPLIER+PART (half the base rows replicated
  onto one existing (l_suppkey, l_partkey), l_linenumber offset to
  keep the (orderkey, linenumber) key unique) and a MEGA BASKET (one
  existing order extended to ~3,000 distinct parts) — the skewed
  join-key and basket-fan-out hazards.

Everything else (region nation customer supplier part orders
embeddings) copies verbatim so FK structure holds: hot keys point at
EXISTING dimension rows. The oracle gate does not depend on any of
this being "realistic" — Spark and DuckDB read the same files — the
point is forcing the skew-sensitive plan shapes.

Usage: python tools/make_skew_sf.py [out_dir]  (default /tmp/spark_graft_skew)
Then:  python tools/check_oracle.py --json SKEW_r13.json <out_dir> <entries...>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MEGA_CLUSTER = 1000  # exact-duplicate copies of the boilerplate doc
MEGA_BASKET = 3000  # distinct parts appended to the hot order


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_skew"
    from lambda_refarch_mapreduce_spark import get_spark, load_table

    spark = get_spark("make-skew-sf")
    spark.sparkContext.setLogLevel("ERROR")

    def skewed(name: str):
        base = load_table(spark, SRC, name)
        if name == "documents":
            # 1,000 verbatim copies of the min-doc_id page. Fresh ids
            # far above the base range; source/lang ride along, so the
            # cluster is also the hot domain group.
            # shortest page above a shingle-bearing floor — real
            # boilerplate is short, and it keeps the QUADRATIC pair
            # OUTPUT (C(m,2) rows is the correct answer for an exact
            # cluster) cheap to verify while still forcing the
            # candidate-explosion plan shape
            seed = (
                base.filter(F.col("n_chars") >= 80)
                .orderBy("n_chars", "doc_id")
                .limit(1)
                .select("text", "lang", "source", "n_chars")
            )
            copies = (
                spark.range(MEGA_CLUSTER)
                .select((F.col("id") + 9_000_000).alias("doc_id"))
                .crossJoin(F.broadcast(seed))
                .select("doc_id", "text", "lang", "source", "n_chars")
            )
            return base.unionByName(copies)
        if name == "events":
            hot_user = base.agg(F.min("user_id")).collect()[0][0]
            hot = (
                base.filter(F.col("event_id") % 2 == 0)
                .withColumn("event_id", F.col("event_id") + 9_000_000_000)
                .withColumn("user_id", F.lit(hot_user).cast("long"))
            )
            return base.unionByName(hot)
        if name == "lineitem":
            keys = base.agg(
                F.min("l_suppkey").alias("s"),
                F.min("l_partkey").alias("p"),
                F.min("l_orderkey").alias("o"),
            ).collect()[0]
            hot = (
                base.filter(F.col("l_orderkey") % 2 == 0)
                .withColumn("l_suppkey", F.lit(keys["s"]).cast("long"))
                .withColumn("l_partkey", F.lit(keys["p"]).cast("long"))
                .withColumn("l_linenumber", F.col("l_linenumber") + 100)
            )
            # the mega basket: one existing order, ~3,000 distinct parts
            proto = (
                base.filter(F.col("l_orderkey") == keys["o"])
                .orderBy("l_linenumber")
                .limit(1)
                .drop("l_partkey", "l_linenumber")
            )
            parts = (
                base.select("l_partkey")
                .distinct()
                .orderBy("l_partkey")
                .limit(MEGA_BASKET)
                .withColumn(
                    "l_linenumber",
                    (1000 + F.row_number().over(Window.orderBy("l_partkey"))).cast(
                        "int"
                    ),
                )
            )
            basket = F.broadcast(proto).crossJoin(parts).select(*base.columns)
            return base.unionByName(hot).unionByName(basket)
        return base  # everything else verbatim

    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(os.path.join(dst, "_SUCCESS")):
            print(f"{name}: exists")
            continue
        skewed(name).repartition(32).write.mode("overwrite").parquet(dst)
        print(f"{name}: {spark.read.parquet(dst).count()} rows")


if __name__ == "__main__":
    main()
