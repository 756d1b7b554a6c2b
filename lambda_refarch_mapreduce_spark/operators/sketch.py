"""Count-min sketch: mergeable heavy-hitter counts in O(d*w) space.

The frequency-estimation sibling of the catalog's KMV (set overlap)
and HLL (distinct count) sketches: a d x w grid of counters where
every item adds its weight to one bucket per row (d independent
hashes), and a point estimate reads the MINIMUM of its d buckets
(Cormode & Muthukrishnan 2005). Estimates NEVER undercount
(one-sided error), and overcount by at most ~2N/w with probability
1 - 2^-d per query.

Spark-first shape: items pre-aggregate to per-item exact counts (one
map-side-combinable exchange — the only corpus-sized stage), the d-way
hash explode runs over the ITEM alphabet (not rows), and the sketch
itself is d*w integer cells — merge two sketches by adding cells,
which is exactly a groupBy(d, bucket).sum, so per-partition /
per-day / per-source sketches union for free. Point lookups join a
bounded probe set against the d*w-cell frame (broadcast). Hashing is
seeded md5 (deterministic, engine-portable), so a DuckDB oracle can
REPLAY the whole sketch in SQL — the same full-replay gate the KMV
entry carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(item, d, width: int):
    """Bucket index in [0, width) for hash row ``d``: the first 8 hex
    chars of md5('cms<d>:<item>') mod width — DuckDB twin:
    ('0x' || substr(md5('cms' || d || ':' || item), 1, 8))::BIGINT
    % width."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("cms"),
                    d.cast("string"),
                    F.lit(":"),
                    item.cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(width)).cast("long")


def countmin_build(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the sketch over one row per occurrence of ``item_col``:
    returns the (d, bucket, c) cell frame, d in [0, depth), c exact
    int64. Rows collapse to per-item counts BEFORE the depth-way
    explode, so the explode fans out the item alphabet only."""
    per_item = df.groupBy(F.col(item_col).alias("__item")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    seeds = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d")
    exploded = per_item.select("__item", "__n", seeds)
    return (
        exploded.withColumn(
            "bucket", _bucket(F.col("__item"), F.col("d"), width)
        )
        .groupBy("d", "bucket")
        .agg(F.sum("__n").alias("c"))
    )


def countmin_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate each probe item against the cell frame: explode
    the probes by depth, join (d, bucket) — the sketch side is d*w
    cells, broadcast — and take min(c) per item (an absent cell means
    a zero bucket, but a built sketch has every bucket its items
    touch; probes that hash to untouched cells estimate 0). Returns
    (item, est_n)."""
    p = probes.select(F.col(item_col).alias("__item")).distinct()
    seeds = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d")
    keyed = p.select("__item", seeds).withColumn(
        "bucket", _bucket(F.col("__item"), F.col("d"), width)
    )
    joined = keyed.join(F.broadcast(sketch), ["d", "bucket"], "left").select(
        "__item", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    return joined.groupBy("__item").agg(F.min("c").alias("est_n")).select(
        F.col("__item").alias(item_col), "est_n"
    )
