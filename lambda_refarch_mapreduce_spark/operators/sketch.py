"""Mergeable frequency/membership sketches: count-min and Bloom.

Count-min: heavy-hitter counts in O(d*w) space.

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


# ---------------------------------------------------------------------------
# Bloom filter: mergeable set-membership in n_bits of space, NO false
# negatives (Bloom 1970). The shuffle-elimination sketch: a build-side
# key set too large to ship as an IN-list compresses into a bit array
# small enough to BROADCAST AS A PLAN LITERAL, so the probe side
# prefilters ROW-LOCALLY inside the scan — no exchange touches the
# probe corpus until the (much smaller) candidate set reaches the
# exact join. False positives only cost wasted candidates; the exact
# join downstream removes them, so results are always exact.
#
# Hashing reuses the count-min scheme (seeded md5, engine-portable),
# so a DuckDB oracle replays the whole filter in SQL: same set bits,
# same candidate set, bit for bit. Merge = bitwise OR of the word
# arrays == union of the set-bit frames (groupBy pos), so per-source /
# per-day filters compose like the count-min cells do.


def _bit_pos(key, seed, n_bits: int):
    """Bit index in [0, n_bits) for hash row ``seed`` — DuckDB twin:
    ('0x' || substr(md5('bloom' || seed || ':' || key), 1, 8))::BIGINT
    % n_bits."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("bloom"),
                    seed.cast("string"),
                    F.lit(":"),
                    key.cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(n_bits)).cast("long")


def bloom_bits(
    df: DataFrame, key_col: str, n_bits: int = 1 << 13, k: int = 2
) -> DataFrame:
    """Build the filter as its set-bit frame ``(pos)``: DISTINCT bit
    positions over k hashes of each distinct key — at most
    min(k*|keys|, n_bits) rows. Keys dedupe BEFORE the k-way explode,
    so the fan-out runs over the key alphabet, not the rows; two
    filters merge by union + distinct on this frame (== bitwise OR)."""
    keys = df.select(F.col(key_col).alias("__key")).distinct()
    seeds = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("seed")
    return (
        keys.select("__key", seeds)
        .select(_bit_pos(F.col("__key"), F.col("seed"), n_bits).alias("pos"))
        .distinct()
    )


def bloom_words(bits: DataFrame, n_bits: int) -> list[int]:
    """Pack the set-bit frame into ``n_bits / 64`` int64 words (the
    broadcastable literal form). The collect is the point: the whole
    filter is n_bits / 8 BYTES of metadata — 1 MiB covers 8M bits —
    which is what lets the probe side test membership row-locally
    inside its scan instead of joining. shiftleft wraps at bit 63
    into the sign bit, which is fine: words are opaque bit patterns,
    read back with shiftrightunsigned."""
    n_words = (n_bits + 63) // 64
    # call_function: the shift amount is a COLUMN here, and the typed
    # F.shiftleft wrapper only accepts a Python int for numBits
    rows = (
        bits.groupBy((F.col("pos") / 64).cast("long").alias("w"))
        .agg(
            F.bit_or(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    F.pmod(F.col("pos"), F.lit(64)).cast("int"),
                )
            ).alias("bits")
        )
        .collect()
    )
    words = [0] * n_words
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def bloom_might_contain(key, words: list[int], n_bits: int, k: int):
    """Row-local membership predicate over the literal word array:
    AND over the k hash positions of (word >> bit) & 1. Never false
    for a key that was inserted (no false negatives); true for a
    non-member with probability ~ (1 - e^{-k n / n_bits})^k."""
    # one array<long> Literal instead of len(words) F.lit().cast()
    # calls — identical folded plan, O(words) fewer py4j round-trips
    arr = F.lit([int(w) for w in words]).cast("array<long>")
    checks = []
    for i in range(k):
        pos = _bit_pos(key, F.lit(i), n_bits)
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        bit = F.pmod(pos, F.lit(64)).cast("int")
        # call_function: the shift amount is a COLUMN (the typed
        # F.shiftrightunsigned wrapper only takes a Python int)
        checks.append(
            F.call_function("shiftrightunsigned", word, bit).bitwiseAND(
                F.lit(1).cast("long")
            )
            == 1
        )
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out
