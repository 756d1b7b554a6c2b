"""Record linkage: edit-distance similarity self-join without all-pairs.

Candidate generation uses the segment filter (PassJoin, Li et al.
VLDB 2011): split every string s into ``k+1`` contiguous segments. If
levenshtein(s, t) <= k, some segment of s is untouched by every edit,
so it occurs in t EXACTLY, at a start position shifted by at most k
(each edit shifts later positions by at most 1). Indexing the segments
of every string and probing every (candidate-length, segment-index,
shifted-substring) key of every string is therefore a LOSSLESS filter:
the final ``levenshtein(a, b) <= k`` verify defines the result; the
filter only prunes, never drops a true pair.

Scale posture: segment/probe keys are generated row-locally (k+1 index
keys and (2k+1)²·(k+1) probe keys per row — 2 and 18 at k=1), candidate
pairs come from a hash equi-join on short substring keys (never a theta
join), and the exact O(len²) Levenshtein runs only on deduplicated
candidate pairs. At 100 TB the shuffle carries (key, id) pairs — full
strings join back only for the bounded candidate set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seg_bounds(length: Column, i: int, n: int) -> tuple[Column, Column]:
    """Start (1-based) and length of segment ``i`` of ``n`` for a string
    of ``length`` chars: the even partition floor(i*L/n) used by both
    sides and reproduced verbatim in the DuckDB oracles."""
    start = F.floor(length * i / n)
    seg_len = F.floor(length * (i + 1) / n) - start
    return (start + 1).cast("int"), seg_len.cast("int")


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 1,
    block_col: str | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with ``levenshtein(text_a, text_b) <= k``
    (optionally restricted to equal ``block_col``), via segment-filter
    blocking rather than an all-pairs join.

    Index side: the k+1 segments of each string under its own length's
    partition arithmetic. Probe side: for each candidate partner length
    L' in [L-k, L+k], each segment index, and each shift in [-k, k], the
    substring of this string at the partner's segment position — so a
    probe key matches an index key exactly when the partner contains
    that segment unshifted-beyond-k. A pair can collide on several keys;
    candidates are deduplicated on (id_a, id_b) BEFORE the Levenshtein
    verify, which runs once per candidate pair.

    Returns (id_a, id_b, dist)."""
    n = k + 1
    blk = [F.col(block_col).alias("_blk")] if block_col else []
    base = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"), *blk
    )
    length = F.length("_txt")

    idx_keys = []
    for i in range(n):
        start, seg_len = _seg_bounds(length, i, n)
        idx_keys.append(
            F.struct(
                length.alias("klen"),
                F.lit(i).alias("kseg"),
                F.substring(F.col("_txt"), start, seg_len).alias("ktxt"),
            )
        )
    index = base.select(
        F.col("_id").alias("id_i"),
        *[F.col("_blk").alias("_blk_i")] if block_col else [],
        F.explode(F.array(*idx_keys)).alias("key"),
    ).filter(F.col("key.ktxt") != "")

    probe_keys = []
    for dlen in range(-k, k + 1):  # partner's length
        plen = length + dlen
        for i in range(n):
            start, seg_len = _seg_bounds(plen, i, n)
            for shift in range(-k, k + 1):
                probe_keys.append(
                    F.struct(
                        plen.alias("klen"),
                        F.lit(i).alias("kseg"),
                        F.substring(
                            F.col("_txt"), start + shift, seg_len
                        ).alias("ktxt"),
                    )
                )
    probe = base.select(
        F.col("_id").alias("id_p"),
        *[F.col("_blk").alias("_blk_p")] if block_col else [],
        F.explode(F.array_distinct(F.array(*probe_keys))).alias("key"),
    ).filter(F.col("key.ktxt") != "")

    on = [index.key == probe.key, F.col("id_i") != F.col("id_p")]
    if block_col:
        on.append(F.col("_blk_i") == F.col("_blk_p"))
    cand = (
        index.join(probe, on)
        .select(
            F.least("id_i", "id_p").alias("id_a"),
            F.greatest("id_i", "id_p").alias("id_b"),
        )
        .distinct()
    )
    ta = base.select(F.col("_id").alias("id_a"), F.col("_txt").alias("_txt_a"))
    tb = base.select(F.col("_id").alias("id_b"), F.col("_txt").alias("_txt_b"))
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .filter(F.abs(F.length("_txt_a") - F.length("_txt_b")) <= k)
        .withColumn("dist", F.levenshtein("_txt_a", "_txt_b"))
        .filter(F.col("dist") <= k)
        .select("id_a", "id_b", "dist")
    )
