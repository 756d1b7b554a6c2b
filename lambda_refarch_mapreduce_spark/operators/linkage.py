"""Record linkage: edit-distance similarity self-join without all-pairs.

Candidate generation is Ed-Join-style prefix filtering over positional
q-grams (Xiao, Wang & Lin, VLDB 2008; prefix principle from
Chaudhuri et al. / ppjoin):

- one edit destroys at most ``q`` of a string's ``|s|-q+1`` positional
  q-grams, so ``ed(s,t) <= k`` implies the two multisets of gram TEXTS
  overlap in at least ``max(|G(s)|,|G(t)|) - k*q`` instances;
- encode each multiset as (gram, occurrence#) elements under one GLOBAL
  canonical order — ascending corpus frequency, then gram, then
  occurrence — and the prefix lemma guarantees any such pair shares an
  element within the first ``k*q + 1`` elements of BOTH prefixes;
- therefore an equi-join on the (gram, occ) prefix elements is a
  LOSSLESS candidate filter, and because the order puts the RAREST
  grams in the prefix it is skew-adaptive: a corpus where every string
  shares a long literal prefix ("Customer#…") blocks on the rare
  discriminating grams, not the universal ones. (The aligned-segment
  PassJoin filter degenerates to all-pairs on exactly that data —
  measured 280× more candidates on the sf0.1 customer table.)

Strings too short for the count bound to bite (fewer than ``k*q + 1``
grams) fall into a marker bucket joined only against length-compatible
strings — a bounded set of trivially short strings, never the corpus.

The final ``levenshtein(a, b) <= k`` verify defines the result; filters
only prune. Losslessness is pinned by a brute-force Hypothesis property
test (tests/test_analytics.py).

Scale posture: gram explosion is row-local; the frequency table is one
map-side-combined aggregation; prefix selection is a per-string window
(hash shuffle on id); candidates come from an equi-join on rare-gram
keys; the O(len²) Levenshtein runs once per deduplicated candidate
pair, with full strings joined back only for that bounded set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 1,
    q: int = 2,
    block_col: str | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with ``levenshtein(text_a, text_b) <= k``
    (optionally restricted to equal ``block_col``), via frequency-
    ordered prefix filtering on positional q-grams.

    Returns (id_a, id_b, dist)."""
    prefix_len = k * q + 1
    # strings with |G| = len-q+1 <= k*q grams can lose ALL grams to k
    # edits — the prefix argument gives nothing, so they pair through
    # the marker bucket instead: idx-side bound len <= q*(k+1)-1, probe
    # side widened by k (the partner of a short string is length-bounded
    # by |len diff| <= k).
    short_idx_max = q * (k + 1) - 1
    blk = [F.col(block_col).alias("_blk")] if block_col else []
    blk_names = ["_blk"] if block_col else []
    base = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"), *blk
    )
    length = F.length("_txt")

    n_grams = length - (q - 1)
    gram_structs = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.struct(
                F.substring(F.col("_txt"), i, q).alias("gram"), i.alias("pos")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<gram:string,pos:int>>"))
    grams = (
        base.select("_id", *blk_names, F.explode(gram_structs).alias("g"))
        .select(
            "_id",
            *blk_names,
            F.col("g.gram").alias("gram"),
            F.col("g.pos").alias("pos"),
        )
        .withColumn(
            "occ",
            F.row_number().over(
                Window.partitionBy("_id", "gram").orderBy("pos")
            ),
        )
    )
    freq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("f"))
    ranked = grams.join(freq, "gram").withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("_id").orderBy("f", "gram", "occ")
        ),
    )
    pfx = ranked.filter(F.col("rk") <= prefix_len).select(
        "_id", *blk_names, "gram", "occ"
    )

    # distinct aliases on BOTH sides: self-join columns sharing lineage
    # would resolve `a.gram == b.gram` to a trivially-true predicate
    # (and silently degrade the join to blocked all-pairs)
    a = pfx.select(
        F.col("_id").alias("id_i"),
        *[F.col(c).alias(c + "_i") for c in blk_names],
        F.col("gram").alias("gram_i"),
        F.col("occ").alias("occ_i"),
    )
    b = pfx.select(
        F.col("_id").alias("id_p"),
        *[F.col(c).alias(c + "_p") for c in blk_names],
        F.col("gram").alias("gram_p"),
        F.col("occ").alias("occ_p"),
    )
    on = [
        F.col("gram_i") == F.col("gram_p"),
        F.col("occ_i") == F.col("occ_p"),
        F.col("id_i") < F.col("id_p"),
    ]
    if block_col:
        on.append(F.col("_blk_i") == F.col("_blk_p"))
    cand = a.join(b, on).select(
        F.col("id_i").alias("id_a"), F.col("id_p").alias("id_b")
    )

    # marker bucket: short × length-compatible-short
    si = base.filter(length <= short_idx_max).select(
        F.col("_id").alias("id_i"),
        *[F.col(c).alias(c + "_i") for c in blk_names],
    )
    sp = base.filter(length <= short_idx_max + k).select(
        F.col("_id").alias("id_p"),
        *[F.col(c).alias(c + "_p") for c in blk_names],
    )
    short_on = [F.col("id_i") != F.col("id_p")]
    if block_col:
        short_on.append(F.col("_blk_i") == F.col("_blk_p"))
    cand_short = si.join(sp, short_on).select(
        F.least("id_i", "id_p").alias("id_a"),
        F.greatest("id_i", "id_p").alias("id_b"),
    )

    pairs = cand.unionByName(cand_short).distinct()
    ta = base.select(F.col("_id").alias("id_a"), F.col("_txt").alias("_txt_a"))
    tb = base.select(F.col("_id").alias("id_b"), F.col("_txt").alias("_txt_b"))
    return (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .filter(F.abs(F.length("_txt_a") - F.length("_txt_b")) <= k)
        .withColumn("dist", F.levenshtein("_txt_a", "_txt_b"))
        .filter(F.col("dist") <= k)
        .select("id_a", "id_b", "dist")
    )
