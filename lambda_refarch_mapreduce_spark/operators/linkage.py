"""Record linkage: edit-distance similarity self-join without all-pairs.

Two lossless candidate filters, auto-selected by ``k`` (round-4
measurement, SCALING.md: at 1.5M serial-numbered names the q-gram
alphabet saturates — ~119 distinct 2-grams — and EVERY gram-based
prefix filter emits 1.4e9+ candidates at any q; deletion signatures
key on whole perturbed strings and stay output-sized):

- ``deletion`` (k <= 2, default): SymDelete/FastSS deletion-
  neighborhood digests — a pair within k edits provably shares a
  variant reachable by <= k deletions from each side, so an equi-join
  on variant md5s is exact-recall; O(len^k) row-local variants.
- ``edjoin`` (any k): Ed-Join-style prefix filtering over positional
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


def _deletion_digests(txt, k: int):
    """md5 digests of every variant of ``txt`` reachable by deleting
    up to ``k`` characters (k in {1, 2}) — the SymDelete / FastSS
    signature family (public: Bocek et al. 2007 "Fast Similarity
    Search in Large Dictionaries"; SymSpell). Soundness of the filter:
    an edit script of length <= k aligns A and B so that deleting the
    substituted+deleted positions from A (<= k of them) and the
    substituted+inserted positions from B (<= k) yields the SAME
    string — so every qualifying pair shares a variant digest.
    Runtime array HOFs over sequence() — per-row O(len^k) work and
    bytes, no plan growth in len."""
    length = F.length(txt)

    def drop1(i):
        return F.concat(
            F.substring(txt, 1, i - 1),
            txt.substr(i + 1, F.greatest(length - i, F.lit(0))),
        )

    variants = F.concat(
        F.array(txt),
        F.transform(F.sequence(F.lit(1), F.greatest(length, F.lit(1))), drop1),
    )
    if k >= 2:

        def drop2(i):
            # delete j from (txt without i); j indexes the shortened
            # string, j >= i keeps each unordered pair once
            shorter = drop1(i)
            slen = F.length(shorter)
            return F.transform(
                F.sequence(F.lit(1), F.greatest(slen, F.lit(1))),
                lambda j: F.when(
                    j >= i,
                    F.concat(
                        F.substring(shorter, 1, j - 1),
                        shorter.substr(
                            j + 1, F.greatest(slen - j, F.lit(0))
                        ),
                    ),
                ),
            )

        pairs2 = F.filter(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(length, F.lit(1))), drop2
                )
            ),
            lambda v: v.isNotNull(),
        )
        variants = F.concat(variants, pairs2)
    return F.array_distinct(F.transform(variants, F.md5))


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 1,
    q: int = 2,
    block_col: str | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """All pairs (id_a < id_b) with ``levenshtein(text_a, text_b) <= k``
    (optionally restricted to equal ``block_col``).

    ``strategy``:
    - ``"deletion"``: deletion-neighborhood signatures
      (_deletion_digests) — each string emits O(len^k) variant digests
      and candidates are an equi-join on the digest. Exact recall for
      k <= 2; bucket sizes track true near-match clusters, NOT gram
      statistics, so selectivity survives low-entropy corpora
      (serial-numbered names) where any gram-based filter drowns —
      measured at 1.5M customers: gram-prefix candidates 1.4–4.7e9 at
      every q, deletion-signature candidates ~= the true pair count
      (SCALING.md round-4 addendum).
    - ``"edjoin"``: frequency-ordered prefix filtering on positional
      q-grams (module docstring) — the general-k path.
    - ``"auto"`` (default): deletion for k <= 2, Ed-Join beyond.

    Returns (id_a, id_b, dist)."""
    if strategy == "auto":
        strategy = "deletion" if k <= 2 else "edjoin"
    if strategy == "deletion":
        if k > 2:
            raise ValueError(
                "deletion strategy supports k <= 2 (variant count grows "
                f"O(len^k)); got k={k} — use strategy='edjoin'"
            )
        blk = [F.col(block_col).alias("_blk")] if block_col else []
        base = df.select(
            F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"), *blk
        )
        sigs = base.select(
            "_id",
            *(["_blk"] if block_col else []),
            F.explode(_deletion_digests(F.col("_txt"), k)).alias("sig"),
        )
        a = sigs.select(
            F.col("_id").alias("id_i"),
            *([F.col("_blk").alias("_blk_i")] if block_col else []),
            "sig",
        )
        b = sigs.select(
            F.col("_id").alias("id_p"),
            *([F.col("_blk").alias("_blk_p")] if block_col else []),
            F.col("sig").alias("sig_p"),
        )
        on = [F.col("sig") == F.col("sig_p"), F.col("id_i") < F.col("id_p")]
        if block_col:
            on.append(F.col("_blk_i") == F.col("_blk_p"))
        pairs = (
            a.join(b, on)
            .select(F.col("id_i").alias("id_a"), F.col("id_p").alias("id_b"))
            .distinct()
        )
        ta = base.select(F.col("_id").alias("id_a"), F.col("_txt").alias("_txt_a"))
        tb = base.select(F.col("_id").alias("id_b"), F.col("_txt").alias("_txt_b"))
        return (
            pairs.join(ta, "id_a")
            .join(tb, "id_b")
            .withColumn("dist", F.levenshtein("_txt_a", "_txt_b"))
            .filter(F.col("dist") <= k)
            .select("id_a", "id_b", "dist")
        )
    if strategy != "edjoin":
        raise ValueError(
            f"strategy must be 'auto', 'deletion' or 'edjoin', got {strategy!r}"
        )
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
