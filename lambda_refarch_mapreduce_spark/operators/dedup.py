"""Deduplication operators for training-data pipelines.

Four tiers, all shuffle-bounded (no O(n^2) cross join at any point —
the 100TB requirement from SURVEY.md §7.4.5):

- exact:        hash-groupBy on content digest. One shuffle.
- n-gram Jaccard: shingle-inverted-index self-join. Shuffle on shingle;
                pairs only materialize for docs sharing a shingle.
- MinHash-LSH:  salted-hash signatures → banding → equi-join on band
                key. Candidate pairs bounded by band collisions.
- SimHash:      64-bit fingerprint, near-dups by hamming distance over
                band-partitioned candidates.

Hashing is deliberately *portable*: every hash is built from md5 (same
bytes in any engine), so the DuckDB oracle can reproduce signatures
bit-for-bit — the operators are correctness-checked end to end, not
just row-counted. (Spark: conv(substring(md5(x),1,15),16,10) == DuckDB:
('0x'||substr(md5(x),1,15))::BIGINT — verified identical.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lambda_refarch_mapreduce_spark.functions.scalar import tokenize, word_ngrams
from lambda_refarch_mapreduce_spark.partitioning import ensure_parallelism

# 60-bit portable hash: md5 → first 15 hex chars → bigint.
def _h(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def salted_hash(col: Column, seed: int) -> Column:
    """Family of independent portable hash functions h_seed(x)."""
    return _h(F.concat(F.lit(f"s{seed}:"), col))


def exact_duplicates(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Exact dedup groups: one row per distinct content with the
    canonical (min id) survivor and the duplicate count.

    groupBy on the md5 digest, not the content, so the shuffle carries
    32-byte keys instead of document bodies — at 100TB that is the
    difference between shuffling hashes and shuffling the corpus.
    """
    return (
        df.select(F.md5(F.col(content_col)).alias("content_md5"), F.col(id_col))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _exact_groups(df: DataFrame, id_col: str, content_col: str):
    """Duplicated-mass frames for the collapse/expand wrappers:
    ``(non_rep, multi)`` with non_rep = (__mid) — every doc that is
    NOT its exact-duplicate group's min-id representative — and
    multi = (__rep, __mid), one row per member (representative
    included) of every group with >= 2 copies. Both are EMPTY when
    the corpus has no exact duplicates.

    Why this exists: a mega exact-duplicate cluster (boilerplate —
    cookie banners, license pages — guaranteed in any web-scale
    corpus) collides in EVERY LSH band at ANY banding parameter, so
    candidate pairs grow C(m,2) in the CLUSTER size m; no
    corpus-size-aware banding can touch it. Collapsing to one
    representative per distinct content before the candidate join
    makes candidate volume a function of DISTINCT contents, and the
    post-verification expansion (below) regenerates the exact pair
    set — output-identical, so the operators' registered oracles
    stay valid unchanged.

    Why these two frames and not a corpus-wide (rep, member) map: the
    collapse must be ~free on the clean-corpus fast path. Everything
    downstream touches only the DUPLICATED MASS — the rep filter is a
    left-anti join against non_rep and the expansions are left joins
    against multi — so when duplicates are rare both sides broadcast
    and the only corpus-sized cost is the one narrow digest exchange
    here (16-byte binary md5 + id, ~24 B/row; map-side hashing of
    bodies is embarrassingly parallel). The first cut of this
    collapse shipped corpus-sized (rep, member) join frames and
    doubled the minhash bench key's shuffle bytes on a dup-free
    corpus; this shape reclaims that while keeping the skew-tier win.
    """
    dg = df.select(
        F.col(id_col).alias("__mid"),
        F.unhex(F.md5(F.col(content_col))).alias("__dg"),
    )
    # member ids ride the ONE digest exchange as per-group lists (same
    # ~24 B/row payload as the raw rows, order irrelevant — the rep is
    # a separate min), so multi/non_rep are projections OVER the
    # aggregate and every downstream reference hits ReusedExchange
    # instead of re-scanning the corpus and re-hashing bodies (the
    # dg ⋈ groups formulation broadcast the group table and re-ran the
    # document scan once per reference — measured +24 stages on the
    # minhash bench key)
    grouped = dg.groupBy("__dg").agg(
        F.min("__mid").alias("__rep"),
        F.collect_list("__mid").alias("__ids"),
    )
    multi = grouped.filter(F.size("__ids") >= 2).select(
        "__rep", F.explode("__ids").alias("__mid")
    )
    non_rep = multi.filter(F.col("__mid") != F.col("__rep")).select("__mid")
    return non_rep, multi


def _rep_only(frame: DataFrame, non_rep: DataFrame, key: str = "id") -> DataFrame:
    """Keep only representative docs' rows: left-anti join against the
    non-representative ids. non_rep is empty on a dup-free corpus, so
    AQE broadcasts it and the filter costs one codegen'd hash probe
    per row — never a corpus shuffle."""
    return frame.join(non_rep.select(F.col("__mid").alias(key)), key, "left_anti")


def _expand_pairs(
    rep_pairs: DataFrame, multi: DataFrame, payload_cols: list[str]
) -> DataFrame:
    """All-member expansion of representative-level pairs: every
    (id_a=rep_a, id_b=rep_b, *payload) row becomes m_a x m_b member
    pairs carrying the SAME payload (identical contents ⇒ identical
    similarity), ids re-canonicalized to id_a < id_b. LEFT joins
    against the multi-group member map only — a singleton rep has no
    row there and coalesces to itself, so the join build side is the
    duplicated mass, not the corpus. Cost beyond that is the OUTPUT
    size, which for pair semantics is the lower bound no plan can
    beat."""
    ma = multi.select(F.col("__rep").alias("id_a"), F.col("__mid").alias("__xa"))
    mb = multi.select(F.col("__rep").alias("id_b"), F.col("__mid").alias("__xb"))
    xa = F.coalesce(F.col("__xa"), F.col("id_a"))
    xb = F.coalesce(F.col("__xb"), F.col("id_b"))
    return (
        rep_pairs.join(ma, "id_a", "left")
        .join(mb, "id_b", "left")
        .select(
            F.least(xa, xb).alias("id_a"),
            F.greatest(xa, xb).alias("id_b"),
            *[F.col(c) for c in payload_cols],
        )
    )


def _within_group_pairs(
    multi: DataFrame, eligible_reps: DataFrame, payload
) -> DataFrame:
    """C(m,2) pairs inside each exact-duplicate group whose rep is in
    ``eligible_reps`` (docs that actually enter the similarity
    pipeline — zero-shingle / zero-token docs never pair in the
    uncollapsed plan and must not pair here). ``payload`` is a list of
    (name, Column) similarity values — literals (jaccard 1.0 /
    hamming 0 — exactly what verification computes for identical
    contents) or references to extra columns riding eligible_reps
    (winnowing's per-doc fingerprint count)."""
    el = multi.join(eligible_reps, "__rep")
    extra = [c for c in el.columns if c not in ("__rep", "__mid")]
    a = el.select("__rep", F.col("__mid").alias("__xa"), *extra)
    b = el.select("__rep", F.col("__mid").alias("__xb"))
    return (
        a.join(b, "__rep")
        .filter(F.col("__xa") < F.col("__xb"))
        .select(
            F.col("__xa").alias("id_a"),
            F.col("__xb").alias("id_b"),
            *[c.alias(nm) for nm, c in payload],
        )
    )


def _multi_reps_in(frame: DataFrame, multi: DataFrame) -> DataFrame:
    """(__rep) — multi-group representatives that appear in ``frame``
    (an (id, ...) pipeline frame): the eligibility set for
    within-group pairs. Semi-join ``frame`` against the small distinct
    multi-rep set FIRST, so the distinct aggregates only the
    duplicated mass's rows, never the corpus."""
    mr = multi.select(F.col("__rep").alias("id")).distinct()
    return (
        frame.select("id")
        .join(mr, "id", "left_semi")
        .distinct()
        .select(F.col("id").alias("__rep"))
    )


def shingles(
    df: DataFrame, id_col: str, content_col: str, n: int = 3, with_count: bool = False
) -> DataFrame:
    """(id, shingle) inverted-index rows: distinct word n-grams.

    Shingling + hashing is the CPU-bound hot path of every dedup tier;
    ``ensure_parallelism`` spreads a few-split scan across the cluster
    (no-op when the input is already parallel).

    ``with_count=True`` adds the doc's distinct-shingle count ``n_sh``
    to every posting row — computed from the SAME staged array before
    the explode, so consumers that need per-doc sizes (Jaccard) carry
    them through the pair join instead of joining a sizes table back
    onto a pair-sized intermediate later (which re-shuffles the
    candidate pairs once per join as soon as the corpus outgrows the
    broadcast threshold — measured 4 GB of avoidable shuffle at 500k
    docs)."""
    df = ensure_parallelism(df)
    staged = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_ngrams(tokenize(content_col), n)).alias("__sh"),
    )
    cols = [F.col("id"), F.explode(F.col("__sh")).alias("shingle")]
    if with_count:
        cols.insert(1, F.size(F.col("__sh")).alias("n_sh"))
    return staged.select(*cols)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    content_col: str,
    n: int = 3,
    threshold: float = 0.5,
    collapse_exact: bool = True,
) -> DataFrame:
    """Document pairs with n-gram Jaccard similarity >= threshold.

    Inverted-index plan: explode distinct shingles (each posting row
    carrying its doc's shingle count), self-join on the shingle
    (equi-join → hash shuffle on shingle, NOT a cross join), count
    co-occurrences with the sizes riding as grouping keys, then
    Jaccard = inter / (|A|+|B|-inter). Only pairs sharing >=1 shingle
    are ever materialized; hot shingles (stopword runs) are the skew
    risk — AQE skew-join handles the residual, and raising ``n``
    shrinks posting lists.

    The per-doc sizes travel ON the posting rows (one int each) rather
    than as a separate table joined back after the pair aggregation:
    a sizes join is free while the table broadcasts, but past the
    broadcast threshold it re-shuffles the PAIR-sized intermediate
    once per side — measured at 500k docs: 4.0 GB shuffle / 183 s
    with the post-joins vs one pair shuffle without them. Exactly two
    shuffles at any corpus size: postings by shingle, pairs by id.

    Exact-duplicate clusters are collapsed to one representative
    before the posting self-join (``collapse_exact``, default on):
    a boilerplate page copied m times otherwise contributes C(m,2)
    rows PER SHARED SHINGLE to the join — the skew-tier mega-cluster
    pathology — while the collapsed plan pays one narrow postings⋈rep
    join and regenerates the identical pair set by expansion after
    the threshold filter (identical contents ⇒ jaccard 1.0 within a
    group, and every member inherits its representative's verified
    similarities). Output is unchanged — the same oracle verifies
    both plans.

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    sh = shingles(df, id_col, content_col, n, with_count=True)
    if not collapse_exact:
        return _jaccard_from_postings(sh, threshold)
    non_rep, multi = _exact_groups(df, id_col, content_col)
    rep_sh = _rep_only(sh, non_rep)
    rep_pairs = _jaccard_from_postings(rep_sh, threshold)
    cross = _expand_pairs(rep_pairs, multi, ["jaccard"])
    if threshold > 1.0:
        return cross
    eligible = _multi_reps_in(rep_sh, multi)
    within = _within_group_pairs(multi, eligible, [("jaccard", F.lit(1.0))])
    return cross.unionByName(within)


def _jaccard_from_postings(sh: DataFrame, threshold: float) -> DataFrame:
    """Shared posting-self-join + Jaccard verify over a (id, n_sh,
    shingle) inverted-index frame."""
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard", F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    content_col: str,
    n: int = 3,
    threshold: float = 0.5,
    collapse_exact: bool = True,
) -> DataFrame:
    """Document pairs where the SMALLER document's shingle set is
    mostly contained in the larger one: containment(A→B) =
    |A∩B| / |A| (Broder 1997's resemblance companion). The asymmetric
    measure catches excerpt/quote/boilerplate inclusion — a 100-word
    page pasted into a 10,000-word page has near-zero Jaccard but
    containment ≈ 1 — which is exactly what symmetric dedup tiers
    miss.

    Same two-shuffle inverted-index plan as ngram_jaccard_pairs
    (postings by shingle with sizes riding the rows, pairs by id);
    only the final row-local formula differs: the reported
    containment is max(inter/|A|, inter/|B|) with the direction
    column naming the contained side.

    Exact-duplicate clusters are collapsed to one representative
    before the posting self-join (``collapse_exact``, default on; same
    mega-cluster rationale as ngram_jaccard_pairs). The direction
    column is re-derived per EXPANDED pair from the shingle-set sizes
    (contained = 'a' iff n_a <= n_b, the exact c_a >= c_b condition
    since inter is fixed — ties to 'a'), so a member pair whose id
    order flips relative to its representatives reports the side the
    uncollapsed plan would.

    Returns (id_a, id_b, containment, contained) with id_a < id_b and
    contained in {'a','b'} (the doc whose shingles are covered —
    ties to 'a').
    """
    sh = shingles(df, id_col, content_col, n, with_count=True)
    if not collapse_exact:
        return _containment_finalize(_containment_from_postings(sh, threshold))
    non_rep, multi = _exact_groups(df, id_col, content_col)
    rep_sh = _rep_only(sh, non_rep)
    rep_pairs = _containment_from_postings(rep_sh, threshold)
    ma = multi.select(F.col("__rep").alias("id_a"), F.col("__mid").alias("__xa"))
    mb = multi.select(F.col("__rep").alias("id_b"), F.col("__mid").alias("__xb"))
    xa = F.coalesce(F.col("__xa"), F.col("id_a"))
    xb = F.coalesce(F.col("__xb"), F.col("id_b"))
    swapped = xa > xb
    cross = (
        rep_pairs.join(ma, "id_a", "left")
        .join(mb, "id_b", "left")
        .select(
            F.least(xa, xb).alias("id_a"),
            F.greatest(xa, xb).alias("id_b"),
            "containment",
            F.when(swapped, F.col("n_b")).otherwise(F.col("n_a")).alias("n_a"),
            F.when(swapped, F.col("n_a")).otherwise(F.col("n_b")).alias("n_b"),
        )
    )
    out = _containment_finalize(cross)
    if threshold > 1.0:
        return out
    eligible = _multi_reps_in(rep_sh, multi)
    within = _within_group_pairs(
        multi,
        eligible,
        [("containment", F.lit(1.0)), ("contained", F.lit("a"))],
    )
    return out.unionByName(within)


def _containment_from_postings(sh: DataFrame, threshold: float) -> DataFrame:
    """Posting self-join + containment threshold, direction deferred:
    (id_a, id_b, containment, n_a, n_b). The max-side containment is
    orientation-free, so the threshold filter is safe before any
    member expansion re-orients the pair."""
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    c_a = F.col("inter") / F.col("n_a")
    c_b = F.col("inter") / F.col("n_b")
    return (
        inter.withColumn("containment", F.greatest(c_a, c_b))
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment", "n_a", "n_b")
    )


def _containment_finalize(pairs: DataFrame) -> DataFrame:
    """Round + derive the contained side from the sizes: 'a' iff
    n_a <= n_b (ties to 'a') — identical to c_a >= c_b at fixed
    intersection."""
    return pairs.select(
        "id_a",
        "id_b",
        F.round("containment", 6).alias("containment"),
        F.when(F.col("n_a") <= F.col("n_b"), F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("contained"),
    )


def contamination_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    content_col: str,
    bench_id_col: str,
    bench_content_col: str,
    n: int = 3,
    threshold: float = 0.05,
) -> DataFrame:
    """Eval-set decontamination: per-document n-gram overlap against a
    benchmark corpus (the pretraining-hygiene check that a training doc
    does not leak evaluation data).

    Plan shape for 100 TB: the benchmark's distinct shingle set is tiny
    relative to the corpus (eval sets are KBs-to-MBs), so it is
    broadcast and the overlap is a broadcast LEFT join on the exploded
    doc shingles — the corpus is never shuffled, and each doc's
    shingles stay on their scan partition. One groupBy on doc id (the
    same shuffle the shingle-size count already needs) finishes it.

    Returns (id, n_shingles, n_overlap, contamination, is_contaminated)
    for every doc with at least one shingle (docs shorter than ``n``
    tokens have no n-grams and are omitted — nothing to leak).
    """
    doc_sh = shingles(docs, id_col, content_col, n)
    bench_sh = (
        shingles(benchmark, bench_id_col, bench_content_col, n)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_overlap"),
        )
        .withColumn(
            "contamination",
            F.round(F.col("n_overlap") / F.col("n_shingles"), 6),
        )
        .withColumn("is_contaminated", F.col("contamination") >= threshold)
    )


# Universal-hash family for MinHash: ONE md5 per shingle, k affine
# combinations mod a Mersenne prime. 16x cheaper than k independent
# md5s and still reproducible bit-for-bit in any SQL engine:
#   h1 = hex[1..15] % P, h2 = hex[16..30] % P
#   mh_i = (A_i * h1 + B_i * h2 + i) % P
MINHASH_P = 2147483647  # 2^31 - 1


def minhash_coeffs(i: int) -> tuple[int, int, int]:
    return (2 * i + 1, 97 * i + 31, i)


def minhash_signature(df: DataFrame, id_col: str, content_col: str, n: int = 3, k: int = 16) -> DataFrame:
    """(id, minhash[0..k-1]) — k universal-hash min-hashes over the
    doc's distinct word n-grams. One md5 per shingle (affine family
    above); one aggregation per doc; no shuffle beyond the per-id
    groupBy of the exploded shingles.
    """
    sh = shingles(df, id_col, content_col, n)
    hexed = sh.select(
        "id",
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
        .cast("bigint")
        .__mod__(MINHASH_P)
        .alias("__h1"),
        F.conv(F.substring(F.md5("shingle"), 16, 15), 16, 10)
        .cast("bigint")
        .__mod__(MINHASH_P)
        .alias("__h2"),
    )
    aggs = []
    for i in range(k):
        a, b, c = minhash_coeffs(i)
        aggs.append(
            F.min(
                (F.col("__h1") * a + F.col("__h2") * b + c).__mod__(MINHASH_P)
            ).alias(f"mh{i}")
        )
    return hexed.groupBy("id").agg(*aggs)


def minhash_bands(
    df: DataFrame,
    id_col: str,
    content_col: str,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(id, band, bkey) LSH band rows: the k-minhash signature split
    into ``bands`` groups, each hashed to one band key. Docs agreeing
    on any band key are near-dup candidates.

    ``bkey`` is the 16-byte binary md5 (``unhex``), not the 32-char
    hex string (r14, guide §2.3 narrower types — the r13
    paragraph/span-digest precedent): the key is only ever compared
    for equality (candidate self-join, index join), never output, and
    hex→binary is a bijection, so the candidate set is unchanged while
    every banding exchange and persisted band index carries half the
    key bytes — at 100 TB the band table is corpus×bands-sized."""
    if k % bands != 0:
        raise ValueError("k must be divisible by bands")
    rows_per_band = k // bands
    sig = minhash_signature(df, id_col, content_col, n, k)
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.unhex(
                    F.md5(F.concat_ws("|", *[c.cast("string") for c in cols]))
                ).alias("bkey"),
            )
        )
    return sig.select(
        F.col("id"), F.explode(F.array(*band_structs)).alias("bs")
    ).select("id", F.col("bs.band").alias("band"), F.col("bs.bkey").alias("bkey"))


def build_dedup_index(
    docs: DataFrame,
    id_col: str,
    content_col: str,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Persistable incremental-dedup index over an existing corpus:
    (digest set, LSH band-key table). In production both are written
    once and appended after each batch is filtered — new data is
    deduped against the index without ever rescanning corpus text.
    """
    # 16-byte binary digests (not 32-char hex): equality-only key,
    # half the bytes in the digest exchange and the persisted index
    digests = docs.select(
        F.unhex(F.md5(F.col(content_col))).alias("digest")
    ).distinct()
    band_rows = (
        minhash_bands(docs, id_col, content_col, n, k, bands)
        .select("band", "bkey")
        .distinct()
    )
    return digests, band_rows


def dedup_against_index(
    batch: DataFrame,
    digest_index: DataFrame,
    band_index: DataFrame,
    id_col: str,
    content_col: str,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Incremental dedup: annotate a new batch against an existing
    corpus index (from build_dedup_index) without touching corpus text.

    Policy: an exact digest hit or ANY LSH band collision marks the
    doc a duplicate — the standard at-scale choice (no exact-Jaccard
    verification pass, over-drop bounded by the LSH false-positive
    rate at the configured bands/rows-per-band).

    Plan shape for a 100 TB index: the batch is the small side, so
    both probes broadcast the batch and stream the index map-side —
    the index is scanned once per probe and never shuffled; hit sets
    (bounded by batch size) come back as broadcast left joins onto
    the batch.

    Returns (id, is_exact_dup, is_near_dup, keep).
    """
    batch_dig = batch.select(
        F.col(id_col).alias("id"),
        F.unhex(F.md5(F.col(content_col))).alias("digest"),
    )
    exact_ids = (
        digest_index.join(F.broadcast(batch_dig), "digest")
        .select("id")
        .distinct()
        .withColumn("__e", F.lit(True))
    )
    batch_bands = minhash_bands(batch, id_col, content_col, n, k, bands)
    near_ids = (
        band_index.join(F.broadcast(batch_bands), ["band", "bkey"])
        .select("id")
        .distinct()
        .withColumn("__n", F.lit(True))
    )
    return (
        batch.select(F.col(id_col).alias("id"))
        .join(F.broadcast(exact_ids), "id", "left")
        .join(F.broadcast(near_ids), "id", "left")
        .select(
            "id",
            F.coalesce("__e", F.lit(False)).alias("is_exact_dup"),
            F.coalesce("__n", F.lit(False)).alias("is_near_dup"),
        )
        .withColumn("keep", ~(F.col("is_exact_dup") | F.col("is_near_dup")))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    content_col: str,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    collapse_exact: bool = True,
) -> DataFrame:
    """Near-duplicate pairs by MinHash-LSH, verified by true Jaccard.

    Plan: signature (k minhashes) → ``bands`` band-keys (md5 of the
    band's concatenated minhashes) → explode band rows → equi-join on
    (band_index, band_key) to get candidates → verify candidates with
    exact n-gram Jaccard and keep >= threshold.

    The candidate join is an equi-join on the band key, so the cost is
    bounded by real collisions (tunable via bands/rows-per-band), never
    O(n^2). Verification re-shingles ONLY docs that appear in some
    candidate pair (semi-join prefilter): the corpus is scanned once
    for signatures; the exact-Jaccard pass scans |candidate docs|,
    which at production thresholds is orders of magnitude smaller than
    the corpus — the property that makes this plan hold at 100TB.

    Exact-duplicate clusters are collapsed to one representative
    before the candidate join (``collapse_exact``, default on).
    Identical contents agree in EVERY band at ANY (k, bands), so a
    boilerplate page copied m times produces C(m,2) candidates PER
    BAND in the naive plan — the cluster-size explosion no banding
    parameter can fix (the skew-tier finding, SCALING.md round 13).
    The collapsed plan bands one representative per distinct content
    (band rows anti-joined against the non-representative ids —
    narrow, no body shuffle, and EMPTY on a dup-free corpus so the
    filter broadcasts; the redundant map-side hashing of duplicates
    is embarrassingly parallel and linear), verifies representative
    pairs only, then expands the
    verified pairs over the member groups: within-group pairs carry
    jaccard 1.0 (what verification computes for identical shingle
    sets) and cross-group member pairs inherit their reps' verified
    jaccard. The pair set is IDENTICAL to the uncollapsed plan's —
    the same oracle verifies both — and the only quadratic term left
    is the output itself, the semantic lower bound.
    Returns (id_a, id_b, jaccard), id_a < id_b.
    """
    # r14 NEGATIVE RESULT (VERDICT r13 next-round #4, measured and
    # reverted — the basket-family precedent): "share the document
    # scan between the digest exchange and the banding exchange" was
    # tried in two forms and BOTH measured worse at sf0.1 than this
    # two-scan shape (isolated MeasuredRun baseline 3,831,614 B / 33
    # stages):
    # (a) digest riding the signature aggregate (with_digest) + the
    #     per-doc signature frame pinned so both branches read one
    #     materialization: the InMemoryTableScan subtrees defeated
    #     static ReuseExchange across EVERY downstream branch (12
    #     ReusedExchange -> 0) — 5,414,937 B (+41%), 49 stages.
    # (b) same fusion relying on plan-level exchange reuse instead of
    #     a pin: per-branch column pruning rewrites the shared
    #     groupBy(id) partial aggregate (the digest branch prunes all
    #     k minhash columns), so the exchange subplans never
    #     canonicalize equal and the scan duplicates anyway —
    #     5,920,222 B (+55%), 37 stages.
    # The unfused plan's repeated digest/banding subtrees already
    # collapse via ReusedExchange at execution; the second corpus
    # scan is the price of keeping that reuse, and it is the cheaper
    # side of the trade in both measured variants.
    banded_all = minhash_bands(df, id_col, content_col, n, k, bands)
    if not collapse_exact:
        return _lsh_candidate_verify(df, banded_all, id_col, content_col, n, threshold)
    non_rep, multi = _exact_groups(df, id_col, content_col)
    banded = _rep_only(banded_all, non_rep)
    rep_pairs = _lsh_candidate_verify(df, banded, id_col, content_col, n, threshold)
    cross = _expand_pairs(rep_pairs, multi, ["jaccard"])
    if threshold > 1.0:
        return cross
    eligible = _multi_reps_in(banded, multi)
    within = _within_group_pairs(multi, eligible, [("jaccard", F.lit(1.0))])
    return cross.unionByName(within)


def _lsh_candidate_verify(
    df: DataFrame,
    banded: DataFrame,
    id_col: str,
    content_col: str,
    n: int,
    threshold: float,
) -> DataFrame:
    """Shared LSH candidate join + exact-Jaccard verification over a
    (id, band, bkey) band-row frame."""
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # The candidate set feeds two consumers (the doc prefilter and the
    # intersection join); without materialization Spark recomputes the
    # whole signature+banding pipeline for each (no exchange reuse
    # across the differently-aliased branches — measured 2.2x slower).
    # Candidates are small by construction (real collisions only), so
    # MEMORY_AND_DISK (pin()'s level) is bounded; Spark evicts LRU if
    # not. pin(), not a bare persist(): an enclosing pin_scope() (the
    # bench loop, the oracle gate, a long-running streaming-corpus
    # monitor) then releases the cache entry per iteration instead of
    # accumulating one per invocation (ADVICE r12's leak class).
    from lambda_refarch_mapreduce_spark.operators.relational import pin

    candidates = pin(candidates)

    # Verify candidates with exact Jaccard — but only over docs that
    # survived LSH. Shingling is the expensive per-doc work; doing it
    # for candidate docs only keeps verification cost proportional to
    # collisions, not corpus size.
    cand_ids = (
        candidates.select(F.col("id_a").alias("__cid"))
        .union(candidates.select(F.col("id_b").alias("__cid")))
        .distinct()
    )
    cand_docs = df.join(
        cand_ids, F.col(id_col) == F.col("__cid"), "left_semi"
    )
    # sizes ride the posting rows (see shingles with_count) — no
    # sizes-table join back onto the pair aggregation.
    # r14 NEGATIVE RESULT (same-process interleaved A/B, sf0.1): the
    # postings feed BOTH intersection-join sides (sa by id_a, sb by
    # (id_b, shingle)), which partition differently, so the candidate-
    # doc scan + shingling runs twice — but pin()ning the postings so
    # they shingle once measured NO WIN (pinned best 6.12 s vs 5.58 s
    # unpinned; bytes −2.7%): the cache write + InMemoryTableScan
    # conversion costs more than the second shingling of the
    # collision-bounded candidate set. The prefilter already bounds
    # the duplicated work; left unpinned (the minhash-fusion / basket
    # precedent).
    sh = shingles(cand_docs, id_col, content_col, n, with_count=True)
    sa = sh.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), "shingle")
    sb = sh.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), "shingle")
    inter = (
        candidates.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard", F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(
    df: DataFrame,
    id_col: str,
    content_col: str,
    bits: int = 60,
    kernel: str = "arrow",
) -> DataFrame:
    """(id, simhash) — per-token portable hashes, bitwise majority vote,
    packed into a bigint. Zero shuffle either way; ``kernel`` picks the
    per-doc bit-count implementation:

    - ``"arrow"`` (default, r14 — VERDICT r13 next-round #6): one
      mapInArrow pass unpacks every token hash into a 64-column bit
      matrix (numpy unpackbits), takes per-doc column sums via one
      cumsum + offset differences, majority-votes and packs — all
      exact integer ops, so the fingerprints are BIT-IDENTICAL to the
      codegen form (verified over the full sf0.1 corpus: 5000/5000
      equal). Measured at sf0.1: best wall 1.59 s vs 2.87 s, and the
      cold first run 3.9 s vs 19.6 s — 60 chained filter/size array
      passes are also expensive to CODEGEN, not just to run.
    - ``"codegen"``: the previous pure-Catalyst form (60 per-bit
      ``size(filter(...))`` passes), kept as the zero-Python twin for
      environments where the executor Python workers are unavailable.

    The per-token md5 hashing stays in the JVM in both kernels (the
    portable-hash contract the DuckDB oracle replays); only the packed
    hash array crosses the Arrow boundary in arrow mode.
    """
    df = ensure_parallelism(df)
    tokens = tokenize(content_col)
    # Materialize the per-token hash array in its own projection: all
    # 60 bit-count expressions below reference the materialized column,
    # so md5 runs once per token. Inlining the ``transform`` would
    # re-evaluate it once per bit — Catalyst does no CSE across
    # higher-order-function boundaries (measured 20x slower).
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.transform(tokens, lambda t: _h(t)).alias("__h"),
        F.size(tokens).alias("__n"),
    )
    if kernel == "arrow":
        return _simhash_arrow(hashed, bits)

    def _bit_set(mask: int):
        # single-arg closure: a 2-arg lambda would make pyspark pass
        # the array *index* as the second argument
        return lambda h: h.bitwiseAND(F.lit(mask)) != 0

    # Per bit position j: count tokens with bit j set, majority-vote,
    # OR the literal mask back in. Python-side loop over fixed ``bits``
    # — each term a plain codegen expression with a *literal* mask
    # (pyspark's shift functions only take Python ints).
    packed: Column = F.lit(0).cast("long")
    for j in range(bits):
        mask = 1 << j
        cnt_j = F.size(F.filter(F.col("__h"), _bit_set(mask)))
        packed = packed + F.when(
            cnt_j * 2 >= F.col("__n"), F.lit(mask).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return hashed.select("id", packed.alias("simhash"))


def _simhash_arrow(hashed: DataFrame, bits: int) -> DataFrame:
    """One-pass popcount/majority/pack kernel over the staged
    ``(id, __h array<bigint>, __n int)`` frame — see simhash(). Exact
    semantics replicated from the codegen form, including the edges:
    a NULL token array (NULL text) packs 0 (the codegen when/otherwise
    falls through on NULL comparisons) and an EMPTY array packs all
    ``bits`` ones (0 >= 0 majority on every bit)."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [hashed.schema["id"], T.StructField("simhash", T.LongType())]
    )

    def popcnt(batches):
        import numpy as np
        import pyarrow as pa

        shifts = np.arange(bits, dtype=np.uint64)
        for b in batches:
            ids = b.column(0)
            h = b.column(1)
            null_mask = h.is_null().to_numpy(zero_copy_only=False)
            # absolute offsets into the raw child values (NOT
            # flatten(), which drops null slots and would misalign
            # the offset arithmetic)
            offs = h.offsets.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            vals = h.values.to_numpy(zero_copy_only=False).astype(
                np.uint64, copy=False
            )
            # window the raw child to THIS batch's slice: offsets are
            # absolute, and reduceat's final segment runs to the end
            # of whatever array it is given — a sliced ListArray's
            # child can extend past offs[-1]
            vals = vals[offs[0] : offs[-1]]
            offs = offs - offs[0]
            lens = offs[1:] - offs[:-1]
            if len(vals):
                # (n_vals, 64) little-endian uint8 bit matrix; per-doc
                # column sums via reduceat with an int64 ACCUMULATOR
                # (dtype=) — no int64 bit-matrix or cumsum
                # materialization. reduceat's repeated-index quirk
                # (an empty doc's row comes back as its neighbor's
                # first element, and an all-docs-empty tail reads out
                # of range) is fixed by clamping the starts and
                # zeroing empty docs' rows afterwards.
                bitsm = np.unpackbits(
                    vals.view(np.uint8).reshape(-1, 8),
                    axis=1,
                    bitorder="little",
                )
                starts = np.minimum(offs[:-1], len(vals) - 1)
                counts = np.add.reduceat(
                    bitsm, starts, axis=0, dtype=np.int64
                )
                counts[lens == 0] = 0
            else:
                counts = np.zeros((b.num_rows, 64), np.int64)
            n = (
                b.column(2)
                .fill_null(0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            maj = counts[:, :bits] * 2 >= n[:, None]
            packed = (
                (maj.astype(np.uint64) << shifts).sum(axis=1).astype(np.int64)
            )
            packed = np.where(null_mask, 0, packed)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(packed, type=pa.int64())],
                names=["id", "simhash"],
            )

    return hashed.mapInArrow(popcnt, out_schema)


def _simhash_block_tables(
    bits: int, n_blocks: int, agree: int
) -> list[Column]:
    """Manku-style block-combination probe tables (Manku, Jain & Das
    Sarma, WWW'07 — public): split the fingerprint into ``n_blocks``
    blocks; a pair within hamming d = n_blocks - agree dirties at most
    d blocks, so some combination of ``agree`` blocks matches EXACTLY.
    One probe table per combination; the table key concatenates the
    selected blocks, so the bucket space is 2^(agree · bits/n_blocks)
    — exponentially larger than single-band probing — at the cost of
    C(n_blocks, agree) posting rows per doc. Exact recall either way;
    the choice is purely a collision/fan-out trade."""
    import itertools

    widths = [
        bits // n_blocks + (1 if i < bits % n_blocks else 0)
        for i in range(n_blocks)
    ]
    offsets = [sum(widths[:i]) for i in range(n_blocks)]

    def block(i: int) -> Column:
        return (
            F.shiftright(F.col("simhash"), offsets[i])
            .bitwiseAND(F.lit((1 << widths[i]) - 1))
            .cast("long")
        )

    structs: list[Column] = []
    for t, combo in enumerate(itertools.combinations(range(n_blocks), agree)):
        key = F.lit(0).cast("long")
        shift = 0
        for i in combo:
            key = key + block(i) * F.lit(1 << shift).cast("long")
            shift += widths[i]
        structs.append(
            F.struct(F.lit(t).alias("band"), key.alias("bbits"))
        )
    return structs


# Above this many probe tables the explode fan-out costs more than the
# collisions it saves — corpora needing more buckets than the capped
# table set provides should raise `bits` (wider fingerprints) instead.
_SIMHASH_MAX_TABLES = 256


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    content_col: str,
    bits: int = 60,
    bands: int | str = "auto",
    max_hamming: int = 5,
    n_docs: int | None = None,
    collapse_exact: bool = True,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash_a, simhash_b) <= max_hamming.

    Candidate generation by probe-table equality, then exact hamming
    via bit_count(xor). Equi-join on (table, key) — shuffle-bounded,
    never O(n^2). Recall is EXACT for every valid configuration (the
    verify step removes band false-positives and the probe scheme is
    pigeonhole-complete), so ``bands`` is purely a performance knob.

    ``bands="auto"`` (default) sizes the probe scheme to the corpus
    (SCALING.md lesson 5): with n docs (``n_docs`` hint, else one
    count over the persisted signature frame — which then also feeds
    both sides of the candidate join, so hashing runs once, not
    thrice), it uses minimal single-band
    probing (max_hamming+1 bands) while per-band bucket occupancy
    n/2^width stays under ~1024, and switches to Manku-style
    block-combination tables (_simhash_block_tables) beyond that.
    The cutover is measured, not aesthetic: a candidate pair costs
    ~9 ns (codegen bit_count + a filter that Catalyst pushes below
    the pair-dedup aggregate) while a probe posting row costs ~0.5 µs
    (explode + join build), so single-band's O(n²/2^width) candidate
    mass only overtakes the multi-table's O(C(m,k)·n) posting cost
    near occupancy ~1000 (measured at 500k docs: 1.02e9 candidates /
    9.1 s single-band vs 8.3e7 candidates / 15.7 s multi-table —
    SCALING.md lesson 5 addendum). Past the cutover the multi-table
    keys give 2^(k·width) buckets and candidate growth returns to
    ~linear in n.

    An integer ``bands`` pins classic single-band probing (pigeonhole
    REQUIRES max_hamming <= bands-1; fewer bands could differ in every
    band and silently miss a qualifying pair, so that combination
    raises instead of returning incomplete results).

    Exact-duplicate clusters are collapsed to one representative
    before the probe join (``collapse_exact``, default on): identical
    contents share the fingerprint, hence every probe key, so an
    m-copy boilerplate cluster yields C(m,2) candidates per table in
    the naive plan regardless of the probe scheme. The collapsed plan
    probes one representative per distinct content (the signature
    frame anti-joined against the non-representative ids — empty and
    broadcast on a dup-free corpus), then expands: within-group pairs
    at hamming 0 (identical
    fingerprints), cross-group member pairs inherit their reps'
    hamming. Output identical; ``n_docs`` (if given) is treated as an
    upper bound for the auto sizing — a corpus-count hint sizes the
    rep probe conservatively, which only costs buckets, never recall.
    """
    sig = simhash(df, id_col, content_col, bits)
    if not collapse_exact:
        return _simhash_rep_pairs(sig, bits, bands, max_hamming, n_docs)
    non_rep, multi = _exact_groups(df, id_col, content_col)
    sig = _rep_only(sig, non_rep)
    rep_pairs = _simhash_rep_pairs(sig, bits, bands, max_hamming, n_docs)
    cross = _expand_pairs(rep_pairs, multi, ["hamming"])
    eligible = _multi_reps_in(sig, multi)
    within = _within_group_pairs(
        multi, eligible, [("hamming", F.lit(0).cast("integer"))]
    )
    return cross.unionByName(within)


def _simhash_rep_pairs(
    sig: DataFrame,
    bits: int,
    bands: int | str,
    max_hamming: int,
    n_docs: int | None,
) -> DataFrame:
    """Probe-scheme sizing + candidate join + exact-hamming verify
    over a (id, simhash) fingerprint frame."""
    if bands == "auto":
        if n_docs is not None:
            n = n_docs
        else:
            # Size the scheme from the signature frame itself, not a
            # second raw-corpus scan: materializing sig makes the
            # sizing count the ONLY md5 pass — the candidate self-join
            # below reads the stored signatures for both sides instead
            # of recomputing the per-token hashing twice. (Callers
            # that know the corpus size pass ``n_docs`` and skip the
            # materialization entirely.) localCheckpoint, not
            # persist(): a lazy return can never unpersist at the
            # right moment, and CacheManager pins persisted plans for
            # the session's lifetime — checkpoint blocks are
            # ContextCleaner-managed and freed when the plan is GC'd,
            # so repeated calls in a long-lived session don't
            # accumulate executor cache. Tradeoff: lineage is
            # truncated, so a lost executor fails the job instead of
            # recomputing — acceptable for the sizing path only.
            sig = sig.localCheckpoint(eager=True)
            n = sig.count()
        simple_bands = max_hamming + 1
        width = bits // simple_bands
        # occupancy ≤ ~1024: candidate evaluation is cheaper than the
        # multi-table posting fan-out (measured crossover, docstring)
        if n <= (1 << width) * 1024:
            bands = simple_bands
        else:
            # smallest block count whose combination-key occupancy
            # n/2^key_width drops under ~128 (same candidate-vs-
            # posting economics as the outer cutover), capped so the
            # explode fan-out stays bounded
            import math
            import warnings

            choice = None
            for m in range(max_hamming + 2, max_hamming + 10):
                agree = m - max_hamming
                key_width = agree * (bits // m)
                n_tables = math.comb(m, agree)
                if n_tables > _SIMHASH_MAX_TABLES or bits // m == 0:
                    break
                choice = (m, agree)
                if (1 << key_width) * 128 >= n:
                    break
            if choice is None:
                # even the smallest block-combination scheme exceeds
                # the table cap (large max_hamming relative to bits):
                # fall back to minimal single-band probing, loudly
                warnings.warn(
                    f"simhash_near_pairs: no capped multi-table scheme "
                    f"exists for bits={bits}, max_hamming={max_hamming}; "
                    f"falling back to {simple_bands}-band probing — "
                    f"expect superlinear candidates at {n} docs.",
                    stacklevel=2,
                )
                bands = simple_bands
            else:
                m, agree = choice
                if (1 << (agree * (bits // m))) * 128 < n:
                    warnings.warn(
                        f"simhash_near_pairs: corpus of {n} docs exceeds "
                        f"the bucket space of the largest capped probe "
                        f"scheme ({m} blocks / agree-{agree}); expect "
                        f"superlinear candidates — raise `bits` for a "
                        f"wider fingerprint.",
                        stacklevel=2,
                    )
                band_structs = _simhash_block_tables(bits, m, agree)
                return _simhash_join(sig, band_structs, max_hamming)
    if max_hamming > bands - 1:
        raise ValueError(
            f"banding is only exact when max_hamming <= bands-1; got "
            f"max_hamming={max_hamming}, bands={bands} — raise bands to "
            f"at least {max_hamming + 1}"
        )
    band_width = bits // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * band_width)
            .bitwiseAND(F.lit((1 << band_width) - 1))
            .alias("bbits"),
        )
        for b in range(bands)
    ]
    return _simhash_join(sig, band_structs, max_hamming)


def _simhash_join(
    sig: DataFrame, band_structs: list[Column], max_hamming: int
) -> DataFrame:
    """Shared candidate join + exact-hamming verify over any probe-table
    layout: explode (band, key) postings, self-equi-join on them, then
    bit_count(xor) filters to true near-dups."""
    banded = sig.select(
        "id", "simhash", F.explode(F.array(*band_structs)).alias("bs")
    ).select("id", "simhash", F.col("bs.band").alias("band"), F.col("bs.bbits").alias("bbits"))

    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bbits") == F.col("b.bbits"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Transitive closure of a near-duplicate pair graph: assign every
    node the min node-id reachable from it (its cluster id).

    Pairwise dedup is not enough for a training corpus: if A~B and B~C
    but A!~C, keep-first-per-pair can keep both A and C even though
    they transitively share content with B. Clustering the pair graph
    and keeping one doc per component is the standard fix (the
    reference has no equivalent — its reduce tree only merges
    aggregates, driver.py:announces no graph step).

    Algorithm: iterative min-label propagation (label = min id seen).
    Each round is one shuffle (join edges->labels + groupBy-min), and
    labels only ever decrease, so `sum(label)` is a strictly
    decreasing convergence witness — equal sums mean fixpoint, no
    expensive changed-row anti-join. Rounds needed = graph diameter;
    near-dup components are small and dense (diameter 2-4 in
    practice), so this beats the O(log^2 n) large-star/small-star
    alternative on constant factors. Each round's result is
    checkpointed to truncate the growing lineage: by default with
    `localCheckpoint` (executor-local blocks — fast, but lost if an
    executor dies mid-job; harmless in local mode, where the single
    process dying ends the job anyway). On a real cluster pass
    ``reliable_checkpoint=True`` AND set
    ``spark.sparkContext.setCheckpointDir(<hdfs/s3 path>)`` first:
    rounds then persist via `checkpoint()` to the reliable store and
    survive executor loss / dynamic-allocation deallocation.

    Returns (node, comp): one row per node that appears in >=1 pair.
    Docs with no near-dup edge are trivially their own cluster and are
    deliberately not materialized (at 100TB the edge set is ~0.1% of
    the corpus; carrying every singleton through the iteration would
    shuffle the full doc-id set `diameter` times for no information).
    """
    def _ckpt(df: DataFrame) -> DataFrame:
        # eager either way: cuts lineage and runs the round
        return df.checkpoint() if reliable_checkpoint else df.localCheckpoint()

    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = _ckpt(
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
    )
    labels = edges.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("comp")
    )
    prev_sum = None
    for _ in range(max_iter):
        msgs = edges.join(labels, edges["b"] == labels["node"]).select(
            edges["a"].alias("node"), labels["comp"]
        )
        labels = _ckpt(
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        s = labels.agg(F.sum("comp")).first()[0]
        if s == prev_sum:
            break
        prev_sum = s
    return labels


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    split_pattern: str | None = None,
) -> DataFrame:
    """Corpus-wide exact paragraph dedup (the C4/Dolma pass the
    reference's framework could never express — it has no second
    shuffle): every distinct non-blank paragraph survives only at its
    first occurrence, ordered by (id, position); documents are then
    reassembled from their surviving paragraphs in original order.

    ``sep`` is the LITERAL separator used to rejoin surviving
    paragraphs; by default it is also regex-escaped into the split
    pattern, so regex metacharacters in ``sep`` are safe. Pass
    ``split_pattern`` (a Java regex, e.g. ``r"\\n+"``) to split on a
    pattern while rejoining with the literal ``sep`` — the two roles
    are distinct parameters because a regex can't be used as a rejoin
    string without corrupting the rebuilt text.

    Plan shape at 100 TB (r14, guide §8 "decide with small rows, move
    big rows once" — the duplicate_span_excise posture): paragraph
    BODIES never shuffle at all. The keep-first decision needs only
    (id, pos, 16-byte binary digest) — that narrow frame rides the one
    digest-keyed window exchange; the DROPPED occurrences (rn > 1, the
    duplicate mass, tiny for mostly-unique corpora) collapse to one
    sorted position array per affected doc and join back on doc id —
    AQE broadcasts that side whenever the dup set fits (it is EMPTY on
    a dup-free corpus) — and each document is rebuilt row-locally by
    re-splitting its own text and filtering out the dropped positions.
    The pre-r14 shape shuffled paragraph text twice (digest window +
    per-doc rebuild groupBy, each corpus-sized); this shape shuffles
    ~28 B/paragraph once plus the duplicate mass, at the price of one
    extra row-local split pass over the corpus (second scan — the
    measured-cheaper side of the same trade recorded on
    minhash_lsh_pairs). The rn>1 filter forgoes the old rn=1 form's
    map-side WindowGroupLimit pruning, but that pruning only ever
    removed WITHIN-MAP-PARTITION repeat paragraphs — negligible on
    mostly-unique corpora, while the text-width savings apply to every
    row.

    Returns (id, n_paras, n_kept, text_deduped); fully-deduplicated
    documents stay in the output with empty text.
    """
    import re as _re

    from pyspark.sql.window import Window

    if split_pattern is None:
        split_pattern = _re.escape(sep)
    # decision pass: narrow (id, pos, digest) rows only — no bodies.
    # Only this branch gets the local-mode parallelism guard (the md5
    # hashing is the per-row-expensive part); the rebuild branch below
    # is a light row-local split+filter and must NOT pay a round-robin
    # text exchange for it.
    paras = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), split_pattern)).alias(
                "pos", "para"
            ),
        )
        .filter(F.trim(F.col("para")) != "")
        .select("id", "pos", F.unhex(F.md5(F.col("para"))).alias("__dg"))
    )
    w = Window.partitionBy("__dg").orderBy("id", "pos")
    dropped = (
        paras.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("pos")).alias("__drop"))
    )
    # placement pass: re-split each doc locally, filter out dropped
    # positions (posexplode and the HOF index lambda are both 0-based),
    # rejoin — the text never leaves its scan partition. Dropped
    # positions are all non-blank by construction, so
    # n_paras = n_kept + n_dropped exactly.
    rebuilt = (
        df.select(
            F.col(id_col).alias("id"),
            F.coalesce(
                F.split(F.col(text_col), split_pattern),
                F.array().cast("array<string>"),
            ).alias("__parr"),
        )
        .join(dropped, "id", "left")
        .select(
            "id",
            "__parr",
            F.coalesce("__drop", F.array().cast("array<int>")).alias(
                "__drop"
            ),
        )
    )
    kept_arr = F.filter(
        F.col("__parr"),
        lambda p, i: (F.trim(p) != "")
        & ~F.exists(F.col("__drop"), lambda d: d == i),
    )
    staged = rebuilt.select(
        "id",
        kept_arr.alias("__keep"),
        F.size("__drop").alias("__nd"),
    )
    return staged.select(
        F.col("id").alias(id_col),
        (F.size("__keep") + F.col("__nd")).cast("bigint").alias("n_paras"),
        F.size("__keep").cast("bigint").alias("n_kept"),
        F.array_join("__keep", sep).alias("text_deduped"),
    )


def duplicate_span_excise(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
) -> DataFrame:
    """Exact substring dedup: excise duplicated k-token spans, keeping
    each span's first occurrence — the sequence-level pass (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better")
    that document- and paragraph-level tiers can't express: a boiler-
    plate sentence pasted into thousands of otherwise-distinct pages
    survives exactly once.

    Semantics (deterministic): every k-token rolling window is keyed by
    the md5 of its space-joined tokens; the globally first occurrence
    of each key — ordered by (id, position) — is kept, every later
    occurrence (across documents AND repeats within one document)
    marks its k token positions as covered; covered tokens are removed
    and each document is rebuilt from its surviving tokens in order.
    Documents shorter than k tokens are never touched.

    Plan shape at 100 TB: ONE corpus-sized shuffle — the keep-first
    window over (id, pos, 16-byte binary digest) rows; gram text never rides
    it. Duplicate occurrences reduce to per-doc sorted START-position
    arrays (duplicate-occurrence-sized, i.e. tiny for mostly-unique
    corpora), which join back on doc id — AQE turns that into a
    broadcast join whenever the dup set fits — and the excision itself
    is a row-local indexed filter over the token array: no exploded
    token stream ever shuffles, and reassembly costs nothing because
    the document was never taken apart. Per-token rebuild cost is
    O(|dup spans in doc|); no pair join, no collect.

    Returns (id, n_tokens, n_removed, text_cleaned); fully-excised
    documents stay in the output with empty text.
    """
    from pyspark.sql.window import Window

    staged = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("__toks")
    )
    # 16-byte binary digest, not the 32-char hex string: the digest is
    # only a grouping key (never output), unhex(md5) is a bijection of
    # md5, and the digest column dominates the one corpus-sized
    # exchange's row width (id, pos, digest) — guide §2.3 narrower
    # types, the _exact_groups convention
    grams = staged.select(
        "id",
        F.posexplode(word_ngrams(F.col("__toks"), k)).alias("pos", "gram"),
    ).select("id", "pos", F.unhex(F.md5(F.col("gram"))).alias("digest"))
    w = Window.partitionBy("digest").orderBy("id", "pos")
    # Merge each doc's sorted duplicate-window starts into disjoint
    # covered INTERVALS before anything joins: a fully-duplicated
    # document has ~T duplicate windows but collapses to ONE interval.
    # This (a) makes the per-token test below O(T * intervals) instead
    # of O(T * windows) — linear, not quadratic, on exact-dup docs —
    # and (b) shrinks the dup side enough that AQE broadcast-joins it
    # instead of sort-merge-shuffling the tokenized corpus (measured:
    # the uncompressed start arrays crossed the broadcast threshold at
    # 100x and forced a corpus-sized shuffle). Starts ascend, so a
    # window [p, p+k-1] either extends the last interval
    # (p <= last.e + 1; its end p+k-1 > last.e always) or opens a new
    # one.
    def _intervals(starts: Column) -> Column:
        return F.aggregate(
            starts,
            F.array().cast("array<struct<s:int,e:int>>"),
            lambda acc, p: F.when(
                (F.size(acc) > 0)
                & (p <= F.element_at(acc, -1)["e"] + 1),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(
                        F.struct(
                            F.element_at(acc, -1)["s"].alias("s"),
                            (p + F.lit(k - 1)).alias("e"),
                        )
                    ),
                ),
            ).otherwise(
                F.concat(
                    acc,
                    F.array(
                        F.struct(p.alias("s"), (p + F.lit(k - 1)).alias("e"))
                    ),
                )
            ),
        )

    dup_iv = (
        grams.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .groupBy("id")
        .agg(F.sort_array(F.collect_set("pos")).alias("__starts"))
        .select("id", _intervals(F.col("__starts")).alias("__iv"))
    )
    joined = staged.join(dup_iv, "id", "left").select(
        "id",
        "__toks",
        F.coalesce(
            "__iv", F.array().cast("array<struct<s:int,e:int>>")
        ).alias("__iv"),
    )
    kept = joined.withColumn(
        "__kept",
        F.filter(
            F.col("__toks"),
            lambda t, i: ~F.exists(
                F.col("__iv"),
                lambda iv: (i >= iv["s"]) & (i <= iv["e"]),
            ),
        ),
    )
    return kept.select(
        F.col("id").alias(id_col),
        F.size("__toks").cast("bigint").alias("n_tokens"),
        (F.size("__toks") - F.size("__kept")).cast("bigint").alias("n_removed"),
        F.array_join("__kept", " ").alias("text_cleaned"),
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    tokens_per_chunk: int = 8,
    out_col: str = "text",
) -> DataFrame:
    """Re-chunk a flat token stream into fixed-width pseudo-paragraphs
    joined by newlines — the adapter that lets paragraph_dedup run on
    corpora whose documents carry no layout (row-local projection,
    zero shuffle).

    The token array is materialized in its own projection first so the
    per-chunk ``slice`` references a column, not the tokenize
    expression — Catalyst does no CSE into higher-order-function
    lambdas (see functions.scalar.word_ngrams)."""
    staged = df.select(F.col(id_col), tokenize(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    w = tokens_per_chunk
    nchunks = F.ceil(F.size(toks) / F.lit(float(w))).cast("int")
    idx = F.when(nchunks >= 1, F.sequence(F.lit(1), nchunks)).otherwise(
        F.array().cast("array<int>")
    )
    chunked = F.array_join(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, (i - 1) * w + 1, w), " ")),
        "\n",
    )
    return staged.select(F.col(id_col), chunked.alias(out_col))


WINNOW_SEED = 7


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    content_col: str,
    n: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 —
    the MOSS local-fingerprinting algorithm): hash every positional
    n-gram, slide a ``window`` over the hash sequence, keep the
    minimum of each window, emit the distinct selected hashes. The
    guarantee: any shared substring of at least ``window + n - 1``
    tokens yields at least one SHARED fingerprint — so an inverted
    index over fingerprints finds local overlaps with a document-
    length-independent, tunable density (~2/(window+1) of all grams),
    where MinHash sketches only global resemblance.

    Row-local selection (O(grams x window) per doc via a staged hash
    array — HOF staging rule applies), zero shuffle until the caller
    joins fingerprints. Hashes are the portable md5 family, so the
    oracle replays selection exactly. Documents shorter than the
    window emit the single global minimum; documents with < n tokens
    emit nothing.

    Returns (id, fingerprint) distinct rows.
    """
    staged = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        word_ngrams(tokenize(F.col(content_col)), n).alias("__grams"),
    )
    hashed = staged.select(
        "id",
        F.transform(
            F.col("__grams"), lambda g: salted_hash(g, WINNOW_SEED)
        ).alias("__h"),
    )
    g = F.size("__h")
    nwin = g - F.lit(window - 1)
    fps = (
        F.when(
            nwin >= 1,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(nwin, F.lit(1))),
                    lambda j: F.array_min(F.slice(F.col("__h"), j, window)),
                )
            ),
        )
        .when(g >= 1, F.array(F.array_min(F.col("__h"))))
        .otherwise(F.array().cast("array<bigint>"))
    )
    return hashed.select("id", F.explode(fps).alias("fingerprint"))


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str,
    content_col: str,
    n: int = 3,
    window: int = 4,
    min_shared: int = 2,
    collapse_exact: bool = True,
) -> DataFrame:
    """Local-overlap candidate pairs from winnowing fingerprints —
    the MOSS match step: documents sharing >= ``min_shared`` selected
    fingerprints. Because winnowing guarantees a shared fingerprint
    for any shared (window+n-1)-token run, this finds documents with
    LOCAL overlapping passages regardless of how different the rest of
    their content is — the plagiarism/boilerplate detector, vs
    MinHash's global-resemblance candidates.

    Plan shape: identical to the other inverted-index tiers — one
    shuffle of (id, fingerprint) postings keyed by the 60-bit
    fingerprint, pairs only materialize for docs sharing one, one pair
    shuffle for the count. Fingerprint density ~2/(window+1) of grams,
    so posting volume is a tunable fraction of the Jaccard tier's.

    Exact-duplicate clusters are collapsed to one representative
    before the posting self-join (``collapse_exact``, default on;
    boilerplate clusters are exactly this operator's target corpus,
    and identical docs share every fingerprint, so the naive join
    pays C(m,2) rows PER FINGERPRINT). Within-group pairs carry the
    doc's own distinct-fingerprint count — what the self-join counts
    for identical fingerprint sets — gated on >= min_shared like any
    other pair.

    Returns (id_a, id_b, shared_fingerprints) with id_a < id_b.
    """
    fp = winnow_fingerprints(df, id_col, content_col, n, window)
    if not collapse_exact:
        return _winnow_pairs_from_postings(fp, min_shared)
    non_rep, multi = _exact_groups(df, id_col, content_col)
    rep_fp = _rep_only(fp, non_rep)
    rep_pairs = _winnow_pairs_from_postings(rep_fp, min_shared)
    cross = _expand_pairs(rep_pairs, multi, ["shared_fingerprints"])
    # per-doc fingerprint counts only for multi-group reps (semi-join
    # against the small rep set BEFORE the aggregate — the eligibility
    # count touches the duplicated mass, never the full posting frame)
    mr = multi.select(F.col("__rep").alias("id")).distinct()
    eligible = (
        rep_fp.join(mr, "id", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("shared_fingerprints"))
        .filter(F.col("shared_fingerprints") >= min_shared)
        .select(F.col("id").alias("__rep"), "shared_fingerprints")
    )
    within = _within_group_pairs(
        multi, eligible, [("shared_fingerprints", F.col("shared_fingerprints"))]
    )
    return cross.unionByName(within)


def _winnow_pairs_from_postings(fp: DataFrame, min_shared: int) -> DataFrame:
    """Shared fingerprint-posting self-join + min_shared gate."""
    a = fp.alias("a")
    b = fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared_fingerprints"))
        .filter(F.col("shared_fingerprints") >= min_shared)
    )
