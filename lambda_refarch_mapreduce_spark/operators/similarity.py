"""Similarity search over embedding columns (array<float>).

Two tiers:
- brute-force top-k: exact baseline. Query set is broadcast (queries
  are the small side by definition); per-row cosine stays JVM-side via
  zip_with/aggregate; top-k per query via row_number window, which
  Spark executes with per-partition group limits. Cost O(|corpus| *
  |queries| * dim) FLOPs but only one broadcast and one shuffle of
  k rows per query — the correct exact plan at any corpus size when
  |queries| is bounded.
- LSH-bucketed (random hyperplane signs): deterministic hyperplanes
  derived from a seed via portable salted hashes, bucket = sign
  bitstring; candidates only within matching buckets (+ optional
  multi-probe by flipping one bit). Approximate; recall is tested
  against the brute-force tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lambda_refarch_mapreduce_spark.functions.scalar import (
    cosine_similarity,
    dot,
    l2_norm,
)
from lambda_refarch_mapreduce_spark.partitioning import ensure_parallelism


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine, rank); self-matches
    excluded; ties broken by neighbor id for determinism.
    """
    # per-side staged norms: the cross join otherwise re-folds the
    # corpus row's norm once per QUERY and the query's once per corpus
    # row (no CSE into the pair expression); dot / (nq * nc) is the
    # identical division tree, so every cosine is bit-identical
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
        ).select("query_id", "qv", l2_norm(F.col("qv")).alias("__nq"))
    )
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).select("neighbor_id", "cv", l2_norm(F.col("cv")).alias("__nc"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / (F.col("__nq") * F.col("__nc")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_col: str | None = None,
    grid_blocks: int = 16,
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup). Exact.

    With ``block_col`` (e.g. an LSH bucket or a label) the self-join is
    an equi-join on the block — shuffle-bounded, sum-of-b_i^2 cost.

    Without a block column the result is inherently Θ(n²) cosine
    evaluations (at low thresholds no blocking prunes: measured on the
    test corpus at t=0.4, banded cosine-LSH still emits 95-100% of all
    pairs as candidates at 3-6× the compute — high-dim concentration of
    measure). The scalable formulation of an exact all-pairs is
    therefore about DISTRIBUTION, not pruning: a grid/theta self-join
    (Okcan & Riedewald, SIGMOD'11). Rows are hashed into ``grid_blocks``
    chunks; the B(B+1)/2 chunk pairs become an equi-join key, so every
    executor gets two bounded chunks and the full n² work spreads
    evenly with no corpus broadcast and no BroadcastNestedLoopJoin.
    Size ``grid_blocks`` so one chunk (n/B vectors) fits an executor
    task comfortably; shuffle volume is O(n·B·dim).

    For genuinely high thresholds (>= ~0.8) prefer
    :func:`lsh_blocked_pairs`, where banded blocking does prune.
    """
    if block_col:
        # staged per-side norms: a row's norm would otherwise re-fold
        # once per pair it lands in; dot / (na * nb) is the identical
        # division tree (bit-identical cosines)
        a = df.select(
            F.col(id_col).alias("id_a"),
            _as_double(F.col(vec_col)).alias("va"),
            F.col(block_col).alias("blk_a"),
        ).select("id_a", "va", "blk_a", l2_norm(F.col("va")).alias("__na"))
        b = df.select(
            F.col(id_col).alias("id_b"),
            _as_double(F.col(vec_col)).alias("vb"),
            F.col(block_col).alias("blk_b"),
        ).select("id_b", "vb", "blk_b", l2_norm(F.col("vb")).alias("__nb"))
        joined = a.join(
            b, (F.col("blk_a") == F.col("blk_b")) & (F.col("id_a") < F.col("id_b"))
        )
        return (
            joined.select(
                "id_a",
                "id_b",
                F.round(
                    dot(F.col("va"), F.col("vb"))
                    / (F.col("__na") * F.col("__nb")),
                    6,
                ).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )

    nb = max(int(grid_blocks), 1)
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(nb)).cast("int").alias("chunk"),
    ).select("id", "v", "chunk", l2_norm(F.col("v")).alias("__n"))
    # Tiny relation of the B(B+1)/2 unordered chunk pairs; broadcast by
    # construction. Each unordered row pair (x, y) lands under exactly
    # one key: (min(chunk_x, chunk_y), max(chunk_x, chunk_y)).
    pair_rel = df.sparkSession.createDataFrame(
        [(ca, cb) for ca in range(nb) for cb in range(ca, nb)], "ca int, cb int"
    )
    left = base.join(
        F.broadcast(pair_rel), base["chunk"] == pair_rel["ca"]
    ).select(
        F.col("id").alias("id_a"), F.col("v").alias("va"),
        F.col("__n").alias("__na"), "ca", "cb",
    )
    right = base.join(
        F.broadcast(pair_rel), base["chunk"] == pair_rel["cb"]
    ).select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"),
        F.col("__n").alias("__nb"), "ca", "cb",
    )
    cand = left.join(right, ["ca", "cb"]).filter(
        # diagonal cells see both orientations — keep one; off-diagonal
        # cells see exactly one orientation — keep it and canonicalize.
        (F.col("ca") != F.col("cb")) | (F.col("id_a") < F.col("id_b"))
    )
    return (
        cand.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.round(
                dot(F.col("va"), F.col("vb"))
                / (F.col("__na") * F.col("__nb")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _hyperplane(dim: int, plane_idx: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from (seed, plane_idx).

    Components derived from md5 — no RNG state, reproducible across
    runs/engines. Values in [-1, 1)."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"hp:{seed}:{plane_idx}:{d}".encode()).hexdigest()
        out.append((int(h[:15], 16) / float(1 << 60)) * 2.0 - 1.0)
    return out


def lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Append a random-hyperplane LSH bucket id (string of sign bits).

    Cosine-LSH: bucket collision probability rises with cosine
    similarity, so bucketing before a pair join turns O(n^2) into
    sum-over-buckets O(b_i^2) — the scale path for near-dup and ANN.
    """
    from lambda_refarch_mapreduce_spark.functions.scalar import (
        array_sql,
        dot_sql,
    )

    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            raise ValueError("empty dataframe and no dim given")
        dim = first["d"]
    # One F.expr per plane instead of per-element F.lit loops + HOF
    # builder calls: the parsed tree is the identical dot-fold over the
    # identical folded plane Literal (doubles rendered with repr(),
    # which round-trips bit-exactly), but construction is one py4j call
    # per plane instead of ~dim+4 — at bands*n_planes plane exprs the
    # builder path dominated plan construction (guide §7.3: driver-side
    # single-threaded work). The double-cast vector is staged ONCE as a
    # column, so per-row it is also no longer re-cast per plane.
    staged = df.withColumn("__lshv", _as_double(F.col(vec_col)))
    bits = [
        F.expr(
            "CASE WHEN "
            + dot_sql("`__lshv`", array_sql(_hyperplane(dim, p, seed)))
            + " >= 0 THEN '1' ELSE '0' END"
        )
        for p in range(n_planes)
    ]
    return staged.withColumn(bucket_col, F.concat(*bits)).drop("__lshv")


def _flip_bits(bucket: Column, idxs: tuple[int, ...]) -> Column:
    """Bucket string with the bits at ``idxs`` (0-based) flipped."""
    out = bucket
    for i in idxs:
        flipped = F.when(F.substring(out, i + 1, 1) == "1", F.lit("0")).otherwise(
            F.lit("1")
        )
        out = F.concat(
            F.substring(out, 1, i), flipped, F.substring(out, i + 2, 2147483647)
        )
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
    seed: int = 42,
    multi_probe: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's bucket,
    plus multi-probe neighbors — every bucket within Hamming distance
    ``multi_probe`` of the query's bucket is probed, so the probe count
    is sum_{j<=multi_probe} C(n_planes, j) and recall is monotonically
    non-decreasing in ``multi_probe`` (probe sets are nested).

    Equi-join on bucket replaces the cross join; the probe expansion
    happens on the (small, broadcast) query side only, so corpus-side
    cost is unchanged. Recall measured in tests vs brute_force_topk.
    """
    from itertools import combinations

    if multi_probe < 0:
        raise ValueError(f"multi_probe must be >= 0, got {multi_probe}")
    if multi_probe > n_planes:
        raise ValueError(
            f"multi_probe ({multi_probe}) cannot exceed n_planes ({n_planes})"
        )
    # staged per-side norms (see brute_force_topk): folded once per
    # row here instead of once per candidate pair below
    cb = lsh_bucket(ensure_parallelism(corpus), vec_col, n_planes, seed).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
        F.col("bucket"),
    ).select("neighbor_id", "cv", "bucket", l2_norm(F.col("cv")).alias("__nc"))
    qb = lsh_bucket(queries, vec_col, n_planes, seed).select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
        F.col("bucket"),
    ).select("query_id", "qv", "bucket", l2_norm(F.col("qv")).alias("__nq"))
    if multi_probe >= 1:
        probes = [F.col("bucket")] + [
            _flip_bits(F.col("bucket"), idxs)
            for j in range(1, multi_probe + 1)
            for idxs in combinations(range(n_planes), j)
        ]
        qb = qb.select(
            "query_id", "qv", "__nq",
            F.explode(F.array(*probes)).alias("bucket"),
        )
    qb = F.broadcast(qb)
    # No dedup needed: each corpus row has exactly one bucket and the
    # probe buckets are distinct strings, so a (query, neighbor) pair
    # can match at most once — skipping dropDuplicates saves a shuffle.
    scored = (
        cb.join(qb, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / (F.col("__nq") * F.col("__nc")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    refine_iters: int = 1,
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse centroids: seeded with the ``n_centroids``
    corpus vectors of lowest id, then refined by ``refine_iters``
    spherical-k-means (Lloyd) passes — assign every corpus vector to
    its nearest seed by cosine, recompute each centroid as the
    per-dimension mean of its list (cosine is scale-invariant, so the
    mean needs no re-normalization). Each pass is one distributed
    groupBy over the corpus followed by a collect of O(n_centroids *
    dim) floats — bounded metadata, not data-plane rows; the corpus
    itself is never collected. Deterministic given the corpus (no RNG).
    """
    rows = (
        corpus.select(F.col(id_col).alias("cid"), _as_double(F.col(vec_col)).alias("v"))
        .orderBy("cid")
        .limit(n_centroids)
        .collect()
    )
    cents = [(i, list(r["v"])) for i, r in enumerate(rows)]
    if not cents:
        return cents
    dim = len(cents[0][1])
    vexpr = _as_double(F.col(vec_col))
    for _ in range(max(refine_iters, 0)):
        # assignment via the broadcast-joined centroid row
        # (_assign_lists_col) — bit-identical arithmetic to the
        # literal form but the per-pass plan stays O(1) in
        # n_centroids·dim, so Lloyd passes don't pay a fresh
        # codegen compile of a centroid-literal expression each round
        # (measured: the compile dominated training time at 16×64)
        means = (
            corpus.crossJoin(_centroids_frame(corpus, cents))
            # stage the cast vector and its norm fold ONCE per row
            # (HOF staging rule) before the per-centroid ranking
            .select(vexpr.alias("v"), F.col("__cents"))
            .select("v", "__cents", l2_norm(F.col("v")).alias("__nv"))
            .select(
                _assign_lists_col(
                    F.col("v"), F.col("__cents"), 1, vec_norm=F.col("__nv")
                )[0].alias("list_id"),
                F.col("v"),
            )
            .groupBy("list_id")
            .agg(*[F.avg(F.col("v")[d]).alias(f"d{d}") for d in range(dim)])
            .collect()
        )
        updated = dict(cents)
        for r in means:  # lists that attracted no vectors keep their seed
            updated[r["list_id"]] = [r[f"d{d}"] for d in range(dim)]
        cents = sorted(updated.items())
    return cents


def _assign_lists(
    vec_sql: str,
    centroids: list[tuple[int, list[float]]],
    n_lists: int,
    norm_sql: str | None = None,
) -> Column:
    """Ranked array of (centroid_id) by cosine to the staged vector
    column named by ``vec_sql`` — element 0 is the nearest centroid.
    Pure Catalyst: the centroid set is a literal array baked into the
    plan (broadcast by value). Built as ONE parsed SQL expression:
    the per-centroid Column-builder loop (cosine_similarity + struct
    per centroid) cost ~2 HOF builder round-trips per centroid at
    plan-construction time; the parsed tree is identical (same lambda
    shapes, repr()-rendered double literals round-trip bit-exactly),
    so results are unchanged. Callers stage the double-cast vector as
    a named column first.

    Cutover bound: plan size (and codegen cost) grows
    O(n_centroids * dim), so plan-literal centroids are the right call
    only for coarse quantizers up to ~100 lists at dim<=1024 — a few
    hundred KB of plan. Production IVF with thousands of lists must
    instead materialize the centroids as a DataFrame, broadcast-join
    it against the corpus/query side, and take the per-row
    min-distance via a window or groupBy-min — same shuffle shape,
    plan stays O(1) in n_centroids."""
    from lambda_refarch_mapreduce_spark.functions.scalar import (
        array_sql,
        cosine_sql,
        double_sql,
        l2_norm_py,
    )

    # norm_sql names the caller's staged row-vector norm column (the
    # cosine_sql staged-norm contract): without it the vector's norm
    # fold re-runs once per centroid literal per row. The centroid
    # norms are pre-folded HERE at construction time (l2_norm_py is
    # the bit-identical Python twin of the SQL fold; Catalyst does NOT
    # constant-fold aggregate() over literal arrays), rendered as
    # round-tripping double literals.
    structs = ", ".join(
        f"named_struct('cos', "
        f"{cosine_sql(vec_sql, array_sql(vec), norm_a=norm_sql, norm_b=double_sql(l2_norm_py(vec)))}, "
        f"'cid', {int(cid)})"
        for cid, vec in centroids
    )
    return F.expr(
        f"slice(transform(reverse(array_sort(array({structs}))), "
        f"s -> s.cid), 1, {int(n_lists)})"
    )


def _centroids_frame(corpus: DataFrame, cents: list[tuple[int, list[float]]]):
    """The documented literal→broadcast cutover (see _assign_lists) as
    code: materialize the centroid set as ONE broadcast row holding an
    array<struct<cid,vec>> column, instead of baking O(n_centroids *
    dim) literals into every consuming expression. Attaching it is a
    single-row BroadcastNestedLoopJoin (the same single-row stats-term
    shape used throughout the catalog); the plan stays O(1) in the
    centroid count, so thousands of lists no longer blow up codegen.
    Sorted by cid so downstream index arithmetic is deterministic."""
    spark = corpus.sparkSession
    cdf = spark.createDataFrame(
        [(int(cid), [float(x) for x in vec]) for cid, vec in cents],
        "cid int, vec array<double>",
    )
    # 'nrm' rides the struct: the centroid's l2 norm folded ONCE here
    # (identical fold, identical doubles) instead of once per corpus
    # row per centroid inside the assignment lambda — Catalyst does no
    # CSE into HOF lambdas, so without it the n_centroids norm folds
    # re-ran for every assigned row. array_sort still orders by the
    # leading cid, so downstream index arithmetic is unchanged.
    cdf = cdf.select("cid", "vec", l2_norm(F.col("vec")).alias("nrm"))
    return F.broadcast(
        cdf.agg(
            F.array_sort(
                F.collect_list(F.struct("cid", "vec", "nrm"))
            ).alias("__cents")
        )
    )


def _assign_lists_col(
    vec_expr: Column,
    cents_col: Column,
    n_lists: int,
    vec_norm: Column | None = None,
) -> Column:
    """Column-driven twin of _assign_lists: rank centroids held in an
    array<struct<cid,vec,nrm>> COLUMN (broadcast-joined, not plan
    literals) by cosine to ``vec_expr``. Same ordering semantics —
    element 0 is the nearest centroid.

    The cosine is ``dot / (vec_norm * c.nrm)`` — the identical
    division tree cosine_similarity builds, with both norm folds
    hoisted OUT of the per-centroid lambda (no CSE into HOF lambdas):
    the centroid norm rides the broadcast struct and the caller
    stages the row vector's norm once per row via ``vec_norm``
    (falls back to an in-lambda fold when not staged). Bit-identical
    values; n_centroids× fewer folds per row."""
    nv = vec_norm if vec_norm is not None else l2_norm(vec_expr)
    scored = F.transform(
        cents_col,
        lambda c: F.struct(
            (dot(vec_expr, c["vec"]) / (nv * c["nrm"])).alias("cos"),
            c["cid"].alias("cid"),
        ),
    )
    ranked = F.reverse(F.array_sort(scored))
    return F.slice(F.transform(ranked, lambda s: s["cid"]), 1, n_lists)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    refine_iters: int = 1,
    centroid_strategy: str = "broadcast",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors are
    bucketed by nearest coarse centroid (k-means-refined, see
    ivf_centroids); each query searches only its ``n_probe`` nearest
    centroid lists.

    Plan shape: the default ``centroid_strategy="broadcast"`` attaches
    the centroid set as one broadcast-joined row (_centroids_frame):
    plan O(1) in the centroid count — the production mode, and the
    measured winner at EVERY index size (BENCH_NOTES round-4 A/B:
    literal re-pays whole-stage-codegen compilation of the embedded
    arrays per fresh plan, losing even at 16 centroids).
    ``centroid_strategy="literal"`` instead embeds the centroids as a
    literal-array expression on both sides (no join) — plan size grows
    O(n_centroids·dim, see _assign_lists); keep it only for a tiny
    index whose compiled plan is REUSED many times. Either way
    list membership becomes an equi-join key and the final top-k is
    the same WindowGroupLimit as the exact tier. Scan cost drops from
    O(|corpus|) to O(|corpus| * n_probe / n_centroids) per query;
    recall is tested against brute_force_topk.

    ``centroids`` accepts a pre-trained coarse quantizer (the output
    of ivf_centroids) so index BUILD and query SERVE can be timed and
    amortized separately — production trains once, serves many.
    """
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(corpus, id_col, vec_col, n_centroids, refine_iters)
    )
    cv = _as_double(F.col(vec_col))
    if centroid_strategy == "broadcast":
        cents_row = _centroids_frame(corpus, cents)
        # stage the cast vector, then its norm fold, ONCE per row (HOF
        # staging rule — the lambda would otherwise re-fold it per
        # centroid) before the per-centroid ranking
        c = (
            ensure_parallelism(corpus)
            .crossJoin(cents_row)
            .select(
                F.col(id_col).alias("neighbor_id"),
                cv.alias("cv"),
                F.col("__cents"),
            )
            .select(
                "neighbor_id", "cv", "__cents",
                l2_norm(F.col("cv")).alias("__nv"),
            )
            .select(
                "neighbor_id",
                "cv",
                F.col("__nv").alias("__nc"),
                _assign_lists_col(
                    F.col("cv"), F.col("__cents"), 1,
                    vec_norm=F.col("__nv"),
                )[0].alias("list_id"),
            )
        )
        q = F.broadcast(
            queries.crossJoin(cents_row)
            .select(
                F.col(id_col).alias("query_id"),
                cv.alias("qv"),
                F.col("__cents"),
            )
            .select(
                "query_id", "qv", "__cents",
                l2_norm(F.col("qv")).alias("__nv"),
            )
            .select(
                "query_id",
                "qv",
                F.col("__nv").alias("__nq"),
                F.explode(
                    _assign_lists_col(
                        F.col("qv"), F.col("__cents"), n_probe,
                        vec_norm=F.col("__nv"),
                    )
                ).alias("list_id"),
            )
        )
    elif centroid_strategy == "literal":
        # stage the double-cast vector as a named column, then rank
        # against it by name — _assign_lists is one parsed SQL
        # expression (construction-cost fix; identical values); the
        # staged __nv column hoists the row norm fold out of the
        # per-centroid literals
        c = (
            ensure_parallelism(corpus)
            .select(F.col(id_col).alias("neighbor_id"), cv.alias("cv"))
            .select("neighbor_id", "cv", l2_norm(F.col("cv")).alias("__nv"))
            .select(
                "neighbor_id",
                "cv",
                F.col("__nv").alias("__nc"),
                _assign_lists("`cv`", cents, 1, norm_sql="`__nv`")[0].alias(
                    "list_id"
                ),
            )
        )
        q = F.broadcast(
            queries.select(F.col(id_col).alias("query_id"), cv.alias("qv"))
            .select("query_id", "qv", l2_norm(F.col("qv")).alias("__nv"))
            .select(
                "query_id",
                "qv",
                F.col("__nv").alias("__nq"),
                F.explode(
                    _assign_lists("`qv`", cents, n_probe, norm_sql="`__nv`")
                ).alias("list_id"),
            )
        )
    else:
        raise ValueError(
            f"centroid_strategy must be 'literal' or 'broadcast', "
            f"got {centroid_strategy!r}"
        )
    # Each corpus row belongs to exactly one list and a query's probe
    # lists are distinct, so pairs are already unique — no dedup shuffle.
    # the carried __nq/__nc norms keep the verify cosine the IDENTICAL
    # division tree (dot / (norm_q * norm_c), same folds) while folding
    # each row's norm once instead of once per candidate pair
    scored = (
        c.join(q, "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / (F.col("__nq") * F.col("__nc")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# auto_planes sizing (round 13): target mean rows per sign bucket,
# and the clamp range for the derived per-band bit count. With 2^r
# buckets per band the expected candidate volume is ~bands * n^2 / 2^r,
# so holding n / 2^r at a constant LOAD keeps candidates ~linear in n.
LSH_AUTO_BUCKET_LOAD = 8
LSH_AUTO_MIN_PLANES = 3
LSH_AUTO_MAX_PLANES = 16


def auto_planes(
    n: int,
    load: int = LSH_AUTO_BUCKET_LOAD,
    lo: int = LSH_AUTO_MIN_PLANES,
    hi: int = LSH_AUTO_MAX_PLANES,
) -> int:
    """Corpus-size-aware sign bits per band: the smallest r with
    2^r * load >= n, clamped to [lo, hi] — integer-exact (no float
    log2), so an oracle can replay the identical rule in SQL. The r13
    sf1 spot gate measured why this must scale with n: at n=20,000 a
    FIXED r=3 (8 buckets/band) emitted 153M candidate pairs (the exact
    check spilled >80 GB and died), r=12 emits 979k — and a fixed r
    is a quadratic cliff at any corpus 100 TB implies."""
    r = lo
    while r < hi and (1 << r) * load < n:
        r += 1
    return r


def lsh_blocked_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int | str = "auto",
    bands: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs at scale: banded cosine-LSH blocking
    (OR-amplification) in front of the exact pair check.

    Each band is an independent ``n_planes``-bit sign bucket; a pair is
    a candidate if it collides in ANY band, then its exact cosine is
    verified. Per-band collision prob for similarity s is
    (1 - acos(s)/pi)^n_planes; any-band recall = 1-(1-p)^bands, and
    exact duplicates (s=1) collide in EVERY band at any plane count.
    The join stays an equi-join on (band, bucket): sum over buckets of
    b_i^2, never O(n^2).

    ``n_planes="auto"`` (default) sizes the per-band bit count from
    the corpus size with :func:`auto_planes` — one count() at plan
    build (column-pruned scan) buys candidate volume ~linear in n
    instead of n^2/2^r with fixed r (the r13 sf1 finding: fixed r=3
    at n=20k meant 153M candidate pairs and a >80 GB spill). Tune
    ``bands`` up for higher recall at the similarity you care about.

    Scale shape: the band join carries ONLY (id, band, bucket) — the
    candidate distinct is over slim id pairs, and the two vectors are
    equi-joined back per surviving pair for the exact check, so the
    widest shuffle is O(|candidates|) ids, not O(|candidates|) vector
    pairs (at dim=64 that is ~60x less shuffle than carrying va/vb
    through the dedup, which is what actually filled the disk)."""
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    if n_planes == "auto":
        n_planes = auto_planes(df.count())
    first = base.select(F.size("v").alias("d")).first()
    dim = first["d"] if first is not None else None
    banded = None
    for b in range(bands):
        bb = lsh_bucket(
            base,
            "v",
            n_planes=n_planes,
            seed=seed * 1000 + b,
            dim=dim,  # probed once, not once per band
            bucket_col="bucket",
        ).select("id", F.lit(b).alias("band"), "bucket")
        banded = bb if banded is None else banded.unionByName(bb)
    a = banded.alias("a")
    c = banded.alias("b")
    cand = (
        a.join(
            c,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])  # a pair may collide in several bands
    )
    # staged per-side norms: each id joins into many candidate pairs,
    # so the per-pair cosine otherwise re-folds both norms per pair;
    # dot / (na * nb) is the identical division tree (bit-identical)
    withn = base.select("id", "v", l2_norm(F.col("v")).alias("__n"))
    return (
        cand.join(
            withn.select(
                F.col("id").alias("id_a"),
                F.col("v").alias("va"),
                F.col("__n").alias("__na"),
            ),
            "id_a",
        )
        .join(
            withn.select(
                F.col("id").alias("id_b"),
                F.col("v").alias("vb"),
                F.col("__n").alias("__nb"),
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("va"), F.col("vb"))
                / (F.col("__na") * F.col("__nb")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q_i = floor(x_i / scale + 0.5) (explicit half-up — ``round`` has
    engine-specific half-tie rules, floor(+0.5) does not). Returns
    (id, scale, q, max_abs_err) where max_abs_err is the worst
    dequantization error of the vector.

    Pure row-local Catalyst projection — zero shuffle, codegen'd: the
    4x storage/bandwidth cut this buys an ANN index at 100 TB costs
    one scan. All-zero vectors quantize to zeros with scale 0.
    """
    # Stage the vector and its scale as columns: referencing the
    # aggregate-derived ``scale`` inside a transform lambda would
    # re-run the max|x| fold once per ELEMENT (O(dim^2) per row) —
    # Catalyst does no CSE into higher-order-function lambdas.
    vexpr = _as_double(F.col(vec_col))
    staged = df.select(
        F.col(id_col),
        vexpr.alias("__v"),
        (
            F.aggregate(vexpr, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
            / F.lit(127.0)
        ).alias("__scale"),
    )
    v, scale = F.col("__v"), F.col("__scale")
    q = F.when(
        scale > 0,
        F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    err = F.when(
        scale > 0,
        F.aggregate(
            F.zip_with(v, q, lambda x, qi: F.abs(qi * scale - x)),
            F.lit(0.0),
            lambda acc, e: F.greatest(acc, e),
        ),
    ).otherwise(F.lit(0.0))
    return staged.select(
        F.col(id_col),
        F.round(scale, 6).alias("scale"),
        q.alias("q"),
        F.round(err, 6).alias("max_abs_err"),
    )


def semdedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_clusters: int = 16,
    refine_iters: int = 1,
) -> DataFrame:
    """SemDedup (Abbas et al. 2023, arXiv:2303.09540): cluster
    embeddings with spherical k-means, then drop the higher-id member
    of every within-cluster pair whose cosine exceeds ``threshold``.

    The pair join is an equi-join on cluster id, so comparisons cost
    sum over clusters of b_i^2 instead of n^2 — the same
    blocked-join posture as lsh_blocked_pairs, with the blocks chosen
    semantically. Survivor rule is keep-lowest-id (deterministic).
    Returns the surviving (id, cluster_id) rows.
    """
    cents = ivf_centroids(corpus, id_col, vec_col, n_clusters, refine_iters)
    cv = _as_double(F.col(vec_col))
    # the staged __nv hoists the row norm fold out of the per-centroid
    # assignment AND out of the per-PAIR cosine below (the pair join
    # would otherwise re-fold both sides' norms once per compared
    # pair); dot / (nv_a * nv_b) is the identical division tree, so
    # every cosine is bit-identical
    assigned = (
        ensure_parallelism(corpus)
        .select(F.col(id_col).alias("id"), cv.alias("v"))
        .select("id", "v", l2_norm(F.col("v")).alias("__nv"))
        .select(
            "id",
            "v",
            "__nv",
            (
                _assign_lists("`v`", cents, 1, norm_sql="`__nv`")[0]
                if cents
                else F.lit(0)
            ).alias("cluster_id"),
        )
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    losers = (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(
            dot(F.col("a.v"), F.col("b.v"))
            / (F.col("a.__nv") * F.col("b.__nv"))
            >= F.lit(threshold)
        )
        .select(F.col("b.id").alias("id"))
        .distinct()
    )
    return assigned.join(losers, "id", "left_anti").select(
        F.col("id").alias(id_col), "cluster_id"
    )


def normalize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    truncate_dim: int | None = None,
) -> DataFrame:
    """L2-normalize embeddings, optionally after truncating to the
    first ``truncate_dim`` dimensions (Matryoshka-style: MRL-trained
    models keep most of their quality in a prefix of the vector, and
    a 4x dim cut is a 4x cut in every downstream join/shuffle/ANN
    byte count). Row-local projection, zero shuffle; zero vectors
    pass through unnormalized (norm 0 guard).

    Returns (id, unit, norm) where unit is the (truncated) unit
    vector rounded to 6dp and norm is the pre-normalization L2 norm.
    """
    vexpr = _as_double(F.col(vec_col))
    if truncate_dim is not None:
        vexpr = F.slice(vexpr, 1, truncate_dim)
    # stage v + norm as columns — a norm reference inside the
    # transform lambda would re-run the fold per element (O(dim^2))
    staged = df.select(
        F.col(id_col),
        vexpr.alias("__v"),
        F.sqrt(F.aggregate(vexpr, F.lit(0.0), lambda a, x: a + x * x)).alias(
            "__norm"
        ),
    )
    v, norm = F.col("__v"), F.col("__norm")
    unit = F.when(
        norm > 0, F.transform(v, lambda x: F.round(x / norm, 6))
    ).otherwise(F.transform(v, lambda x: x * 0.0))
    return staged.select(
        F.col(id_col),
        unit.alias("unit"),
        F.round(norm, 6).alias("norm"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed-code ANN (Jégou et al. 2011,
# "Product Quantization for Nearest Neighbor Search", IEEE TPAMI)
# ---------------------------------------------------------------------------


def pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 16,
    refine_iters: int = 1,
) -> list[list[tuple[int, list[float]]]]:
    """Deterministic per-subspace PQ codebooks: the vector is split
    into ``m`` contiguous subspaces; each subspace's ``n_codes``
    centroids are seeded from the sub-vectors of the ``n_codes``
    lowest-id corpus vectors, then refined by ``refine_iters``
    k-means (Lloyd) passes — assign every sub-vector to its nearest
    centroid by squared L2 (ties to the lower code id), recompute each
    centroid as the per-dimension mean of its members; empty codes
    keep their previous centroid. No RNG anywhere — the same
    deterministic convention as ivf_centroids, so the whole pipeline
    is replayable in SQL.

    Each pass is one distributed groupBy over the corpus (all m
    subspaces in a single exploded pass) plus a collect of
    O(n_codes * dim) floats — bounded metadata, never data-plane rows.
    Returns codebooks[j] = [(code, sub_vector)...].
    """
    rows = (
        corpus.select(F.col(id_col).alias("cid"), _as_double(F.col(vec_col)).alias("v"))
        .orderBy("cid")
        .limit(n_codes)
        .collect()
    )
    if not rows:
        return []
    dim = len(rows[0]["v"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    books = [
        [(i, list(r["v"])[j * sub : (j + 1) * sub]) for i, r in enumerate(rows)]
        for j in range(m)
    ]
    vexpr = _as_double(F.col(vec_col))
    for _ in range(max(refine_iters, 0)):
        # broadcast-joined codebooks for the assignment (see
        # ivf_centroids) — same argmin arithmetic, per-pass plan O(1)
        # in m·n_codes·sub_dim instead of a fresh literal compile
        staged = corpus.crossJoin(_codebooks_frame(corpus, books)).select(
            F.col("__books"),
            *[F.slice(vexpr, j * sub + 1, sub).alias(f"__s{j}") for j in range(m)]
        )
        per_sub = F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    _pq_assign_col(j)["code"].alias("code"),
                    F.col(f"__s{j}").alias("sv"),
                )
                for j in range(m)
            ]
        )
        means = (
            staged.select(F.explode(per_sub).alias("x"))
            .select("x.j", "x.code", "x.sv")
            .groupBy("j", "code")
            .agg(*[F.avg(F.col("sv")[d]).alias(f"d{d}") for d in range(sub)])
            .collect()
        )
        updated = [dict(b) for b in books]
        for r in means:  # codes that attracted no vectors keep their seed
            updated[r["j"]][r["code"]] = [r[f"d{d}"] for d in range(sub)]
        books = [sorted(u.items()) for u in updated]
    return books


def _codebooks_frame(
    corpus: DataFrame, codebooks: list[list[tuple[int, list[float]]]]
):
    """PQ codebooks as ONE broadcast row: ``__books`` is an
    array<struct<j, codes:array<struct<code, vec>>>> sorted by (j,
    code), so subspace j's centroid for code c sits at
    __books[j].codes[c] (1-based element_at). The broadcast twin of
    the literal tables in _pq_assign/_sub_d2 — same cutover rationale
    as _centroids_frame: plan stays O(1) in m·n_codes."""
    spark = corpus.sparkSession
    rows = [
        (j, int(code), [float(x) for x in vec])
        for j, cb in enumerate(codebooks)
        for code, vec in cb
    ]
    bdf = spark.createDataFrame(rows, "j int, code int, vec array<double>")
    per_j = bdf.groupBy("j").agg(
        F.array_sort(F.collect_list(F.struct("code", "vec"))).alias("codes")
    )
    return F.broadcast(
        per_j.agg(
            F.array_sort(F.collect_list(F.struct("j", "codes"))).alias("__books")
        )
    )


def _pq_assign_col(j: int) -> Column:
    """(code, d2) struct of the nearest sub-centroid for subspace ``j``
    from the staged ``__books`` codebook column and the staged
    sub-vector column ``__s{j}`` — broadcast twin of _pq_assign, same
    argmin-by-ascending-struct-sort tie semantics. One parsed SQL
    expression (the builder form cost ~2 HOF-builder py4j round-trips
    per subspace at plan construction); the parsed tree — transform to
    (d2, code) structs, ascending array_sort, element 0 — is identical,
    so results are unchanged."""
    from lambda_refarch_mapreduce_spark.functions.scalar import l2sq_sql

    return F.expr(
        f"array_sort(transform(element_at(__books, {j + 1}).codes, "
        f"c -> named_struct('d2', {l2sq_sql(f'`__s{j}`', 'c.vec')}, "
        "'code', c.code)))[0]"
    )


def _pq_assign(
    sub_name: str, codebook: list[tuple[int, list[float]]]
) -> Column:
    """(code, d2) struct of the nearest sub-centroid to the staged
    sub-vector column named ``sub_name`` — argmin via ascending struct
    sort, ties to the lower code id. Literal-codebook expression built
    as ONE parsed SQL string (the per-centroid builder loop cost ~2
    HOF-builder py4j round-trips per code — 6.2 s of pq_encode's plan
    construction at m=8, n_codes=16); repr()-rendered double literals
    round-trip bit-exactly, so the parsed tree and its results are
    identical. Same O(n_codes * sub_dim) plan-size cutover rule as
    _assign_lists."""
    from lambda_refarch_mapreduce_spark.functions.scalar import (
        array_sql,
        l2sq_sql,
    )

    structs = ", ".join(
        f"named_struct('d2', {l2sq_sql(sub_name, array_sql(vec))}, "
        f"'code', {int(cid)})"
        for cid, vec in codebook
    )
    return F.expr(f"array_sort(array({structs}))[0]")


def pq_encode(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 16,
    codebooks: list[list[tuple[int, list[float]]]] | None = None,
    codebook_strategy: str = "broadcast",
) -> DataFrame:
    """Encode vectors to ``m`` sub-codes (one byte each at n_codes <=
    256): a 4*dim-byte float vector becomes m bytes — a 32x scan-
    bandwidth cut at dim=64/m=8 — at the cost of quantization error.

    Row-local projection, zero shuffle. The default
    ``codebook_strategy="broadcast"`` adds one single-row broadcast to
    carry the codebooks as a column — plan O(1) in m·n_codes, the
    measured winner at every index size (BENCH_NOTES round-4 A/B);
    ``"literal"`` embeds them as plan literals instead (identical
    results, plan O(m·n_codes)) — only for a tiny codebook whose
    compiled plan is reused many times. Returns (id,
    codes, recon_err) where codes[j] is subspace j's nearest-centroid
    id and recon_err is the summed squared quantization error (the
    ADC self-distance).
    """
    if codebooks is None:
        codebooks = pq_codebooks(corpus, id_col, vec_col, m, n_codes)
    if not codebooks:
        return corpus.sparkSession.createDataFrame(
            [], f"{id_col} long, codes array<int>, recon_err double"
        )
    sub = len(codebooks[0][0][1])
    vexpr = _as_double(F.col(vec_col))
    staged = ensure_parallelism(corpus)
    if codebook_strategy == "broadcast":
        staged = staged.crossJoin(_codebooks_frame(corpus, codebooks))
    elif codebook_strategy != "literal":
        raise ValueError(
            f"codebook_strategy must be 'literal' or 'broadcast', "
            f"got {codebook_strategy!r}"
        )
    staged = staged.select(
        F.col(id_col),
        *(
            [F.col("__books")] if codebook_strategy == "broadcast" else []
        ),
        *[
            F.slice(vexpr, j * sub + 1, sub).alias(f"__s{j}")
            for j in range(len(codebooks))
        ],
    )
    if codebook_strategy == "broadcast":
        assigns = [
            _pq_assign_col(j).alias(f"__a{j}")
            for j in range(len(codebooks))
        ]
    else:
        assigns = [
            _pq_assign(f"`__s{j}`", cb).alias(f"__a{j}")
            for j, cb in enumerate(codebooks)
        ]
    staged2 = staged.select(F.col(id_col), *assigns)
    codes = F.array(*[F.col(f"__a{j}")["code"] for j in range(len(codebooks))])
    err = sum(
        (F.col(f"__a{j}")["d2"] for j in range(len(codebooks))), F.lit(0.0)
    )
    return staged2.select(
        F.col(id_col),
        codes.alias("codes"),
        F.round(err, 6).alias("recon_err"),
    )


def _adc_tables(
    codebooks: list[list[tuple[int, list[float]]]],
    codebook_strategy: str,
) -> Column:
    """ADC distance tables for one query row: ``__dt[j][c]`` = squared
    L2 between the query's subspace-j slice (staged as column
    ``__qj``) and centroid ``c`` of subspace j. Broadcast strategy
    reads the centroids from the ``__books`` column; literal strategy
    bakes them as ONE nested array Literal per subspace. Each entry is
    the same ``_l2sq`` fold the per-pair path used to evaluate, so
    every looked-up distance is bit-identical — the tables only move
    WHERE the fold runs (once per query on the broadcast side, instead
    of once per (corpus row, query) pair)."""
    from lambda_refarch_mapreduce_spark.functions.scalar import (
        array_sql,
        l2sq_sql,
    )

    def _tbl(jj: int, cb: list[tuple[int, list[float]]]) -> Column:
        if codebook_strategy == "broadcast":
            return F.expr(
                f"transform(element_at(__books, {jj + 1}).codes, "
                f"c -> {l2sq_sql(f'`__q{jj}`', 'c.vec')})"
            )
        nested = "array(" + ", ".join(array_sql(vec) for _cid, vec in cb) + ")"
        return F.expr(
            f"transform({nested}, cv -> {l2sq_sql(f'`__q{jj}`', 'cv')})"
        )

    return F.array(*[_tbl(j, cb) for j, cb in enumerate(codebooks)])


def _adc_dist(m: int) -> Column:
    """ADC distance from the precomputed tables: sum over subspaces of
    ``__dt[j][codes[j]]`` (1-based element_at; codes are 0-based).
    Same summation order (j ascending, seeded 0.0) as the direct
    per-pair fold sum, so the total is bit-identical."""
    return sum(
        (
            F.element_at(
                F.element_at(F.col("__dt"), j + 1),
                F.element_at(F.col("codes"), j + 1) + 1,
            )
            for j in range(m)
        ),
        F.lit(0.0),
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    codebook_strategy: str = "broadcast",
    codebooks: list[list[tuple[int, list[float]]]] | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ top-k: the corpus is scanned as
    m-byte codes (never raw floats), each query computes exact
    sub-distances to the looked-up sub-centroids, and the smallest
    summed approximate distance wins.

    The default ``codebook_strategy="broadcast"`` carries the
    codebooks as one broadcast-joined row (_codebooks_frame) for both
    the encode pass and the ADC lookups — plan O(1) in m·n_codes, the
    measured winner at every index size (BENCH_NOTES round-4 A/B);
    ``"literal"`` embeds them as plan literals (identical results) —
    only for a tiny, heavily-reused compiled plan.

    Plan shape: queries broadcast with their raw sub-vectors; the
    corpus side carries only (id, codes); per-pair cost is m literal
    array lookups + m sub-dim folds. PQ compresses the SCAN (32x
    here), it does not prune candidates — production ANN composes it
    with the IVF tier (IVF prunes lists, PQ compresses what is read;
    "IVFADC" in Jégou et al.). Ranking uses the 6dp-rounded distance
    (then neighbor id) so ranks are stable across engines.

    ``codebooks`` accepts pre-trained sub-quantizers (the output of
    pq_codebooks) so index BUILD and query SERVE time apart.

    Returns (query_id, neighbor_id, dist2, rank), dist2 ascending.
    """
    if codebooks is None:
        codebooks = pq_codebooks(corpus, id_col, vec_col, m, n_codes)
    if not codebooks:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, dist2 double, rank long"
        )
    sub = len(codebooks[0][0][1])
    coded = pq_encode(
        corpus, id_col, vec_col, m, n_codes, codebooks, codebook_strategy
    ).select(F.col(id_col).alias("neighbor_id"), "codes")
    vexpr = _as_double(F.col(vec_col))
    q = queries
    if codebook_strategy == "broadcast":
        q = q.crossJoin(_codebooks_frame(corpus, codebooks))
    # classic ADC distance TABLES (Jégou et al. 2011 §III.B):
    # per (query, subspace) the d2 to each of the n_codes centroids is
    # precomputed ONCE on the (tiny, broadcast) query side — __dt[j][c]
    # — so the per-(corpus row, query) cost in the join below is m
    # array lookups + adds instead of m sub-dim folds. The fold that
    # fills the table is the identical _l2sq expression the per-pair
    # path evaluated, summed in the same j order, so dist2 is
    # bit-identical; the broadcast also slims to (query_id, __dt).
    staged_q = q.select(
        F.col(id_col).alias("query_id"),
        *(
            [F.col("__books")]
            if codebook_strategy == "broadcast"
            else []
        ),
        *[
            F.slice(vexpr, j * sub + 1, sub).alias(f"__q{j}")
            for j in range(len(codebooks))
        ],
    )
    dt = _adc_tables(codebooks, codebook_strategy)
    q = F.broadcast(staged_q.select("query_id", dt.alias("__dt")))
    dist = _adc_dist(len(codebooks))
    scored = (
        coded.join(q, F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dist, 6).alias("dist2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist2").asc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivfadc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    refine_iters: int = 1,
    codebook_strategy: str = "broadcast",
) -> DataFrame:
    """IVFADC (Jégou et al. 2011 §IV): IVF coarse lists PRUNE the scan,
    PQ codes COMPRESS what is read — the production ANN composition.

    One corpus pass emits (id, list_id, codes): coarse assignment and
    PQ encoding share the same projection, so at 100 TB the float
    vectors are read once and the searchable index is
    ~(8 + 1 + m) bytes/vector. Queries broadcast with raw sub-vectors
    and probe ``n_probe`` lists; per-pair cost is m table lookups + m
    sub-dim folds on a corpus slice of n_probe/n_centroids.

    This variant quantizes RAW vectors, not residuals (v - centroid):
    residual encoding is the classic accuracy refinement but couples
    the codebooks to the coarse quantizer; plan shape is identical.
    Ranking uses the 6dp-rounded distance (then neighbor id), matching
    pq_topk's cross-engine rank stability. ``codebook_strategy=
    "broadcast"`` carries BOTH the coarse centroids and the PQ
    codebooks as single broadcast rows (plan O(1) in n_centroids and
    m·n_codes) — identical results.

    Returns (query_id, neighbor_id, dist2, rank).
    """
    cents = ivf_centroids(corpus, id_col, vec_col, n_centroids, refine_iters)
    books = pq_codebooks(corpus, id_col, vec_col, m, n_codes, refine_iters)
    if not cents or not books:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, dist2 double, rank long"
        )
    coded = ivfadc_encode(
        corpus, cents, books, id_col, vec_col, codebook_strategy
    )
    return ivfadc_search(
        coded, queries, cents, books, id_col, vec_col, k, n_probe,
        codebook_strategy,
    )


def ivfadc_encode(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook_strategy: str = "broadcast",
) -> DataFrame:
    """The IVFADC index-build pass: one projection over the raw
    vectors emits (neighbor_id, list_id, codes) — coarse assignment
    and PQ encoding share the scan, so the float vectors are read
    exactly once and the searchable index is ~(8 + 1 + m)
    bytes/vector. Centroids/codebooks are FROZEN inputs (train with
    ivf_centroids / pq_codebooks), which is what lets a streaming
    ingest (streaming/ann.py) encode micro-batches incrementally
    against a stable index layout."""
    if not centroids or not codebooks:
        raise ValueError(
            "ivfadc_encode needs non-empty trained quantizers: got "
            f"{len(centroids or [])} centroids, "
            f"{len(codebooks or [])} codebooks (train with "
            "ivf_centroids / pq_codebooks on a non-empty corpus)"
        )
    if codebook_strategy not in ("literal", "broadcast"):
        raise ValueError(
            f"codebook_strategy must be 'literal' or 'broadcast', "
            f"got {codebook_strategy!r}"
        )
    bcast = codebook_strategy == "broadcast"
    sub = len(codebooks[0][0][1])
    vexpr = _as_double(F.col(vec_col))
    corpus_side = ensure_parallelism(corpus)
    if bcast:
        corpus_side = corpus_side.crossJoin(
            _centroids_frame(corpus, centroids)
        ).crossJoin(_codebooks_frame(corpus, codebooks))
    # stage the double-cast vector once, then assign/slice by name —
    # the literal assign is one parsed SQL expression (construction-
    # cost fix; identical values), and the cast no longer re-runs per
    # consuming expression
    corpus_side = corpus_side.withColumn("__dv", vexpr).withColumn(
        "__nv", l2_norm(F.col("__dv"))
    )
    if bcast:
        assign = _assign_lists_col(
            F.col("__dv"), F.col("__cents"), 1, vec_norm=F.col("__nv")
        )
    else:
        assign = _assign_lists("`__dv`", centroids, 1, norm_sql="`__nv`")
    staged = corpus_side.select(
        F.col(id_col).alias("neighbor_id"),
        *([F.col("__books")] if bcast else []),
        assign[0].alias("list_id"),
        *[
            F.slice(F.col("__dv"), j * sub + 1, sub).alias(f"__s{j}")
            for j in range(len(codebooks))
        ],
    )
    if bcast:
        code_arr = F.array(
            *[
                _pq_assign_col(j)["code"]
                for j in range(len(codebooks))
            ]
        )
    else:
        code_arr = F.array(
            *[
                _pq_assign(f"`__s{j}`", codebooks[j])["code"]
                for j in range(len(codebooks))
            ]
        )
    return staged.select("neighbor_id", "list_id", code_arr.alias("codes"))


def ivfadc_search(
    coded: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
    codebook_strategy: str = "broadcast",
) -> DataFrame:
    """The IVFADC serve pass over a pre-encoded index ``coded`` =
    (neighbor_id, list_id, codes): queries broadcast with raw
    sub-vectors, probe ``n_probe`` lists, ADC-score only the pruned
    code rows, WindowGroupLimit top-k. The index side never touches
    raw floats — the m-byte codes ARE the scan."""
    if not centroids or not codebooks:
        raise ValueError(
            "ivfadc_search needs non-empty trained quantizers: got "
            f"{len(centroids or [])} centroids, "
            f"{len(codebooks or [])} codebooks (train with "
            "ivf_centroids / pq_codebooks on a non-empty corpus)"
        )
    if codebook_strategy not in ("literal", "broadcast"):
        raise ValueError(
            f"codebook_strategy must be 'literal' or 'broadcast', "
            f"got {codebook_strategy!r}"
        )
    bcast = codebook_strategy == "broadcast"
    sub = len(codebooks[0][0][1])
    vexpr = _as_double(F.col(vec_col))
    query_side = queries
    if bcast:
        query_side = query_side.crossJoin(
            _centroids_frame(queries, centroids)
        ).crossJoin(_codebooks_frame(queries, codebooks))
    # stage the double-cast vector once (see ivfadc_encode)
    query_side = query_side.withColumn("__dv", vexpr).withColumn(
        "__nv", l2_norm(F.col("__dv"))
    )
    if bcast:
        probe = _assign_lists_col(
            F.col("__dv"), F.col("__cents"), n_probe, vec_norm=F.col("__nv")
        )
    else:
        probe = _assign_lists("`__dv`", centroids, n_probe, norm_sql="`__nv`")
    # ADC tables precomputed per query BEFORE the probe explode (they
    # do not depend on list_id), so each table is built once per query,
    # not once per probe — see _adc_tables for the bit-identity note
    staged_q = query_side.select(
        F.col(id_col).alias("query_id"),
        *([F.col("__books")] if bcast else []),
        probe.alias("__probe"),
        *[
            F.slice(F.col("__dv"), j * sub + 1, sub).alias(f"__q{j}")
            for j in range(len(codebooks))
        ],
    )
    dt = _adc_tables(codebooks, codebook_strategy)
    # stage __dt as a column BELOW the explode (Generate replicates the
    # computed value; computing dt beside the explode would re-evaluate
    # it once per probe row)
    with_dt = staged_q.select("query_id", F.col("__probe"), dt.alias("__dt"))
    q = F.broadcast(
        with_dt.select(
            "query_id",
            F.explode(F.col("__probe")).alias("list_id"),
            "__dt",
        )
    )
    dist = _adc_dist(len(codebooks))
    # corpus vector lives in exactly one list and a query's probe lists
    # are distinct -> (query, neighbor) pairs already unique, no dedup
    scored = (
        coded.join(q, "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(dist, 6).alias("dist2"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist2").asc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    shortlist: int = 20,
    m: int = 8,
    n_codes: int = 16,
) -> DataFrame:
    """Two-stage retrieval — the production ANN serving shape: a cheap
    ADC pass over m-byte PQ codes shortlists ``shortlist`` candidates
    per query, then ONLY those candidates are reranked with exact
    squared-L2 against raw vectors. Approximation error is confined to
    which vectors make the shortlist; the returned distances and
    ordering are exact.

    Scale shape: stage 1 is pq_topk's compressed scan (corpus read as
    codes, never floats); the candidate set (queries x shortlist rows,
    ids only) broadcasts into a hash join against the corpus, so the
    raw-vector scan in stage 2 touches every corpus partition once but
    materializes only shortlist hits. No corpus shuffle in either
    stage. Ranking uses the 6dp-rounded exact distance (then neighbor
    id) for cross-engine rank stability.

    Returns (query_id, neighbor_id, dist2, rank) with exact dist2.
    """
    cand = pq_topk(
        corpus, queries, id_col, vec_col, k=shortlist, m=m, n_codes=n_codes
    ).select("query_id", "neighbor_id")
    nvec = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("__nv")
    )
    qvec = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("__qv")
        )
    )
    exact = (
        nvec.join(F.broadcast(cand), "neighbor_id")
        .join(qvec, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("__qv"), F.col("__nv"), lambda x, y: (x - y) * (x - y)
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                6,
            ).alias("dist2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist2").asc(), F.col("neighbor_id").asc()
    )
    return exact.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def group_centroids(
    vectors: DataFrame,
    labels: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_id_col: str = "doc_id",
    label_col: str = "lang",
    dim: int | None = None,
) -> DataFrame:
    """Per-group mean embedding — the topic/domain centroid summary a
    curation dashboard shows next to corpus_stats_report, and the seed
    step for supervised SemDedup-style per-class pruning.

    Plan shape: the label join keys on ids (AQE picks broadcast for a
    dim-table-sized label side); the mean is computed as ``dim`` fixed
    aggregate buffers (one avg per component) with map-side combine —
    the corpus is NEVER exploded to (row x dim) rows; only the
    |groups|-row result unpivots to (group, dim, value) for output.
    ``dim`` defaults to a one-row probe (bounded metadata).

    Returns (group, dim, centroid_val, n_vectors).
    """
    if dim is None:
        probe = vectors.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
        if not probe:
            return vectors.sparkSession.createDataFrame(
                [], "group string, dim int, centroid_val double, n_vectors bigint"
            )
        dim = probe[0]["d"]
    v = _as_double(F.col(vec_col))
    joined = ensure_parallelism(vectors).select(
        F.col(id_col).alias("id"), v.alias("__v")
    ).join(
        labels.select(
            F.col(label_id_col).alias("id"), F.col(label_col).alias("group")
        ),
        "id",
    )
    per = joined.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        *[F.avg(F.col("__v")[i]).alias(f"__d{i}") for i in range(dim)],
    )
    arr = F.array(*[F.col(f"__d{i}") for i in range(dim)])
    return per.select(
        "group", "n_vectors", F.posexplode(arr).alias("dim", "__val")
    ).select(
        "group",
        F.col("dim").cast("int").alias("dim"),
        F.round("__val", 6).alias("centroid_val"),
        "n_vectors",
    )


def negative_samples(
    df: DataFrame,
    id_col: str = "vec_id",
    k: int = 4,
    seed: int = 0,
    n_buckets: int = 16,
) -> DataFrame:
    """Deterministic random negative sampling for contrastive training
    (in-batch negatives made reproducible): each anchor gets ``k``
    pseudo-random partners drawn corpus-wide via the portable md5 hash
    family — the same (seed, anchor, slot) always yields the same
    negative, across runs, partition counts and engines.

    Plan shape: ids are dealt into ``n_buckets`` hash buckets with a
    dense within-bucket index (one bucket-keyed window shuffle of
    fixed-width rows); bucket sizes broadcast (n_buckets rows); each
    (anchor, slot) computes its target (bucket, index) row-locally and
    equi-joins the bucket-index table — never an array payload, never
    a cross join. Size n_buckets ~ corpus/1000 at scale so the window
    sort stays partition-local. Anchors that hash onto THEMSELVES are
    dropped (self-pairs are useless as negatives), so an anchor may
    get k-1 rows; re-probing instead would bias toward bucket
    neighbors.

    Returns (id, slot, negative_id).
    """
    from lambda_refarch_mapreduce_spark.operators.dedup import salted_hash

    from pyspark.sql.window import Window

    ids = df.select(F.col(id_col).alias("id"))
    bucketed = ids.withColumn(
        "bucket", F.pmod(salted_hash(F.col("id").cast("string"), seed), n_buckets)
    )
    w = Window.partitionBy("bucket").orderBy("id")
    indexed = bucketed.withColumn("idx", F.row_number().over(w) - 1)
    sizes = F.broadcast(
        indexed.groupBy("bucket").agg(F.count(F.lit(1)).alias("bsize"))
    )
    slots = ids.select(
        "id", F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("slot")
    )
    probe = F.concat_ws(":", F.col("id").cast("string"), F.col("slot").cast("string"))
    targets = (
        slots.withColumn("bucket", F.pmod(salted_hash(probe, seed + 1), n_buckets))
        .join(sizes, "bucket")
        .withColumn("idx", F.pmod(salted_hash(probe, seed + 2), F.col("bsize")))
    )
    neg = indexed.select(
        "bucket", "idx", F.col("id").alias("negative_id")
    )
    return (
        targets.join(neg, ["bucket", "idx"])
        .filter(F.col("negative_id") != F.col("id"))
        .select(F.col("id").alias(id_col), "slot", "negative_id")
    )


def _mmr_score_expr(lam: float) -> str:
    """The MMR objective as ONE expression string over columns
    (__rel, __ms) — shared textually with the DuckDB oracle so both
    engines fold the identical IEEE tree, including the (1e0 - λ)
    subtraction (precomputing 1-λ in Python would bake a DIFFERENT
    double than the SQL text evaluates)."""
    lam_sql = f"{lam!r}e0"
    return f"({lam_sql} * __rel - (1e0 - {lam_sql}) * __ms)"


def mmr_rerank(
    candidates: DataFrame,
    id_col: str = "neighbor_id",
    vec_col: str = "cv",
    rel_col: str = "cosine",
    k: int = 5,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) over a BOUNDED candidate frame — the diversity pass every
    retrieval stack runs after top-N: greedily pick the candidate
    maximizing λ·rel(d, q) − (1−λ)·max_{s∈S} sim(d, s), so near-
    duplicate neighbors stop crowding out coverage. The first pick
    uses max-sim = 0 (empty S) through the SAME score expression.

    Scale posture: this operator is the RERANK stage — candidates are
    the output of a scalable retrieval (brute_force_topk / ivf_topk /
    pq_topk), so |C| is a serving constant (tens), the |C|² pairwise
    sim frame is metadata, and the k greedy rounds are lazy DataFrame
    compositions over those tiny frames — no collect, no Python loop
    over rows, nothing corpus-sized anywhere. rel and pairwise sims
    are rounded to 6dp BEFORE scoring (the catalog's cross-engine
    float convention), so the greedy argmax (score desc, id asc) is
    deterministic and engine-portable. Returns (pick, id, rel,
    mmr_score) — pick = 0..k-1 in selection order. k is clamped to
    the candidate count (k <= 0 and an empty frame raise)."""
    if k <= 0:
        raise ValueError(f"mmr_rerank: k must be positive, got {k}")
    c = candidates.select(
        F.col(id_col).alias("__id"),
        _as_double(F.col(vec_col)).alias("__v"),
        F.col(rel_col).alias("__rel"),
    )
    a = c.select(F.col("__id").alias("__ia"), F.col("__v").alias("__va"))
    b = c.select(F.col("__id").alias("__ib"), F.col("__v").alias("__vb"))
    # materialize the candidate frame and its |C|² sim matrix once —
    # serving-constant metadata every greedy round re-reads; left
    # lazy, each pick job would re-run the whole retrieval lineage
    sims = (
        a.join(b, F.col("__ia") != F.col("__ib"))
        .select(
            "__ia",
            "__ib",
            F.round(
                cosine_similarity(F.col("__va"), F.col("__vb")), 6
            ).alias("__sim"),
        )
        .localCheckpoint(eager=True)
    )
    score = _mmr_score_expr(lam)
    base = c.select("__id", "__rel").localCheckpoint(eager=True)
    # candidates are serving-constant metadata (already checkpointed),
    # so clamping k to the realized count is one cheap count — without
    # it, k > |C| burns empty one-row jobs and silently under-returns
    k = min(k, base.count())
    if k == 0:
        raise ValueError("mmr_rerank: candidate frame is empty")
    selected = None
    remaining = base
    for i in range(k):
        if selected is None:
            scored = remaining.withColumn("__ms", F.lit(0.0))
        else:
            sel_ids = selected.select(F.col("__id").alias("__sid"))
            vs_sel = sims.join(
                sel_ids, sims["__ib"] == F.col("__sid"), "left_semi"
            )
            scored = (
                remaining.join(
                    vs_sel, remaining["__id"] == vs_sel["__ia"]
                )
                .groupBy(remaining["__id"].alias("__id"), "__rel")
                .agg(F.max("__sim").alias("__ms"))
            )
        # Each pick is data-dependent on every previous pick, and it
        # is referenced three times downstream (selected-set, semi-
        # join probe, remaining anti-join): left lazy, the recursion
        # re-evaluates ~3^k times (measured 20 s at k=5 on 20
        # candidates). localCheckpoint materializes each ONE-ROW
        # decision — k tiny jobs over serving metadata, the inherent
        # cost of a sequential greedy, not a corpus-sized eager stage.
        pick = (
            scored.withColumn("__score", F.expr(score))
            .orderBy(F.col("__score").desc(), F.col("__id"))
            .limit(1)
            .select("__id", "__rel", "__score")
            .withColumn("pick", F.lit(i))
            .localCheckpoint(eager=True)
        )
        selected = pick if selected is None else selected.unionByName(pick)
        remaining = remaining.join(
            pick.select("__id"), "__id", "left_anti"
        )
    return selected.select(
        F.col("pick").cast("int").alias("pick"),
        F.col("__id").alias(id_col),
        F.col("__rel").alias("rel"),
        F.round(F.col("__score"), 6).alias("mmr_score"),
    )
