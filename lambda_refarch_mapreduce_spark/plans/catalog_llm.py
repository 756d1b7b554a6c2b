"""LLM-data-pipeline query catalog: dedup, similarity search, text
analysis, multimodal plumbing, streaming-equivalent windows.

Every hash-based operator (MinHash-LSH, SimHash) uses the portable
md5-derived hash family from operators.dedup, so the DuckDB oracle
reproduces signatures *bit-for-bit* — these are exact correctness
checks, not just row counts. The SQL here is long because it re-derives
the same signatures arithmetically; the constants (n-gram n, k, bands)
are shared with the Spark side via this module's parameters.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lambda_refarch_mapreduce_spark.operators import (
    dedup,
    multimodal,
    relational,
    similarity,
    text,
)
from lambda_refarch_mapreduce_spark.plans.catalog import register, _t
from lambda_refarch_mapreduce_spark.streaming.events import windowed_agg

# Shared constants — referenced by both Spark programs and oracle SQL.
NGRAM_N = 3
MINHASH_K = 16
MINHASH_BANDS = 4
JACCARD_THRESHOLD = 0.3
SIMHASH_BITS = 60
SIMHASH_BANDS = 6
SIMHASH_MAX_HAMMING = 5  # <= bands-1 → banding is exact (pigeonhole)
NEARDUP_COSINE = 0.4
TOPK_K = 5
TOPK_QUERY_MAX_ID = 20

# --- shared DuckDB SQL fragments -------------------------------------------

_SQL_TOKENS = r"list_filter(string_split_regex(text, '\s+'), x -> x <> '')"

_SQL_SHINGLES = (
    "list_distinct(list_transform(range(1, greatest(len(w) - {nm1}, 0) + 1), "
    "i -> {joined}))"
).format(
    nm1=NGRAM_N - 1,
    joined=" || ' ' || ".join(f"w[i + {j}]" if j else "w[i]" for j in range(NGRAM_N)),
)

_SQL_TOK_CTE = f"tok AS (SELECT doc_id AS id, {_SQL_TOKENS} AS w FROM documents)"
_SQL_SH_CTE = f"sh AS (SELECT id, unnest({_SQL_SHINGLES}) AS shingle FROM tok)"
_SQL_SIZES_CTE = "sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id)"


def _sql_salted_hash(expr: str, seed: int) -> str:
    return f"('0x' || substr(md5('s{seed}:' || {expr}), 1, 15))::BIGINT"


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
        SELECT md5(text) AS content_md5,
               min(doc_id) AS keep_id,
               count(*)::BIGINT AS n_copies
        FROM documents GROUP BY 1
    """,
    tags=("llm", "dedup"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: groupBy content digest (shuffles 32-byte hashes,
    not document bodies)."""
    return dedup.exact_duplicates(_t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
        WITH {_SQL_TOK_CTE}, {_SQL_SH_CTE}, {_SQL_SIZES_CTE},
        inter AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS ninter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
            GROUP BY 1, 2)
        SELECT id_a, id_b,
               round(ninter * 1.0 / (sa.n + sb.n - ninter), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE ninter * 1.0 / (sa.n + sb.n - ninter) >= {JACCARD_THRESHOLD}
    """,
    tags=("llm", "dedup"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard over a shingle inverted
    index (equi-join on shingle — no cross join)."""
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", NGRAM_N, JACCARD_THRESHOLD
    )


WINNOW_WINDOW = 4


def _winnow_oracle() -> str:
    n, w = NGRAM_N, WINNOW_WINDOW
    joined = " || ' ' || ".join(
        f"w[i + {j}]" if j else "w[i]" for j in range(n)
    )
    grams = (
        f"list_transform(range(1, greatest(len(w) - {n - 1}, 0) + 1), "
        f"i -> {joined})"
    )
    h = _sql_salted_hash("g", dedup.WINNOW_SEED)
    return f"""
        WITH t AS (SELECT doc_id AS id, {_SQL_TOKENS} AS w FROM documents),
        g0 AS (SELECT id, {grams} AS grams FROM t),
        h0 AS (SELECT id, list_transform(grams, g -> {h}) AS h FROM g0),
        sel AS (SELECT id,
                       CASE WHEN len(h) - {w - 1} >= 1 THEN
                           list_distinct(list_transform(
                               range(1, len(h) - {w - 1} + 1),
                               j -> list_min(h[j : j + {w - 1}])))
                       WHEN len(h) >= 1 THEN [list_min(h)]
                       ELSE [] END AS fps
                FROM h0)
        SELECT id AS doc_id, unnest(fps) AS fingerprint FROM sel
    """


@register(
    "dedup_winnow_fingerprints",
    oracle=_winnow_oracle(),
    tags=("llm", "dedup"),
)
def dedup_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (operators.dedup.winnow_fingerprints,
    Schleimer et al. 2003 / MOSS): per-window minimum of positional
    n-gram hashes — guaranteed shared fingerprint for any shared run
    of window+n-1 tokens, at ~2/(window+1) density. Row-local
    selection over the portable hash family; the oracle replays the
    identical window minima."""
    out = dedup.winnow_fingerprints(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        NGRAM_N, WINNOW_WINDOW,
    )
    return out.select(F.col("id").alias("doc_id"), "fingerprint")


WINNOW_MIN_SHARED = 2


@register(
    "dedup_winnow_pairs",
    oracle=f"""
        WITH fps AS ({_winnow_oracle()})
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               count(*)::BIGINT AS shared_fingerprints
        FROM fps a JOIN fps b
          ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= {WINNOW_MIN_SHARED}
    """,
    tags=("llm", "dedup"),
)
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS match step (operators.dedup.winnow_overlap_pairs): pairs
    sharing >= WINNOW_MIN_SHARED winnowed fingerprints — local-passage
    overlap candidates at a tunable posting density, found with the
    same inverted-index equi-join shape as every other pair tier."""
    out = dedup.winnow_overlap_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        NGRAM_N, WINNOW_WINDOW, WINNOW_MIN_SHARED,
    )
    return out.select(
        "id_a", "id_b", F.col("shared_fingerprints").cast("long").alias(
            "shared_fingerprints"
        )
    )


CONTAINMENT_THRESHOLD = 0.5


@register(
    "dedup_ngram_containment",
    oracle=f"""
        WITH {_SQL_TOK_CTE}, {_SQL_SH_CTE}, {_SQL_SIZES_CTE},
        inter AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS ninter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
            GROUP BY 1, 2)
        SELECT id_a, id_b,
               round(greatest(ninter * 1.0 / sa.n, ninter * 1.0 / sb.n), 6)
                   AS containment,
               CASE WHEN ninter * 1.0 / sa.n >= ninter * 1.0 / sb.n
                    THEN 'a' ELSE 'b' END AS contained
        FROM inter
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE greatest(ninter * 1.0 / sa.n, ninter * 1.0 / sb.n)
                  >= {CONTAINMENT_THRESHOLD}
    """,
    tags=("llm", "dedup"),
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs (operators.dedup.
    ngram_containment_pairs, Broder 1997): |A∩B|/min-side size catches
    excerpt/boilerplate inclusion that symmetric Jaccard misses. Same
    two-shuffle inverted-index plan as the Jaccard tier."""
    return dedup.ngram_containment_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        NGRAM_N, CONTAINMENT_THRESHOLD,
    )


# Shared recursive-CTE prefix: n-gram Jaccard pairs -> undirected edges
# -> transitive closure -> (doc_id, cluster_id) components.
_SQL_COMP_CTES = f"""
        WITH RECURSIVE {_SQL_TOK_CTE}, {_SQL_SH_CTE}, {_SQL_SIZES_CTE},
        inter AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS ninter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
            GROUP BY 1, 2),
        pairs AS (
            SELECT id_a, id_b
            FROM inter
            JOIN sizes sa ON sa.id = id_a
            JOIN sizes sb ON sb.id = id_b
            WHERE ninter * 1.0 / (sa.n + sb.n - ninter) >= {JACCARD_THRESHOLD}),
        edges AS (
            SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
        reach(a, b) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b),
        comp AS (
            SELECT a AS doc_id, least(a, min(b)) AS cluster_id
            FROM reach GROUP BY a)
"""


@register(
    "dedup_clusters",
    oracle=f"""
        {_SQL_COMP_CTES}
        SELECT doc_id, cluster_id,
               count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        FROM comp
    """,
    tags=("llm", "dedup"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters: n-gram Jaccard pair graph →
    connected components (iterative min-label propagation; the oracle
    re-derives components with a recursive CTE). One row per clustered
    doc with its component id and size — the input to keep-one-per-
    cluster corpus pruning."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", NGRAM_N, JACCARD_THRESHOLD)
    cc = dedup.connected_components(pairs)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
    ).withColumn(
        "cluster_size", F.count(F.lit(1)).over(Window.partitionBy("cluster_id"))
    )


@register(
    "dedup_cluster_survivors",
    oracle=f"""
        {_SQL_COMP_CTES}
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN
              (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)
    """,
    tags=("llm", "dedup"),
)
def dedup_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitively-correct corpus pruning: keep exactly one doc (the
    min id) per near-dup cluster. Strictly stronger than the pairwise
    keep-first policy (dedup_survivors), which can retain two docs
    that only share content through a third. Anti-join of the corpus
    against non-canonical cluster members — the edge-set-sized side,
    so the join is broadcastable at production dup rates."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", NGRAM_N, JACCARD_THRESHOLD)
    cc = dedup.connected_components(pairs)
    non_canonical = cc.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias("doc_id")
    )
    return docs.join(
        F.broadcast(non_canonical), "doc_id", "left_anti"
    ).select("doc_id")


# Eval-set decontamination: the "benchmark" is a deterministic slice of
# the documents table (doc_id % 53 == 0, ~2%) standing in for a held-out
# eval corpus; every other doc is scored against it.
DECONTAM_BENCH_MOD = 53
DECONTAM_THRESHOLD = 0.05


@register(
    "decontaminate_vs_benchmark",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id AS id, {_SQL_TOKENS} AS w,
                   doc_id % {DECONTAM_BENCH_MOD} = 0 AS is_bench
            FROM documents),
        allsh AS (
            SELECT id, is_bench, unnest({_SQL_SHINGLES}) AS shingle FROM tok),
        bsh AS (SELECT DISTINCT shingle FROM allsh WHERE is_bench)
        SELECT s.id AS doc_id,
               count(*)::BIGINT AS n_shingles,
               sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                   AS n_overlap,
               round(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 6) AS contamination,
               sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                     * 1.0 / count(*) >= {DECONTAM_THRESHOLD}
                   AS is_contaminated
        FROM (SELECT * FROM allsh WHERE NOT is_bench) s
        LEFT JOIN bsh b USING (shingle)
        GROUP BY s.id
    """,
    tags=("llm", "dedup", "decontam"),
)
def decontaminate_vs_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: per-doc n-gram overlap fraction against
    a benchmark slice, flagging docs above the leak threshold. The
    benchmark's distinct shingles broadcast (eval sets are tiny);
    the corpus side never shuffles — see dedup.contamination_overlap."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % DECONTAM_BENCH_MOD == 0)
    rest = docs.filter(F.col("doc_id") % DECONTAM_BENCH_MOD != 0)
    return dedup.contamination_overlap(
        rest, bench, "doc_id", "text", "doc_id", "text",
        NGRAM_N, DECONTAM_THRESHOLD,
    ).withColumnRenamed("id", "doc_id")


def _minhash_oracle() -> str:
    from lambda_refarch_mapreduce_spark.operators.dedup import (
        MINHASH_P,
        minhash_coeffs,
    )

    k, bands = MINHASH_K, MINHASH_BANDS
    rpb = k // bands
    mh_terms = []
    for i in range(k):
        a, b, c = minhash_coeffs(i)
        mh_terms.append(f"min(({a} * h1 + {b} * h2 + {c}) % {MINHASH_P}) AS mh{i}")
    mh_cols = ", ".join(mh_terms)
    hsh_cte = (
        "hsh AS (SELECT id, "
        f"('0x' || substr(md5(shingle), 1, 15))::BIGINT % {MINHASH_P} AS h1, "
        f"('0x' || substr(md5(shingle), 16, 15))::BIGINT % {MINHASH_P} AS h2 "
        "FROM sh)"
    )
    band_selects = []
    for b in range(bands):
        cols = " || '|' || ".join(
            f"mh{b * rpb + r}::VARCHAR" for r in range(rpb)
        )
        band_selects.append(
            f"SELECT id, {b} AS band, md5({cols}) AS bkey FROM sig"
        )
    banded = " UNION ALL ".join(band_selects)
    return f"""
        WITH {_SQL_TOK_CTE}, {_SQL_SH_CTE}, {_SQL_SIZES_CTE}, {hsh_cte},
        sig AS (SELECT id, {mh_cols} FROM hsh GROUP BY id),
        banded AS ({banded}),
        cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM banded a
            JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id),
        inter AS (
            SELECT c.id_a, c.id_b, count(*) AS ninter
            FROM cand c
            JOIN sh a ON a.id = c.id_a
            JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
            GROUP BY 1, 2)
        SELECT id_a, id_b,
               round(ninter * 1.0 / (sa.n + sb.n - ninter), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE ninter * 1.0 / (sa.n + sb.n - ninter) >= {JACCARD_THRESHOLD}
    """


@register("dedup_minhash_lsh", oracle=_minhash_oracle(), tags=("llm", "dedup"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup: salted-md5 signatures → bands → candidate
    equi-join → exact-Jaccard verification. The oracle re-derives the
    identical signatures, so the candidate set matches bit-for-bit."""
    return dedup.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=NGRAM_N,
        k=MINHASH_K,
        bands=MINHASH_BANDS,
        threshold=JACCARD_THRESHOLD,
    )


# Incremental dedup: the "existing corpus" is doc_id % 5 != 0; the
# "new batch" arriving is doc_id % 5 == 0 (~20%), scale-independent.
INCREMENTAL_BATCH_MOD = 5


def _incremental_oracle() -> str:
    from lambda_refarch_mapreduce_spark.operators.dedup import (
        MINHASH_P,
        minhash_coeffs,
    )

    k, bands = MINHASH_K, MINHASH_BANDS
    rpb = k // bands
    mh_terms = []
    for i in range(k):
        a, b, c = minhash_coeffs(i)
        mh_terms.append(f"min(({a} * h1 + {b} * h2 + {c}) % {MINHASH_P}) AS mh{i}")
    mh_cols = ", ".join(mh_terms)
    band_selects = " UNION ALL ".join(
        "SELECT id, is_batch, {b} AS band, md5({cols}) AS bkey FROM sig".format(
            b=b,
            cols=" || '|' || ".join(f"mh{b * rpb + r}::VARCHAR" for r in range(rpb)),
        )
        for b in range(bands)
    )
    return f"""
        WITH tok AS (
            SELECT doc_id AS id, {_SQL_TOKENS} AS w,
                   doc_id % {INCREMENTAL_BATCH_MOD} = 0 AS is_batch
            FROM documents),
        sh AS (SELECT id, is_batch, unnest({_SQL_SHINGLES}) AS shingle FROM tok),
        hsh AS (SELECT id, is_batch,
                ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {MINHASH_P} AS h1,
                ('0x' || substr(md5(shingle), 16, 15))::BIGINT % {MINHASH_P} AS h2
                FROM sh),
        sig AS (SELECT id, is_batch, {mh_cols} FROM hsh GROUP BY id, is_batch),
        banded AS ({band_selects}),
        dig AS (SELECT doc_id AS id, doc_id % {INCREMENTAL_BATCH_MOD} = 0 AS is_batch,
                       md5(text) AS digest
                FROM documents),
        exact_hits AS (
            SELECT DISTINCT b.id, true AS hit
            FROM dig b JOIN dig c ON b.digest = c.digest
            WHERE b.is_batch AND NOT c.is_batch),
        near_hits AS (
            SELECT DISTINCT b.id, true AS hit
            FROM banded b JOIN banded c ON b.band = c.band AND b.bkey = c.bkey
            WHERE b.is_batch AND NOT c.is_batch)
        SELECT d.id,
               coalesce(e.hit, false) AS is_exact_dup,
               coalesce(nh.hit, false) AS is_near_dup,
               NOT (coalesce(e.hit, false) OR coalesce(nh.hit, false)) AS keep
        FROM (SELECT id FROM dig WHERE is_batch) d
        LEFT JOIN exact_hits e USING (id)
        LEFT JOIN near_hits nh USING (id)
    """


@register(
    "dedup_incremental_batch", oracle=_incremental_oracle(), tags=("llm", "dedup")
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: a new batch annotated against the existing
    corpus's digest + LSH-band index (dedup.build_dedup_index /
    dedup_against_index). The corpus index streams map-side against
    the broadcast batch — corpus text is never rescanned, never
    shuffled."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % INCREMENTAL_BATCH_MOD != 0)
    batch = docs.filter(F.col("doc_id") % INCREMENTAL_BATCH_MOD == 0)
    digest_index, band_index = dedup.build_dedup_index(
        corpus, "doc_id", "text", NGRAM_N, MINHASH_K, MINHASH_BANDS
    )
    return dedup.dedup_against_index(
        batch, digest_index, band_index, "doc_id", "text",
        NGRAM_N, MINHASH_K, MINHASH_BANDS,
    )


def _simhash_cte() -> str:
    bits = SIMHASH_BITS
    return f"""
        tokx AS (SELECT doc_id AS id, unnest({_SQL_TOKENS}) AS wtok FROM documents),
        h AS (SELECT id, ('0x' || substr(md5(wtok), 1, 15))::BIGINT AS hv FROM tokx),
        cnt AS (SELECT id, count(*) AS n FROM h GROUP BY id),
        bitc AS (
            SELECT id, j, sum((hv >> j) & 1) AS c
            FROM h, range(0, {bits}) t(j)
            GROUP BY id, j),
        sim AS (
            SELECT bitc.id,
                   sum(CASE WHEN 2 * bitc.c >= cnt.n
                            THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS simhash
            FROM bitc JOIN cnt ON cnt.id = bitc.id
            GROUP BY bitc.id)
    """


@register(
    "dedup_simhash",
    oracle=f"""
        WITH {_simhash_cte()}
        SELECT id AS doc_id, simhash FROM sim
    """,
    tags=("llm", "dedup"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 60-bit SimHash (portable bit-for-bit vs oracle)."""
    return dedup.simhash(
        _t(spark, sf_dir, "documents"), "doc_id", "text", SIMHASH_BITS
    ).select(F.col("id").alias("doc_id"), "simhash")


@register(
    "dedup_simhash_pairs",
    oracle=f"""
        WITH {_simhash_cte()}
        SELECT a.id AS id_a, b.id AS id_b,
               bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
        FROM sim a JOIN sim b ON a.id < b.id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
    """,
    tags=("llm", "dedup"),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs. Spark generates candidates by probe-
    table equality (single-band or Manku block-combination tables —
    both pigeonhole-exact), so the banded plan provably equals the
    oracle's brute-force pairing while staying shuffle-bounded. Uses
    the corpus-size-aware `bands="auto"` default: the production
    configuration is exactly what this oracle verifies."""
    out = dedup.simhash_near_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        bits=SIMHASH_BITS,
        max_hamming=SIMHASH_MAX_HAMMING,
    )
    return out.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_COSINE_SQL = (
    "list_inner_product({a}, {b}) / "
    "(sqrt(list_inner_product({a}, {a})) * sqrt(list_inner_product({b}, {b})))"
)


@register(
    "similarity_topk",
    oracle=f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id, v FROM e WHERE vec_id < {TOPK_QUERY_MAX_ID}),
        scored AS (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   round({_COSINE_SQL.format(a='q.v', b='e.v')}, 6) AS cosine
            FROM q JOIN e ON e.vec_id <> q.vec_id),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, neighbor_id) AS rnk
            FROM scored)
        SELECT query_id, neighbor_id, cosine, rnk::BIGINT AS rank
        FROM ranked WHERE rnk <= {TOPK_K}
    """,
    tags=("llm", "similarity"),
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k (broadcast queries, JVM-side
    arithmetic, per-group window limit)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    out = similarity.brute_force_topk(emb, q, "vec_id", "embedding", TOPK_K)
    return out.select(
        "query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank")
    )


@register(
    "embedding_neardup_pairs",
    oracle=f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round({_COSINE_SQL.format(a='a.v', b='b.v')}, 6) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE {_COSINE_SQL.format(a='a.v', b='b.v')} >= {NEARDUP_COSINE}
    """,
    tags=("llm", "similarity"),
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine pairs via the grid theta-join (equi-join
    on chunk pairs — no corpus broadcast, no BroadcastNestedLoopJoin;
    see similarity.cosine_pairs). At this low threshold (0.4) no
    blocking can prune (measured: banded LSH still emits 95-100% of all
    pairs at 3-6x the compute), so the exact tier distributes the
    inherent n^2 work instead; the high-threshold approximate twin is
    embedding_neardup_lsh_blocked."""
    return similarity.cosine_pairs(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", NEARDUP_COSINE
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "text_token_stats",
    oracle=f"""
        WITH t AS (SELECT doc_id, text, {_SQL_TOKENS} AS w FROM documents)
        SELECT doc_id,
               len(w)::INT AS n_tokens,
               len(list_distinct(w))::INT AS n_unique_tokens,
               length(text)::INT AS n_chars,
               round(list_sum(list_transform(w, t -> length(t))) * 1.0
                     / greatest(len(w), 1), 6) AS avg_token_len
        FROM t
    """,
    tags=("llm", "text"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_stats(_t(spark, sf_dir, "documents"), "doc_id", "text")


def _langid_sql() -> str:
    langs = sorted(text.STOPWORDS)
    hits = {
        lang: (
            "len(list_filter(list_distinct(w), x -> list_contains(["
            + ", ".join(f"'{wd}'" for wd in text.STOPWORDS[lang])
            + "], x)))"
        )
        for lang in langs
    }
    pred_cases, hit_cases = [], []
    for lang in langs:
        others = ", ".join(hits[o] for o in langs if o != lang)
        cond = f"{hits[lang]} > 0 AND {hits[lang]} >= greatest({others})"
        pred_cases.append(f"WHEN {cond} THEN '{lang}'")
        hit_cases.append(f"WHEN {cond} THEN {hits[lang]}")
    return f"""
        WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents)
        SELECT doc_id,
               CASE {' '.join(pred_cases)} ELSE 'und' END AS pred_lang,
               (CASE {' '.join(hit_cases)} ELSE 0 END)::INT AS hits
        FROM t
    """


@register("text_language_id", oracle=_langid_sql(), tags=("llm", "text"))
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID heuristic (chained-CASE argmax; same
    tie-break on both engines by construction)."""
    return text.language_id(_t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "language_id_confusion",
    oracle=f"""
        WITH p AS ({_langid_sql()})
        SELECT d.lang, p.pred_lang, count(*)::BIGINT AS n_docs
        FROM documents d JOIN p ON p.doc_id = d.doc_id
        GROUP BY 1, 2
    """,
    tags=("llm", "text"),
)
def language_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-evaluation query: confusion matrix of the language-ID
    heuristic against the labeled lang column — the quality-dashboard
    companion every classifier tier needs. Predictions are row-local;
    the matrix is one |langs|²-bounded aggregate."""
    docs = _t(spark, sf_dir, "documents")
    pred = text.language_id(docs, "doc_id", "text")
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _quality_sql() -> str:
    all_stop = sorted({w for ws in text.STOPWORDS.values() for w in ws})
    stop_list = ", ".join(f"'{w}'" for w in all_stop)
    return f"""
        WITH t AS (SELECT doc_id, lang, text, {_SQL_TOKENS} AS w FROM documents),
        m AS (SELECT doc_id, lang,
                     len(w) AS n_tokens,
                     len(list_filter(list_distinct(w),
                         x -> list_contains([{stop_list}], x))) * 1.0
                       / greatest(len(list_distinct(w)), 1) AS stop_ratio,
                     length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
                       / greatest(length(text), 1) AS alpha_ratio,
                     least(len(w) / 100.0, 1.0) AS length_score
              FROM t)
        SELECT doc_id, lang, n_tokens::INT AS n_tokens,
               round(stop_ratio, 6) AS stop_ratio,
               round(alpha_ratio, 6) AS alpha_ratio,
               round((length_score + stop_ratio + alpha_ratio) / 3.0, 6) AS quality
        FROM m
    """


@register("text_quality", oracle=_quality_sql(), tags=("llm", "text"))
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_score(_t(spark, sf_dir, "documents"), "doc_id", "text")


QUALITY_FILTER_Q = 0.1

# Mixture sampling: target token shares per language and total budget.
# zh is deliberately unlisted — unlisted domains are dropped.
MIXTURE_WEIGHTS = {"en": 0.5, "de": 0.2, "es": 0.15, "fr": 0.15}
MIXTURE_BUDGET = 8000
MIXTURE_GRAN = 1_000_000


def _mixture_oracle() -> str:
    langs = ", ".join(f"'{d}'" for d in MIXTURE_WEIGHTS)
    wcase = "CASE domain " + " ".join(
        f"WHEN '{d}' THEN {w}" for d, w in MIXTURE_WEIGHTS.items()
    ) + " END"
    return f"""
        WITH t AS (
            SELECT doc_id AS id, lang AS domain,
                   len({_SQL_TOKENS})::INT AS n_tokens
            FROM documents WHERE lang IN ({langs})),
        tot AS (SELECT domain, sum(n_tokens) AS t_total FROM t GROUP BY domain),
        r AS (SELECT domain,
                     least(1.0, {wcase} * {MIXTURE_BUDGET} / t_total) AS rate
              FROM tot)
        SELECT t.id, t.domain, t.n_tokens, round(r.rate, 6) AS rate
        FROM t JOIN r USING (domain)
        WHERE ('0x' || substr(md5(t.id::VARCHAR), 1, 15))::BIGINT
                  % {MIXTURE_GRAN}
              < floor(r.rate * {MIXTURE_GRAN})::BIGINT
    """


@register("mixture_token_sample", oracle=_mixture_oracle(), tags=("llm", "text"))
def mixture_token_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-weighted sampling to a token budget: per-domain rates
    from one tiny totals aggregate, then a row-local deterministic
    hash predicate — no per-domain ordered window, no corpus shuffle
    (see text.mixture_token_sample)."""
    return text.mixture_token_sample(
        _t(spark, sf_dir, "documents"), "doc_id", "text", "lang",
        MIXTURE_WEIGHTS, MIXTURE_BUDGET, MIXTURE_GRAN,
    )


@register(
    "quality_quantile_filter",
    oracle=f"""
        WITH scored AS ({_quality_sql()}),
        thr AS (SELECT round(quantile_cont(quality, {QUALITY_FILTER_Q}), 6)
                       AS q_threshold
                FROM scored)
        SELECT s.doc_id, s.quality, thr.q_threshold
        FROM scored s, thr
        WHERE s.quality >= thr.q_threshold
    """,
    tags=("llm", "text"),
)
def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative quality trim: drop the worst q-fraction by
    score. Exact percentile here so the oracle can reproduce the
    cutoff; the operator's default is the approx_percentile sketch —
    the scale path (see text.quality_quantile_filter)."""
    return text.quality_quantile_filter(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        q=QUALITY_FILTER_Q, exact=True,
    )


@register(
    "text_fingerprint",
    oracle=f"""
        WITH t AS (SELECT doc_id, text, {_SQL_TOKENS} AS w FROM documents)
        SELECT doc_id,
               md5(text) AS content_md5,
               list_min(list_transform(w, t -> md5(t))) AS min_token_md5,
               list_max(list_transform(w, t -> md5(t))) AS max_token_md5
        FROM t
    """,
    tags=("llm", "text"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprint(_t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "text_repetition_stats",
    oracle=f"""
        WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
        g AS (SELECT doc_id,
                     list_transform(range(1, greatest(len(w) - 1, 0) + 1),
                                    i -> w[i] || ' ' || w[i + 1]) AS grams
              FROM t)
        SELECT doc_id,
               len(grams)::INT AS n_ngrams,
               round((len(grams) - len(list_distinct(grams))) * 1.0
                     / greatest(len(grams), 1), 6) AS dup_ngram_frac,
               round(coalesce(list_max(list_transform(list_distinct(grams),
                         d -> len(list_filter(grams, x -> x = d)))), 0) * 1.0
                     / greatest(len(grams), 1), 6) AS top_ngram_frac
        FROM g
    """,
    tags=("llm", "text"),
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (dup-bigram fraction, top-bigram
    share). Spark side is a row-local sorted-run fold — the oracle's
    O(T^2) count-per-distinct-gram is affordable only at oracle scale."""
    return text.repetition_stats(_t(spark, sf_dir, "documents"), "doc_id", "text", 2)


@register(
    "text_pii_redaction",
    oracle=f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{text.PII_EMAIL}'))::INT AS n_emails,
               len(regexp_extract_all(text, '{text.PII_IPV4}'))::INT AS n_ips,
               len(regexp_extract_all(text, '{text.PII_PHONE}'))::INT AS n_phones,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '{text.PII_EMAIL}', '<EMAIL>', 'g'),
                   '{text.PII_IPV4}', '<IP>', 'g'),
                   '{text.PII_PHONE}', '<PHONE>', 'g') AS redacted
        FROM documents
    """,
    tags=("llm", "text"),
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect+redact with lookaround-free regexes that compile
    identically under Java regex (Spark) and RE2 (DuckDB)."""
    return text.pii_stats(_t(spark, sf_dir, "documents"), "doc_id", "text")


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


@register(
    "multimodal_features",
    oracle="""
        SELECT doc_id AS media_id,
               'image' AS media_type,
               octet_length(encode(text))::BIGINT AS n_bytes,
               substr(sha256(text), 1, 16) AS content_sha16,
               (('0x' || substr(sha256(text), 1, 4))::INT % 1920 + 1)::INT AS fake_width,
               (('0x' || substr(sha256(text), 5, 4))::INT % 1080 + 1)::INT AS fake_height
        FROM documents
    """,
    tags=("llm", "multimodal"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction via mapInPandas (Arrow batches).
    The decode kernel is a deterministic sha-based fake (compressed
    formats need PIL, absent here); the schema, batch iteration and
    1→0..n row contract are the real test. See
    multimodal_decode_image_stats for the REAL decode path (PPM)."""
    media = multimodal.attach_media(
        _t(spark, sf_dir, "documents"), "doc_id", "text", "image"
    )
    return multimodal.extract_features(media)


@register(
    "multimodal_decode_image_stats",
    oracle="""
        WITH b AS (SELECT doc_id,
                          md5(doc_id::VARCHAR || ':0')
                          || md5(doc_id::VARCHAR || ':1')
                          || md5(doc_id::VARCHAR || ':2') AS hx
                   FROM documents),
        p AS (SELECT doc_id,
                     list_transform(range(1, 49),
                         i -> ('0x' || substr(hx, 2*i - 1, 2))::INT) AS px
              FROM b)
        SELECT doc_id AS media_id,
               4 AS width, 4 AS height, 3 AS channels,
               round(list_sum(px) / 48.0, 6) AS mean_pixel,
               list_min(px) AS min_pixel,
               list_max(px) AS max_pixel
        FROM p
    """,
    tags=("llm", "multimodal"),
)
def multimodal_decode_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end to end: build one binary 4x4 P6 PPM per
    document (raster = 48 md5-derived bytes, so the oracle can compute
    the identical pixel stats from hex without a decoder), push it
    through the numpy PPM parser in multimodal.extract_image_features,
    and emit width/height/channels plus mean/min/max pixel values. The
    payload is genuinely parsed — header tokenization, maxval check,
    raster reshape — not fingerprinted. Arrow-batched mapInPandas,
    zero shuffle; binary stays out of every shuffle key."""
    docs = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    raster = F.concat(
        *[F.unhex(F.md5(F.concat(sid, F.lit(f":{k}")))) for k in range(3)]
    )
    media = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.concat(F.lit(b"P6\n4 4\n255\n"), raster).alias("content"),
        F.lit("ppm").alias("format"),
        (F.length(raster) + F.lit(11)).cast("long").alias("n_bytes"),
    )
    return multimodal.extract_image_features(media)


# RAWV toy-video header: magic + u16le (width=2, height=2, fps=8,
# n_frames=4); each frame is 2*2*3 = 12 raw RGB bytes.
import struct as _struct

_RAWV_HEADER = b"RAWV" + _struct.pack("<HHHH", 2, 2, 8, 4)
VIDEO_SAMPLE_EVERY = 2


def _video_oracle() -> str:
    # sampled frames 0 and 2 of 4; frame k's 12 bytes are the first 24
    # hex chars of md5(doc_id || ':vk')
    frame = """
        SELECT doc_id AS media_id, {k} AS frame_idx,
               4 AS n_frames, 8 AS fps, 2 AS width, 2 AS height,
               round(list_sum(px) / 12.0, 6) AS mean_pixel,
               list_max(px) AS max_pixel
        FROM (SELECT doc_id,
                     list_transform(range(1, 13),
                         i -> ('0x' || substr(md5(doc_id::VARCHAR || ':v{k}'),
                                              2*i - 1, 2))::INT) AS px
              FROM documents) f{k}
    """
    return " UNION ALL ".join(frame.format(k=k) for k in (0, 2))


@register(
    "multimodal_decode_video_stats",
    oracle=_video_oracle(),
    tags=("llm", "multimodal"),
)
def multimodal_decode_video_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode + temporal sampling end to end: build one
    4-frame 2x2 RAWV clip per document (each frame = 12 md5-derived
    RGB bytes, so the oracle computes identical per-frame stats from
    hex), parse it with the numpy RAWV demuxer, keep every 2nd frame,
    emit per-frame pixel stats (multimodal.extract_video_features).
    The 1→n frame fan-out happens inside the Arrow batch — binary
    never shuffles."""
    docs = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    frames = F.concat(
        *[
            F.substring(F.unhex(F.md5(F.concat(sid, F.lit(f":v{k}")))), 1, 12)
            for k in range(4)
        ]
    )
    media = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.lit("video").alias("media_type"),
        F.concat(F.lit(_RAWV_HEADER), frames).alias("content"),
        F.lit("rawv").alias("format"),
        (F.length(frames) + F.lit(len(_RAWV_HEADER))).cast("long").alias("n_bytes"),
    )
    return multimodal.extract_video_features(media, VIDEO_SAMPLE_EVERY)


# 44-byte canonical WAV header: PCM16 mono, 8000 Hz, 64-byte data chunk
# (32 samples). Precomputed with struct.pack — constant for every row.
_WAV_HEADER = bytes.fromhex(
    "524946466400000057415645666d7420100000000100010040"
    "1f0000803e0000020010006461746140000000"
)


@register(
    "multimodal_decode_audio_stats",
    oracle="""
        WITH b AS (SELECT doc_id,
                          md5(doc_id::VARCHAR || ':a0') || md5(doc_id::VARCHAR || ':a1')
                          || md5(doc_id::VARCHAR || ':a2') || md5(doc_id::VARCHAR || ':a3')
                              AS hx
                   FROM documents),
        s AS (SELECT doc_id,
                     list_transform(
                         list_transform(range(1, 33), i ->
                             ('0x' || substr(hx, 4*i - 3, 2))::INT
                             + 256 * ('0x' || substr(hx, 4*i - 1, 2))::INT),
                         u -> CASE WHEN u >= 32768 THEN u - 65536 ELSE u END)
                         AS v
              FROM b)
        SELECT doc_id AS media_id,
               8000 AS sample_rate, 1 AS n_channels, 32::BIGINT AS n_frames,
               round(32.0 / 8000, 6) AS duration_s,
               round(sqrt(list_sum(list_transform(v, x -> x::BIGINT * x)) / 32.0), 6)
                   AS rms,
               list_max(list_transform(v, x -> abs(x))) AS peak
        FROM s
    """,
    tags=("llm", "multimodal"),
)
def multimodal_decode_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end to end: build one PCM16 mono WAV per
    document (32 samples = 64 md5-derived bytes, little-endian, so the
    oracle reconstructs the identical int16 stream from hex), walk the
    RIFF chunk list in multimodal.decode_audio, and emit sample-rate/
    channel/duration plus RMS and peak amplitude. Sums of squares stay
    below 2^53, so numpy's pairwise and SQL's sequential summation are
    both exact — the stats match bit-for-bit. Arrow-batched
    mapInPandas, zero shuffle."""
    docs = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    raster = F.concat(
        *[F.unhex(F.md5(F.concat(sid, F.lit(f":a{k}")))) for k in range(4)]
    )
    media = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.lit("audio").alias("media_type"),
        F.concat(F.lit(_WAV_HEADER), raster).alias("content"),
        F.lit("wav").alias("format"),
        (F.length(raster) + F.lit(44)).cast("long").alias("n_bytes"),
    )
    return multimodal.extract_audio_features(media)


# ---------------------------------------------------------------------------
@register(
    "events_sliding_window",
    oracle="""
        WITH w AS (
            SELECT event_type, value,
                   unnest([to_timestamp(floor(epoch(ts) / 1800) * 1800 - 1800),
                           to_timestamp(floor(epoch(ts) / 1800) * 1800)])
                       AS wstart
            FROM events)
        SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               round(sum(value), 2) AS total,
               count(*)::BIGINT AS n_events
        FROM w GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour/30-minute event-time window — the batch twin of
    the streaming sliding-window test (each event lands in exactly two
    overlapping windows). The oracle replays the assignment by epoch
    arithmetic (both engines' 30-min boundaries are epoch-aligned)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(
            F.round(F.sum("value"), 2).alias("total"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "total",
            "n_events",
        )
    )


INTERVAL_GAP_SECS = 60


@register(
    "interval_self_join_events",
    oracle=f"""
        SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
               (epoch_us(b.ts) - epoch_us(a.ts))::BIGINT AS micros_apart
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND epoch_us(b.ts) - epoch_us(a.ts)
                 BETWEEN 0 AND {INTERVAL_GAP_SECS} * 1000000
         AND (epoch_us(a.ts), a.event_id) < (epoch_us(b.ts), b.event_id)
    """,
    tags=("llm",),
)
def interval_self_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-event pairs: same user within 60 s, via the bucketed
    interval self-join (operators.relational.interval_self_join) —
    exact-once pigeonhole bucketing on time, candidate volume bounded
    by per-bucket occupancy instead of the oracle's O(n²/user) theta
    join. Exact integer microsecond arithmetic on both engines."""
    return relational.interval_self_join(
        _t(spark, sf_dir, "events"), "user_id", "event_id", "ts",
        INTERVAL_GAP_SECS,
    )


# Streaming-equivalent window (batch check of streaming semantics)
# ---------------------------------------------------------------------------


@register(
    "events_hourly_window",
    oracle="""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               round(sum(value), 2) AS total,
               count(*)::BIGINT AS n_events
        FROM events GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window — the batch twin of
    streaming.windowed_agg (same groupBy(window(...)) expression the
    streaming job runs; Structured Streaming execution is covered in
    tests/test_streaming.py with trigger(availableNow))."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.round(F.sum("value"), 2).alias("total"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "total",
            "n_events",
        )
    )


_ = windowed_agg  # imported for API surface; exercised in tests


# ---------------------------------------------------------------------------
# UDF-seam queries: Arrow-batched Python where SQL can't express the
# kernel — but HERE the kernels are chosen SQL-expressible on purpose,
# so even the Python paths get exact oracle checks.
# ---------------------------------------------------------------------------


@register(
    "applyinpandas_zscore",
    oracle="""
        SELECT event_id,
               round((value - avg(value) OVER (PARTITION BY event_type))
                     / stddev_samp(value) OVER (PARTITION BY event_type), 6) AS zscore
        FROM events
    """,
    tags=("llm", "udf"),
)
def applyinpandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF seam (reference reducer seam, reducer.js:46):
    per-event-type z-score via applyInPandas. One shuffle on the group
    key; pandas kernel runs per group over Arrow batches. The same
    computation is a window in SQL — that equivalence is the check."""
    import pandas as pd

    def zscore(pdf: "pd.DataFrame") -> "pd.DataFrame":
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "zscore": ((pdf["value"] - mu) / sd).round(6),
            }
        )

    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return e.groupBy("event_type").applyInPandas(
        zscore, schema="event_id bigint, zscore double"
    )


@register(
    "mapinpandas_token_count",
    oracle=f"""
        SELECT doc_id, len({_SQL_TOKENS})::BIGINT AS n_tokens
        FROM documents
    """,
    tags=("llm", "udf"),
)
def mapinpandas_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch map UDF seam (reference mapper seam, mapper.py:36-57):
    token counting in Python over Arrow batches. python str.split() ==
    regex \\s+ split with empties dropped, so the SQL oracle is exact."""
    import pandas as pd

    def count_tokens(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pdf["text"].map(lambda t: len(t.split())),
                }
            )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(count_tokens, schema="doc_id bigint, n_tokens bigint")


@register(
    "mapinarrow_doc_bytes",
    oracle="""
        SELECT doc_id,
               length(text)::BIGINT AS n_chars,
               strlen(text)::BIGINT AS n_bytes
        FROM documents
    """,
    tags=("llm", "udf"),
)
def mapinarrow_doc_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cheapest Python seam: mapInArrow hands the UDF raw Arrow
    RecordBatches (no pandas conversion, no copy for primitive
    columns). Completes the UDF matrix alongside pandas/grouped/UDTF
    seams — use this tier when the kernel is pyarrow.compute- or
    numpy-expressible, e.g. byte-level corpus accounting before
    tokenizer budgeting (chars != bytes on any non-ASCII corpus)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def doc_stats(batches):
        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(pc.binary_length(text), pa.int64()),
                ],
                names=["doc_id", "n_chars", "n_bytes"],
            )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(
        doc_stats, schema="doc_id bigint, n_chars bigint, n_bytes bigint"
    )


PACK_BUDGET = 512


@register(
    "pack_sequences_token_budget",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, len({_SQL_TOKENS})::BIGINT AS n_tokens
            FROM documents),
        c AS (
            SELECT doc_id, n_tokens,
                   sum(n_tokens) OVER (ORDER BY doc_id) AS cum
            FROM tok)
        SELECT doc_id, n_tokens,
               ((cum - n_tokens) // {PACK_BUDGET})::BIGINT AS bin_id
        FROM c
    """,
    tags=("llm", "text"),
)
def pack_sequences_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining sequence packing (concat-and-chunk): each doc gets
    the context-window bin where its first token lands. The Spark side
    computes the global token prefix sum with a two-phase distributed
    scan (range partition → per-partition totals → broadcast offsets),
    never a single-partition global window; the oracle is the plain
    window-SQL definition."""
    docs = _t(spark, sf_dir, "documents")
    return text.pack_sequences(docs, "doc_id", "text", budget=PACK_BUDGET)


@register(
    "stratified_sample_docs",
    oracle="""
        SELECT doc_id, lang FROM documents
        WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 <
              CASE WHEN lang = 'en' THEN 25 ELSE 100 END
    """,
    tags=("llm", "text"),
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class rebalancing: deterministically downsample the dominant
    language (en -> ~25%) while keeping all minority-language docs.
    Row-local hash predicate — no shuffle, no RNG, nested samples (see
    relational.stratified_hash_sample)."""
    docs = _t(spark, sf_dir, "documents")
    return relational.stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 25}
    ).select("doc_id", "lang")


@register(
    "dataset_split_counts",
    # same portable md5 bucket as the stratified sampler: bucket<80 ->
    # train, <90 -> val, else test — disjoint, exhaustive, and stable
    # under corpus growth (a doc never changes split when others are
    # added, unlike any RNG or modulo-of-row-number scheme)
    oracle="""
        WITH s AS (SELECT source,
                          CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR),
                                                    1, 15))::BIGINT % 100 < 80
                               THEN 'train'
                               WHEN ('0x' || substr(md5(doc_id::VARCHAR),
                                                    1, 15))::BIGINT % 100 < 90
                               THEN 'val' ELSE 'test' END AS split
                   FROM documents)
        SELECT source, split, count(*)::BIGINT AS n_docs
        FROM s GROUP BY source, split
    """,
    tags=("llm", "text"),
)
def dataset_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by content-hash
    bucket of the document id (the portable md5 uniform the sampling
    tiers share): row-local, shuffle-free, reproducible across engines
    and cluster sizes, and STABLE under corpus growth — adding
    documents never moves an existing one across splits, so eval
    contamination can't creep in between releases. The entry emits the
    per-source split counts a release report would assert on."""
    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# End-to-end dedup: produce the surviving corpus, not just the pairs
# ---------------------------------------------------------------------------


def _survivors_oracle() -> str:
    pairs = _minhash_oracle().rstrip()
    return f"""
        WITH pairs AS ({pairs})
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT id_b FROM pairs)
    """


@register("dedup_survivors", oracle=_survivors_oracle(), tags=("llm", "dedup"))
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup: drop every doc that appears as the higher id
    of a verified near-dup pair (MinHash-LSH + Jaccard >= threshold).
    Greedy keep-lowest-id policy — the standard corpus-dedup heuristic
    (transitive-closure clustering is the iterative variant, out of
    SQL's reach and provided separately if needed). Anti-join keeps
    the data path shuffle-bounded."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs,
        "doc_id",
        "text",
        n=NGRAM_N,
        k=MINHASH_K,
        bands=MINHASH_BANDS,
        threshold=JACCARD_THRESHOLD,
    )
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return docs.select("doc_id").join(losers, "doc_id", "left_anti")


def _ivf_assign_sql(n_centroids: int = 16) -> str:
    """Shared WITH-clause body replicating ivf_centroids + assignment
    in DuckDB: seeds = the ``n_centroids`` lowest-id vectors (cid in id
    order), one spherical-k-means refinement pass (nearest seed by
    cosine, ties to the higher cid — matching _assign_lists' reversed
    struct sort — then per-dimension mean; empty lists keep their
    seed), then every vector ranked against the refined centroids."""
    cos_es = _COSINE_SQL.format(a="e.v", b="s.v")
    cos_ec = _COSINE_SQL.format(a="e.v", b="c.v")
    return f"""
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
                  FROM (SELECT vec_id, v FROM e ORDER BY vec_id
                        LIMIT {n_centroids})),
        a0 AS (SELECT e.vec_id, e.v, s.cid,
                      row_number() OVER (PARTITION BY e.vec_id
                          ORDER BY {cos_es} DESC, s.cid DESC) AS rn
               FROM e CROSS JOIN seeds s),
        m0 AS (SELECT vec_id, v, cid FROM a0 WHERE rn = 1),
        dims AS (SELECT cid, unnest(v) AS val,
                        unnest(range(1, len(v) + 1)) AS pos
                 FROM m0),
        dimavg AS (SELECT cid, pos, avg(val) AS val
                   FROM dims GROUP BY cid, pos),
        means AS (SELECT cid, list(val ORDER BY pos) AS v
                  FROM dimavg GROUP BY cid),
        cents AS (SELECT s.cid, coalesce(m.v, s.v) AS v
                  FROM seeds s LEFT JOIN means m ON m.cid = s.cid),
        assigned AS (SELECT e.vec_id, e.v, c.cid,
                            row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {cos_ec} DESC, c.cid DESC) AS rn
                     FROM e CROSS JOIN cents c)
    """


_IVF_TOPK_ORACLE = f"""
        WITH {_ivf_assign_sql()},
        corpus AS (SELECT vec_id, v, cid AS list_id FROM assigned WHERE rn = 1),
        probes AS (SELECT vec_id AS query_id, v AS qv, cid AS list_id
                   FROM assigned WHERE rn <= 4 AND vec_id < {TOPK_QUERY_MAX_ID}),
        scored AS (SELECT p.query_id, c.vec_id AS neighbor_id,
                          round({_COSINE_SQL.format(a="p.qv", b="c.v")}, 6)
                              AS cosine
                   FROM probes p JOIN corpus c ON c.list_id = p.list_id
                                              AND c.vec_id <> p.query_id),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS rnk FROM scored)
        SELECT query_id, neighbor_id, cosine, rnk::BIGINT AS rank
        FROM ranked WHERE rnk <= {TOPK_K}
    """


@register(
    "similarity_ivf_topk",
    oracle=_IVF_TOPK_ORACLE,
    tags=("llm", "similarity"),
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k — the scale path for ANN: corpus bucketed
    by nearest coarse centroid, queries probe n_probe lists, so per-
    query scan cost is |corpus| * n_probe / n_centroids. The whole
    pipeline is deterministic (lowest-id seeds, one Lloyd pass, cid
    tie-breaks), so the oracle replays centroid refinement + probing
    in SQL — approximate vs brute force, but exactly reproducible.
    Recall vs the exact tier is additionally pinned in
    tests/test_operators.py.

    Pins ``centroid_strategy="literal"`` — this entry is the literal
    leg of the serving-mode A/B (the operator DEFAULT is broadcast,
    the measured winner; see similarity_ivf_topk_broadcast), kept so
    the bench series q_similarity_ivf keeps measuring the same plan
    it has since round 1."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    out = similarity.ivf_topk(
        emb, q, "vec_id", "embedding", k=TOPK_K, n_centroids=16, n_probe=4,
        centroid_strategy="literal",
    )
    return out.select(
        "query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank")
    )


@register(
    "similarity_ivf_topk_broadcast",
    oracle=_IVF_TOPK_ORACLE,
    tags=("llm", "similarity"),
)
def similarity_ivf_topk_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented IVF literal→broadcast cutover as a verified
    mode: centroids ride ONE broadcast-joined row
    (similarity._centroids_frame) instead of plan literals, keeping
    the plan O(1) in the centroid count — the production
    configuration for thousands of lists. Same oracle as
    similarity_ivf_topk because the two strategies are result-
    identical by construction (and plan-asserted in
    test_scale_plans)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    out = similarity.ivf_topk(
        emb,
        q,
        "vec_id",
        "embedding",
        k=TOPK_K,
        n_centroids=16,
        n_probe=4,
        centroid_strategy="broadcast",
    )
    return out.select(
        "query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank")
    )


@register(
    "multimodal_frame_sampling",
    # The fake demux kernel is pure byte arithmetic (slice every 64
    # UTF-8 bytes, cap 4 frames, min 1), so the Arrow fan-out is fully
    # replayable in SQL: n_frames = min(4, max(1, bytes // 64)) and
    # frame i carries min(64, bytes - 64*i) bytes.
    oracle="""
        WITH m AS (SELECT doc_id::BIGINT AS media_id,
                          octet_length(encode(text)) AS nb
                   FROM documents),
        f AS (SELECT media_id, nb,
                     unnest(range(least(4, greatest(1, nb // 64)))) AS fi
              FROM m)
        SELECT media_id, fi::INT AS frame_idx,
               least(64, nb - fi * 64)::INT AS n_frame_bytes
        FROM f
    """,
    tags=("llm", "multimodal"),
)
def multimodal_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (1 media row → n frame rows) through
    mapInPandas — the Arrow fan-out shape a real video demux uses. The
    kernel slices fake payloads (no codecs in this runtime); the fan-out
    cardinality and per-frame byte counts are deterministic, so the
    oracle replays them arithmetically; tests pin per-row frame counts."""
    docs = _t(spark, sf_dir, "documents")
    media = multimodal.attach_media(docs, "doc_id", "text", "video", "fake")
    frames = multimodal.sample_frames(media, every_n_bytes=64, max_frames=4)
    return frames.select(
        "media_id", "frame_idx", F.length("frame_bytes").alias("n_frame_bytes")
    )


@register(
    "text_bpe_token_count",
    oracle=r"""
        SELECT doc_id,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::INT
                 AS n_bpe_pieces
        FROM documents
    """,
    tags=("llm", "text"),
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish sub-word piece count (letter runs / digit runs / single
    punctuation) — the cheap pre-tokenizer cost estimate a training
    pipeline runs corpus-wide. Lookaround-free pattern so Java regex
    and RE2 agree piece-for-piece."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id", text.bpe_ish_token_count(F.col("text")).alias("n_bpe_pieces")
    )


@register(
    "pandas_udf_scalar_sigmoid",
    oracle="""
        SELECT event_id, round(1.0 / (1.0 + exp(-value / 100.0)), 6) AS squashed
        FROM events
    """,
    tags=("llm", "udf"),
)
def pandas_udf_scalar_sigmoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF seam (Series -> Series, Arrow-vectorized):
    the numeric kernel runs in numpy across the whole batch — the
    sanctioned shape for custom per-row math Spark lacks. Kernel chosen
    SQL-expressible so even this path gets an exact oracle."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def sigmoid(v: pd.Series) -> pd.Series:
        import numpy as np

        return (1.0 / (1.0 + np.exp(-v / 100.0))).round(6)

    return _t(spark, sf_dir, "events").select(
        "event_id", sigmoid("value").alias("squashed")
    )


@register(
    "pandas_udaf_weighted_avg",
    oracle="""
        SELECT l_returnflag,
               round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6)
                 AS weighted_avg_price
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("llm", "udf"),
)
def pandas_udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF seam — the reference's
    custom-reducer hook, reducer.js:46): quantity-weighted mean price
    per flag. One shuffle on the group key; the kernel sees each
    group's Series. SQL-equivalent by construction for the oracle."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(wavg("l_extendedprice", "l_quantity"), 6).alias("weighted_avg_price"))
    )


def _prep_pipeline_oracle() -> str:
    pairs = _minhash_oracle().rstrip()
    quality = _quality_sql().rstrip()
    return f"""
        WITH pairs AS ({pairs}),
        q AS ({quality})
        SELECT lang,
               count(*)::BIGINT AS n_docs,
               round(avg(quality), 6) AS avg_quality,
               sum(n_tokens)::BIGINT AS total_tokens
        FROM q
        WHERE doc_id NOT IN (SELECT id_b FROM pairs)
          AND quality >= 0.4
        GROUP BY lang
    """


@register(
    "training_data_prep_pipeline",
    oracle=_prep_pipeline_oracle(),
    tags=("llm", "pipeline"),
)
def training_data_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus prep — the composition a real training-data
    job runs as ONE lazy plan: near-dup removal (MinHash-LSH keep-first)
    ∘ quality gate ∘ per-language accounting. No stage materializes;
    Catalyst sees the whole pipeline, so document bodies are scanned
    once per branch and only ids/stats shuffle."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text",
        n=NGRAM_N, k=MINHASH_K, bands=MINHASH_BANDS, threshold=JACCARD_THRESHOLD,
    )
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    quality = text.quality_score(docs, "doc_id", "text")
    kept = quality.join(losers, "doc_id", "left_anti").filter(
        F.col("quality") >= 0.4
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


LSH_BLOCK_BANDS = 6
LSH_BLOCK_SEED = 42
LSH_BLOCK_DIM = 64  # embeddings.parquet dim at every sf tier


def _lsh_blocked_oracle() -> str:
    """Replay the banded sign-hyperplane blocking in DuckDB.

    The hyperplanes are deterministic md5-derived literals
    (similarity._hyperplane), so the oracle embeds the SAME plane
    vectors this entry's Spark plan bakes in (band b uses seed
    42*1000+b, matching lsh_blocked_pairs) and recomputes each band
    bucket as sign(v · plane) — an exact candidate-set check, not just
    row counts. Filter is on the ROUNDED cosine, matching
    lsh_blocked_pairs' output column semantics.

    The per-band bit count is the operator's corpus-size-aware
    ``auto_planes`` rule (round 13 — the sf1 spot gate found the fixed
    3-bit banding emits O(n^2/8) candidates), replayed here
    INTEGER-EXACTLY: r = smallest r in [3, 16] with 2^r * 8 >= n,
    derived by bit-shift comparison (never float log2, whose rounding
    could diverge between engines at exact powers of two). Plane
    literals are emitted up to the r=16 clamp; the rr CTE selects the
    prefix the corpus size calls for."""
    from lambda_refarch_mapreduce_spark.operators.similarity import (
        LSH_AUTO_BUCKET_LOAD,
        LSH_AUTO_MAX_PLANES,
        LSH_AUTO_MIN_PLANES,
        _hyperplane,
    )

    rows = []
    for b in range(LSH_BLOCK_BANDS):
        for p in range(LSH_AUTO_MAX_PLANES):
            plane = _hyperplane(LSH_BLOCK_DIM, p, LSH_BLOCK_SEED * 1000 + b)
            lits = ", ".join(repr(x) for x in plane)
            rows.append(f"({b}, {p}, [{lits}]::DOUBLE[])")
    values = ",\n               ".join(rows)
    cos = _COSINE_SQL.format(a="ea.v", b="eb.v")
    return f"""
        WITH planes(band, plane_idx, p) AS (
            VALUES {values}
        ),
        e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        nn AS (SELECT count(*) AS n FROM embeddings),
        rr AS (SELECT least({LSH_AUTO_MAX_PLANES}, greatest({LSH_AUTO_MIN_PLANES},
                   coalesce((SELECT min(t.r)::INT
                             FROM range({LSH_AUTO_MAX_PLANES} + 1) t(r), nn
                             WHERE (1::BIGINT << t.r) * {LSH_AUTO_BUCKET_LOAD}
                                   >= nn.n),
                            {LSH_AUTO_MAX_PLANES}))) AS r),
        bits AS (SELECT e.id, pl.band, pl.plane_idx,
                        CASE WHEN list_inner_product(e.v, pl.p) >= 0
                             THEN '1' ELSE '0' END AS bit
                 FROM e CROSS JOIN planes pl, rr
                 WHERE pl.plane_idx < rr.r),
        buckets AS (SELECT id, band,
                           string_agg(bit, '' ORDER BY plane_idx) AS bucket
                    FROM bits GROUP BY id, band),
        cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                 FROM buckets a JOIN buckets b
                   ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
        scored AS (SELECT c.id_a, c.id_b, round({cos}, 6) AS cosine
                   FROM cand c
                   JOIN e ea ON ea.id = c.id_a
                   JOIN e eb ON eb.id = c.id_b)
        SELECT id_a, id_b, cosine FROM scored
        WHERE cosine >= {NEARDUP_COSINE}
    """


@register(
    "embedding_neardup_lsh_blocked",
    oracle=_lsh_blocked_oracle(),
    tags=("llm", "similarity"),
)
def embedding_neardup_lsh_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup at scale: banded cosine-LSH blocking
    (OR-amplification over 6 bands of corpus-size-aware sign bits) in
    front of the exact cosine check — candidates form per-band
    equi-joins, never a cross join, and carry only id pairs through
    the dedup (vectors equi-joined back per surviving pair). The
    hyperplane family is deterministic (md5-derived literals) and the
    per-band bit count follows the integer-exact auto_planes rule, so
    the LSH-dependent candidate set is exactly reproducible at ANY
    corpus size and the oracle replays both in SQL; recall vs the
    exact tier is additionally pinned in tests/test_operators.py.
    Round 13: the sf1 spot gate caught the previous FIXED 3-bit
    banding emitting 153M candidate pairs at n=20k (a >80 GB spill) —
    auto sizing emits 979k at the same n."""
    return similarity.lsh_blocked_pairs(
        _t(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        threshold=NEARDUP_COSINE,
        n_planes="auto",
        bands=LSH_BLOCK_BANDS,
        seed=LSH_BLOCK_SEED,
    )


@register(
    "python_udf_rowwise",
    oracle="""
        SELECT doc_id, reverse(lang) AS rlang
        FROM documents
    """,
    tags=("llm", "udf"),
)
def python_udf_rowwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — the reference's per-line mapper seam
    (mapper.py:49-57) at its most literal, and deliberately the LAST
    resort: one Python call per row, no Arrow batching, 10-100x slower
    than pandas_udf_scalar_sigmoid on the same work. Registered so the
    seam is covered and its cost is measurable next to the vectorized
    tiers; production kernels belong in the pandas_udf entries."""
    from pyspark.sql.functions import udf

    @udf("string")
    def rev(s: str) -> str:
        return s[::-1] if s is not None else None

    return _t(spark, sf_dir, "documents").select(
        "doc_id", rev("lang").alias("rlang")
    )


# ---------------------------------------------------------------------------
# Paragraph-level corpus dedup, quantization, unigram LM scoring, SemDedup
# ---------------------------------------------------------------------------

PARA_CHUNK_W = 8  # tokens per pseudo-paragraph (fixture docs have no \n)
UNIGRAM_VOCAB = 512


def _para_oracle() -> str:
    w = PARA_CHUNK_W
    return f"""
        WITH t AS (SELECT doc_id AS id, {_SQL_TOKENS} AS w FROM documents),
        c AS (SELECT id,
                     list_transform(range(1, cast(ceil(len(w) / {w}.0) AS INT) + 1),
                                    i -> array_to_string(w[(i - 1) * {w} + 1 : i * {w}], ' ')) AS chunks
              FROM t),
        p AS (SELECT id, unnest(chunks) AS para,
                     unnest(range(1, len(chunks) + 1)) AS pos
              FROM c),
        p2 AS (SELECT * FROM p WHERE trim(para) <> ''),
        k AS (SELECT id, pos, para,
                     row_number() OVER (PARTITION BY para ORDER BY id, pos) AS rn
              FROM p2),
        r AS (SELECT id, count(*) AS n_kept,
                     string_agg(para, chr(10) ORDER BY pos) AS text_deduped
              FROM k WHERE rn = 1 GROUP BY id),
        tot AS (SELECT id, count(*) AS n_paras FROM p2 GROUP BY id)
        SELECT d.doc_id,
               coalesce(tot.n_paras, 0)::BIGINT AS n_paras,
               coalesce(r.n_kept, 0)::BIGINT AS n_kept,
               coalesce(r.text_deduped, '') AS text_deduped
        FROM documents d
        LEFT JOIN tot ON tot.id = d.doc_id
        LEFT JOIN r ON r.id = d.doc_id
    """


PQ_M = 8  # subspaces (dim 64 -> 8-dim sub-vectors)
PQ_CODES = 16


def _pq_ctes(p: str = "") -> str:
    """Shared DuckDB replay of the deterministic PQ pipeline: sample-
    seeded sub-codebooks (lowest-PQ_CODES ids), ONE k-means refinement
    pass per subspace (assign by squared L2, ties to the lower code
    id — matching _pq_assign's struct sort — then per-dimension means;
    empty codes keep their seed), then final codes + summed
    quantization error per vector against the refined books.

    ``p`` prefixes every CTE name so this chain can compose with the
    IVF chain (which owns e/seeds/a0/means/... unprefixed) in one
    statement — see similarity_ivfadc_topk."""
    m, sub = PQ_M, 64 // PQ_M
    l2 = "list_sum(list_transform(list_zip({a}, {b}), z -> (z[1] - z[2]) * (z[1] - z[2])))"
    return f"""
        {p}e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        {p}seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
                  FROM (SELECT vec_id, v FROM {p}e ORDER BY vec_id
                        LIMIT {PQ_CODES})),
        {p}js AS (SELECT unnest(range({m})) AS j),
        {p}subc0 AS (SELECT s.cid, js.j, s.v[js.j * {sub} + 1 : (js.j + 1) * {sub}] AS sv
                  FROM {p}seeds s CROSS JOIN {p}js js),
        {p}sube AS (SELECT e.vec_id, js.j, e.v[js.j * {sub} + 1 : (js.j + 1) * {sub}] AS sv
                 FROM {p}e e CROSS JOIN {p}js js),
        {p}d0 AS (SELECT se.vec_id, se.j, c.cid, {l2.format(a="se.sv", b="c.sv")} AS d2
               FROM {p}sube se JOIN {p}subc0 c ON c.j = se.j),
        {p}a0 AS (SELECT vec_id, j, cid,
                      row_number() OVER (PARTITION BY vec_id, j
                                         ORDER BY d2, cid) AS rn
               FROM {p}d0),
        {p}m0 AS (SELECT a0.j, a0.cid, se.sv
               FROM {p}a0 a0 JOIN {p}sube se
                 ON se.vec_id = a0.vec_id AND se.j = a0.j
               WHERE a0.rn = 1),
        {p}dims AS (SELECT j, cid, unnest(sv) AS val,
                        unnest(range(1, len(sv) + 1)) AS pos
                 FROM {p}m0),
        {p}dimavg AS (SELECT j, cid, pos, avg(val) AS val
                   FROM {p}dims GROUP BY j, cid, pos),
        {p}means AS (SELECT j, cid, list(val ORDER BY pos) AS sv
                  FROM {p}dimavg GROUP BY j, cid),
        {p}subc AS (SELECT s0.cid, s0.j, coalesce(mn.sv, s0.sv) AS sv
                 FROM {p}subc0 s0 LEFT JOIN {p}means mn
                   ON mn.j = s0.j AND mn.cid = s0.cid),
        {p}d AS (SELECT se.vec_id, se.j, c.cid, {l2.format(a="se.sv", b="c.sv")} AS d2
              FROM {p}sube se JOIN {p}subc c ON c.j = se.j),
        {p}a AS (SELECT vec_id, j, cid, d2,
                     row_number() OVER (PARTITION BY vec_id, j
                                        ORDER BY d2, cid) AS rn
              FROM {p}d),
        {p}codes AS (SELECT vec_id, list(cid ORDER BY j) AS codes,
                         sum(d2) AS err
                  FROM {p}a WHERE rn = 1 GROUP BY vec_id)
    """


@register(
    "embedding_pq_codes",
    oracle=f"""
        WITH {_pq_ctes()}
        SELECT vec_id, array_to_string(codes, ',') AS codes_csv,
               round(err, 6) AS recon_err
        FROM codes
    """,
    tags=("llm", "similarity"),
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (similarity.pq_encode): each
    vector becomes PQ_M one-byte codes — 32x less scan bandwidth for
    the ANN tiers. Codebooks are sample-seeded then refined by one
    deterministic Lloyd pass, so the oracle replays seeding +
    refinement + argmin assignment in SQL; codes ride as a CSV string
    past the driver canonicalizer (array columns are unhashable
    there)."""
    out = similarity.pq_encode(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", PQ_M, PQ_CODES
    )
    return out.select(
        "vec_id",
        F.array_join("codes", ",").alias("codes_csv"),
        "recon_err",
    )


_PQ_TOPK_ORACLE = f"""
        WITH {_pq_ctes()},
        qsub AS (SELECT vec_id, j, sv FROM sube WHERE vec_id < {TOPK_QUERY_MAX_ID}),
        nc AS (SELECT vec_id, j, cid FROM a WHERE rn = 1),
        pair AS (SELECT qs.vec_id AS query_id, nc.vec_id AS neighbor_id,
                        list_sum(list_transform(list_zip(qs.sv, c.sv),
                            z -> (z[1] - z[2]) * (z[1] - z[2]))) AS d2
                 FROM qsub qs
                 JOIN nc ON nc.j = qs.j
                 JOIN subc c ON c.j = nc.j AND c.cid = nc.cid
                 WHERE qs.vec_id <> nc.vec_id),
        adc AS (SELECT query_id, neighbor_id, round(sum(d2), 6) AS dist2
                FROM pair GROUP BY query_id, neighbor_id),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY dist2, neighbor_id) AS rnk FROM adc)
        SELECT query_id, neighbor_id, dist2, rnk::BIGINT AS rank
        FROM ranked WHERE rnk <= {TOPK_K}
    """


@register(
    "similarity_pq_topk",
    oracle=_PQ_TOPK_ORACLE,
    tags=("llm", "similarity"),
)
def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-k over PQ codes (similarity.pq_topk): the corpus scan
    reads m-byte codes, queries broadcast raw sub-vectors, distances
    come from literal-codebook lookups. Deterministic end-to-end, so
    the oracle replays encode + asymmetric distance; ranking uses the
    6dp-rounded distance (then neighbor id) for cross-engine rank
    stability. PQ compresses the scan, IVF prunes it — compose both
    for production IVFADC.

    Pins ``codebook_strategy="literal"`` — the literal leg of the
    serving-mode A/B (the operator DEFAULT is broadcast, the measured
    winner; see similarity_pq_topk_broadcast), kept so the bench
    series q_pq_topk keeps measuring the same plan across rounds."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    out = similarity.pq_topk(
        emb, q, "vec_id", "embedding", k=TOPK_K, m=PQ_M, n_codes=PQ_CODES,
        codebook_strategy="literal",
    )
    return out.select(
        "query_id", "neighbor_id", "dist2",
        F.col("rank").cast("long").alias("rank"),
    )


@register(
    "similarity_pq_topk_broadcast",
    oracle=_PQ_TOPK_ORACLE,
    tags=("llm", "similarity"),
)
def similarity_pq_topk_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ADC top-k with codebooks carried as ONE broadcast-joined row
    (similarity._codebooks_frame) instead of plan literals — encode
    and ADC lookup both read the __books column, so the plan stays
    O(1) in m·n_codes (the production mode past ~hundreds of codes).
    Result-identical to similarity_pq_topk by construction; same
    oracle, plan-asserted in test_scale_plans."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    out = similarity.pq_topk(
        emb,
        q,
        "vec_id",
        "embedding",
        k=TOPK_K,
        m=PQ_M,
        n_codes=PQ_CODES,
        codebook_strategy="broadcast",
    )
    return out.select(
        "query_id", "neighbor_id", "dist2",
        F.col("rank").cast("long").alias("rank"),
    )


PQ_SHORTLIST = 20


@register(
    "similarity_pq_rerank_topk",
    # Stage 1 replays the full ADC chain (shortlist of PQ_SHORTLIST per
    # query), stage 2 joins raw vectors back for the exact rerank —
    # mirroring similarity.pq_rerank_topk's two stages.
    oracle=f"""
        WITH {_pq_ctes()},
        qsub AS (SELECT vec_id, j, sv FROM sube WHERE vec_id < {TOPK_QUERY_MAX_ID}),
        nc AS (SELECT vec_id, j, cid FROM a WHERE rn = 1),
        pair AS (SELECT qs.vec_id AS query_id, nc.vec_id AS neighbor_id,
                        list_sum(list_transform(list_zip(qs.sv, c.sv),
                            z -> (z[1] - z[2]) * (z[1] - z[2]))) AS d2
                 FROM qsub qs
                 JOIN nc ON nc.j = qs.j
                 JOIN subc c ON c.j = nc.j AND c.cid = nc.cid
                 WHERE qs.vec_id <> nc.vec_id),
        adc AS (SELECT query_id, neighbor_id, round(sum(d2), 6) AS dist2
                FROM pair GROUP BY query_id, neighbor_id),
        short AS (SELECT query_id, neighbor_id
                  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                            ORDER BY dist2, neighbor_id) AS rnk FROM adc)
                  WHERE rnk <= {PQ_SHORTLIST}),
        exact AS (SELECT s.query_id, s.neighbor_id,
                         round(list_sum(list_transform(
                             list_zip(qe.v, ne.v),
                             z -> (z[1] - z[2]) * (z[1] - z[2]))), 6) AS dist2
                  FROM short s
                  JOIN e qe ON qe.vec_id = s.query_id
                  JOIN e ne ON ne.vec_id = s.neighbor_id),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY dist2, neighbor_id) AS rnk FROM exact)
        SELECT query_id, neighbor_id, dist2, rnk::BIGINT AS rank
        FROM ranked WHERE rnk <= {TOPK_K}
    """,
    tags=("llm", "similarity"),
)
def similarity_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN serving (similarity.pq_rerank_topk): ADC over
    m-byte PQ codes shortlists PQ_SHORTLIST candidates per query, then
    exact squared-L2 reranks only those against raw vectors — the
    returned distances/order are exact, approximation confined to
    shortlist membership. Deterministic end to end, so the oracle
    replays both stages in one statement."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    out = similarity.pq_rerank_topk(
        emb, q, "vec_id", "embedding",
        k=TOPK_K, shortlist=PQ_SHORTLIST, m=PQ_M, n_codes=PQ_CODES,
    )
    return out.select(
        "query_id", "neighbor_id", "dist2",
        F.col("rank").cast("long").alias("rank"),
    )


IVFADC_N_PROBE = 4


_IVFADC_TOPK_ORACLE = f"""
        WITH {_ivf_assign_sql()},
        {_pq_ctes("pq_")},
        corpus AS (SELECT vec_id, cid AS list_id FROM assigned WHERE rn = 1),
        probes AS (SELECT vec_id AS query_id, cid AS list_id
                   FROM assigned
                   WHERE rn <= {IVFADC_N_PROBE} AND vec_id < {TOPK_QUERY_MAX_ID}),
        nc AS (SELECT vec_id, j, cid FROM pq_a WHERE rn = 1),
        qsub AS (SELECT vec_id, j, sv FROM pq_sube
                 WHERE vec_id < {TOPK_QUERY_MAX_ID}),
        pair AS (SELECT p.query_id, c.vec_id AS neighbor_id,
                        list_sum(list_transform(list_zip(qs.sv, sc.sv),
                            z -> (z[1] - z[2]) * (z[1] - z[2]))) AS d2
                 FROM probes p
                 JOIN corpus c ON c.list_id = p.list_id
                              AND c.vec_id <> p.query_id
                 JOIN qsub qs ON qs.vec_id = p.query_id
                 JOIN nc ON nc.vec_id = c.vec_id AND nc.j = qs.j
                 JOIN pq_subc sc ON sc.j = qs.j AND sc.cid = nc.cid),
        adc AS (SELECT query_id, neighbor_id, round(sum(d2), 6) AS dist2
                FROM pair GROUP BY query_id, neighbor_id),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY dist2, neighbor_id) AS rnk FROM adc)
        SELECT query_id, neighbor_id, dist2, rnk::BIGINT AS rank
        FROM ranked WHERE rnk <= {TOPK_K}
    """


@register(
    "similarity_ivfadc_topk",
    # Composes the two deterministic replay chains: the IVF chain owns
    # the unprefixed e/seeds/assigned names, the PQ chain is emitted
    # with a pq_ prefix. Probing and encoding are independent pipelines
    # over the same vectors, exactly as in the Spark operator.
    oracle=_IVFADC_TOPK_ORACLE,
    tags=("llm", "similarity"),
)
def similarity_ivfadc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC — the production ANN composition (similarity.ivfadc_topk):
    IVF coarse lists prune the scan to n_probe/n_centroids of the
    corpus, PQ codes compress what is read to m bytes/vector. Both
    quantizers are deterministic (lowest-id seeds + one Lloyd pass),
    so the oracle replays coarse assignment, codebook refinement,
    encoding and asymmetric distance in one composed SQL statement.

    Pins ``codebook_strategy="literal"`` — the literal leg of the
    serving-mode A/B (the operator DEFAULT is broadcast; see
    similarity_ivfadc_topk_broadcast)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    out = similarity.ivfadc_topk(
        emb, q, "vec_id", "embedding",
        k=TOPK_K, n_centroids=16, n_probe=IVFADC_N_PROBE,
        m=PQ_M, n_codes=PQ_CODES,
        codebook_strategy="literal",
    )
    return out.select(
        "query_id", "neighbor_id", "dist2",
        F.col("rank").cast("long").alias("rank"),
    )


# fastText-style linear quality model: one weight dict drives BOTH the
# Spark map literal and the SQL CASE chain — single source of truth.
CLS_WEIGHTS: dict[str, float] = {
    "fast": 1.2,
    "data": 0.8,
    "query": 0.6,
    "spark": 0.9,
    "slow": -1.5,
    "small": -0.4,
}
CLS_BIAS = 0.0
CLS_THRESHOLD = 0.5


def _classifier_oracle() -> str:
    cases = " ".join(
        f"WHEN '{k}' THEN {v!r}" for k, v in CLS_WEIGHTS.items()
    )
    mean = (
        f"(coalesce(list_sum(list_transform(toks, t -> CASE t {cases} "
        f"ELSE 0.0 END)), 0.0) / greatest(len(toks), 1))"
    )
    score = f"(1.0 / (1.0 + exp(-({CLS_BIAS!r} + {mean}))))"
    return f"""
        WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents)
        SELECT doc_id, len(toks)::INT AS n_tokens,
               round({score}, 6) AS score,
               ({score} >= {CLS_THRESHOLD!r}) AS label
        FROM t
    """



@register(
    "similarity_ivfadc_topk_broadcast",
    oracle=_IVFADC_TOPK_ORACLE,
    tags=("llm", "similarity"),
)
def similarity_ivfadc_topk_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC with BOTH the coarse centroids and the PQ codebooks
    carried as single broadcast-joined rows (codebook_strategy=
    "broadcast") — plan O(1) in n_centroids and m*n_codes, the
    production configuration for real list/code counts. Result-
    identical to similarity_ivfadc_topk by construction; same
    oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    out = similarity.ivfadc_topk(
        emb,
        q,
        "vec_id",
        "embedding",
        k=TOPK_K,
        n_centroids=16,
        n_probe=4,
        m=PQ_M,
        n_codes=PQ_CODES,
        codebook_strategy="broadcast",
    )
    return out.select(
        "query_id", "neighbor_id", "dist2",
        F.col("rank").cast("long").alias("rank"),
    )


@register(
    "text_classifier_quality",
    oracle=_classifier_oracle(),
    tags=("llm", "text"),
)
def text_classifier_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring: linear bag-of-words classifier
    (mean token weight + bias through a sigmoid — the fastText /
    CCNet-style quality-filter shape) with the weight table as plan
    literals. Deterministic, so the oracle replays the same weights as
    a SQL CASE chain (operators.text.classifier_score)."""
    return text.classifier_score(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        CLS_WEIGHTS,
        bias=CLS_BIAS,
        threshold=CLS_THRESHOLD,
    )


@register(
    "python_udtf_word_stream",
    oracle="""
        SELECT p_partkey, (ord - 1)::INT AS pos, word,
               (length(word) >= 6) AS is_long FROM (
            SELECT p_partkey,
                   unnest(string_split(p_name, ' ')) AS word,
                   unnest(range(1, len(string_split(p_name, ' ')) + 1)) AS ord
            FROM part)
    """,
    tags=("llm", "udf"),
)
def python_udtf_word_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL Python UDTF seam (`@udtf`, Spark 3.5+/4): a
    user-defined table function yielding one row per word with its
    position and a derived flag — the API-level twin of
    udtf_posexplode_part_words (which covers the same semantics with
    the built-in generator; this one covers the extension point).
    UDTFs run row-at-a-time in Python — fine for a seam demo; hot
    paths belong in posexplode or mapInPandas, exactly like the
    python_udf_rowwise / pandas_udf pairing."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string, is_long boolean")
    class WordStream:
        def eval(self, name: str):
            if name is None:
                return
            for i, w in enumerate(name.split(" ")):
                yield i, w, len(w) >= 6

    spark.udtf.register("word_stream", WordStream)
    part = _t(spark, sf_dir, "part")
    part.select("p_partkey", "p_name").createOrReplaceTempView("__udtf_part")
    return spark.sql(
        "SELECT p.p_partkey, s.pos, s.word, s.is_long "
        "FROM __udtf_part p, LATERAL word_stream(p.p_name) s"
    )


@register(
    "variant_events_extract",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_variant,
               json_extract_string(props, '$.k') IS NOT NULL AS has_k
        FROM events
    """,
    tags=("llm",),
)
def variant_events_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT type (Spark 4): parse each event's JSON
    props into a VARIANT once, then extract typed fields with
    variant_get — the columnar-shredding-friendly path that replaces
    repeated get_json_object string re-parsing (one parse per row, not
    one per extraction). The oracle reads the same field with DuckDB's
    JSON extraction."""
    e = _t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    staged = e.select("event_id", v.alias("__v"))
    return staged.select(
        "event_id",
        F.try_variant_get(F.col("__v"), "$.k", "bigint").alias("k_variant"),
        F.try_variant_get(F.col("__v"), "$.k", "bigint").isNotNull().alias(
            "has_k"
        ),
    )


@register(
    "text_normalize_docs",
    oracle=r"""
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS text_norm,
               length(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                   AS n_chars_norm
        FROM documents
    """,
    tags=("llm", "text"),
)
def text_normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical normalization before hashing (operators.text.
    normalize_text): lowercase + whitespace-collapse + trim, row-local
    and zero-shuffle. strip_punct stays off here — the portable \\w is
    ASCII, which would strip CJK from the zh fixture docs."""
    return text.normalize_text(
        _t(spark, sf_dir, "documents"), "doc_id", "text"
    )


DOMAIN_BEST_KEEP = 5


def _domain_best_oracle() -> str:
    all_stop = sorted({w for ws in text.STOPWORDS.values() for w in ws})
    stop_list = ", ".join(f"'{w}'" for w in all_stop)
    return f"""
        WITH t AS (SELECT doc_id AS id, source AS domain, text,
                          {_SQL_TOKENS} AS w
                   FROM documents),
        q AS (SELECT id, domain,
                     round((least(len(w) / 100.0, 1.0)
                        + len(list_filter(list_distinct(w),
                              x -> list_contains([{stop_list}], x))) * 1.0
                          / greatest(len(list_distinct(w)), 1)
                        + length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
                          / greatest(length(text), 1)) / 3.0, 6) AS quality
              FROM t),
        r AS (SELECT *, row_number() OVER (PARTITION BY domain
                          ORDER BY quality DESC, id) AS rn FROM q)
        SELECT id AS doc_id, domain, quality, rn::INT AS quality_rank
        FROM r WHERE rn <= {DOMAIN_BEST_KEEP}
    """


@register(
    "domain_best_docs",
    oracle=_domain_best_oracle(),
    tags=("llm", "text"),
)
def domain_best_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked per-domain selection (operators.text.
    domain_best_docs): each source's DOMAIN_BEST_KEEP highest-quality
    docs, ties to the lower id — classifier-seed sampling, vs
    domain_cap's id-ordered anti-spam cut. WindowGroupLimit plan."""
    return text.domain_best_docs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", "source",
        DOMAIN_BEST_KEEP,
    )


WEB_DOMAIN_CAP = 15
WEB_MIN_QUALITY = 0.3


def _web_pipeline_oracle() -> str:
    all_stop = sorted({w for ws in text.STOPWORDS.values() for w in ws})
    stop_list = ", ".join(f"'{w}'" for w in all_stop)
    quality = f"""round((least(len(w) / 100.0, 1.0)
        + len(list_filter(list_distinct(w),
              x -> list_contains([{stop_list}], x))) * 1.0
          / greatest(len(list_distinct(w)), 1)
        + length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
          / greatest(length(text), 1)) / 3.0, 6)"""
    return f"""
        WITH capped AS (
            SELECT doc_id, text, lang, source
            FROM (SELECT *, row_number() OVER (PARTITION BY source
                                               ORDER BY doc_id) AS rn
                  FROM documents)
            WHERE rn <= {WEB_DOMAIN_CAP}),
        t AS (SELECT doc_id, text, lang, source, {_SQL_TOKENS} AS w
              FROM capped),
        q AS (SELECT doc_id, text, lang, source FROM t
              WHERE {quality} >= {WEB_MIN_QUALITY}),
        d AS (SELECT *, row_number() OVER (PARTITION BY md5(text)
                                           ORDER BY doc_id) AS rn2 FROM q)
        SELECT doc_id, lang, source FROM d WHERE rn2 = 1
    """


@register(
    "jobspec_web_pipeline",
    oracle=_web_pipeline_oracle(),
    tags=("llm", "udf", "text"),
)
def jobspec_web_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative web-corpus curation — the Common-Crawl front half
    as ONE JobSpec plan Catalyst sees whole: per-domain cap (anti-
    spam) → heuristic quality gate (row-local, fused into the scan) →
    corpus-wide exact dedup keep-first. Two keyed window shuffles
    total (domain rank, digest rank); the gate never shuffles."""
    import os

    from lambda_refarch_mapreduce_spark.plans.jobspec import JobSpec, run_jobspec

    spec = JobSpec(
        source={
            "format": "parquet",
            "path": os.path.join(sf_dir, "documents.parquet"),
        },
        prep=[
            {"op": "domain_cap", "domain": "source", "cap": WEB_DOMAIN_CAP},
            {"op": "quality_filter", "min_quality": WEB_MIN_QUALITY},
            {"op": "dedup_exact"},
        ],
        select={"doc_id": "doc_id", "lang": "lang", "source": "source"},
    )
    return run_jobspec(spark, spec)


@register(
    "text_char_entropy",
    oracle=r"""
        WITH t AS (SELECT doc_id, text, length(text) AS n,
                          list_sort(list_distinct(
                              list_transform(range(1, greatest(length(text), 1) + 1),
                                             i -> substr(text, i::INT, 1))
                          )) AS uniq,
                          list_transform(range(1, greatest(length(text), 1) + 1),
                                         i -> substr(text, i::INT, 1)) AS chars
                   FROM documents)
        SELECT doc_id, n::INT AS n_chars,
               CASE WHEN n > 0 THEN len(uniq) ELSE 0 END AS n_distinct_chars,
               CASE WHEN n > 0 THEN
                   round(-list_sum(list_transform(uniq,
                       u -> (len(list_filter(chars, c -> c = u)) * 1.0 / n)
                            * ln(len(list_filter(chars, c -> c = u)) * 1.0 / n))), 6)
               ELSE 0.0 END AS char_entropy
        FROM t
    """,
    tags=("llm", "text"),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy (operators.text.
    char_entropy): the gibberish/binary-spill quality signal.
    Row-local, zero shuffle; the distinct-char list is sorted before
    the fold so float accumulation order matches across engines."""
    return text.char_entropy(_t(spark, sf_dir, "documents"), "doc_id", "text")


IDS_VOCAB = 512


@register(
    "text_tokens_to_ids",
    oracle=f"""
        WITH t AS (SELECT doc_id AS id, {_SQL_TOKENS} AS w FROM documents),
        tok AS (SELECT id, unnest(w) AS token,
                       unnest(range(len(w))) AS pos
                FROM t),
        freq AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
        vocab AS (SELECT token,
                         row_number() OVER (ORDER BY c DESC, token) AS tok_id
                  FROM freq ORDER BY c DESC, token LIMIT {IDS_VOCAB}),
        m AS (SELECT tok.id, tok.pos,
                     coalesce(vocab.tok_id, 0) AS tok_id
              FROM tok LEFT JOIN vocab USING (token)),
        s AS (SELECT id, count(*) AS n_tokens,
                     sum(CASE WHEN tok_id = 0 THEN 1 ELSE 0 END) AS oov_count,
                     string_agg(tok_id, ',' ORDER BY pos) AS ids_csv
              FROM m GROUP BY id)
        SELECT d.doc_id,
               coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
               coalesce(s.oov_count, 0)::BIGINT AS oov_count,
               coalesce(s.ids_csv, '') AS ids_csv
        FROM documents d LEFT JOIN s ON s.id = d.doc_id
    """,
    tags=("llm", "text"),
)
def text_tokens_to_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary lookup (operators.text.tokens_to_ids): corpus top-V
    tokens get rank ids 1..V, OOV -> 0, documents become id sequences
    — the stage feeding sequence packing. The id-assignment window
    runs over the VOCAB-sized table only; sequences reassemble through
    one id-keyed shuffle."""
    return text.tokens_to_ids(
        _t(spark, sf_dir, "documents"), "doc_id", "text", IDS_VOCAB
    )


NEG_K = 4
NEG_BUCKETS = 16


def _neg_samples_oracle() -> str:
    h_id = _sql_salted_hash("id::VARCHAR", 0)
    probe = "s.id::VARCHAR || ':' || s.slot::VARCHAR"
    h_b = _sql_salted_hash(probe, 1)
    h_i = _sql_salted_hash(probe, 2)
    return f"""
        WITH ids AS (SELECT vec_id AS id FROM embeddings),
        b AS (SELECT id, {h_id} % {NEG_BUCKETS} AS bucket FROM ids),
        ix AS (SELECT id, bucket,
                      row_number() OVER (PARTITION BY bucket
                                         ORDER BY id) - 1 AS idx
               FROM b),
        sz AS (SELECT bucket, count(*) AS bsize FROM ix GROUP BY bucket),
        slots AS (SELECT id, unnest(range({NEG_K})) AS slot FROM ids),
        t AS (SELECT s.id, s.slot, {h_b} % {NEG_BUCKETS} AS bucket,
                     {h_i} AS hraw
              FROM slots s),
        t2 AS (SELECT t.id, t.slot, t.bucket, t.hraw % sz.bsize AS idx
               FROM t JOIN sz USING (bucket))
        SELECT t2.id AS vec_id, t2.slot::INT AS slot, n.id AS negative_id
        FROM t2 JOIN ix n ON n.bucket = t2.bucket AND n.idx = t2.idx
        WHERE n.id <> t2.id
    """


@register(
    "contrastive_negative_samples",
    oracle=_neg_samples_oracle(),
    tags=("llm", "similarity"),
)
def contrastive_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible random negatives for contrastive training
    (similarity.negative_samples): portable-hash bucket dealing + a
    fixed-width (bucket, idx) equi-join — no array payloads, no cross
    join; the oracle replays the identical hash arithmetic."""
    out = similarity.negative_samples(
        _t(spark, sf_dir, "embeddings"), "vec_id", NEG_K, 0, NEG_BUCKETS
    )
    return out.select(
        "vec_id", F.col("slot").cast("int").alias("slot"), "negative_id"
    )


@register(
    "embedding_group_centroids",
    oracle="""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        j AS (SELECT d.lang AS grp, e.v
              FROM e JOIN documents d ON d.doc_id = e.vec_id),
        x AS (SELECT grp, unnest(v) AS val, unnest(range(len(v))) AS dim
              FROM j)
        SELECT grp AS "group", dim::INT AS dim,
               round(avg(val), 6) AS centroid_val,
               count(*)::BIGINT AS n_vectors
        FROM x GROUP BY grp, dim
    """,
    tags=("llm", "similarity"),
)
def embedding_group_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language mean embedding (similarity.group_centroids): the
    domain-centroid summary for curation dashboards and per-class
    pruning seeds. Computed as dim fixed aggregate buffers with
    map-side combine — the corpus is never exploded to (row x dim)
    rows; the oracle unnests because DuckDB has no positional array
    aggregate, but the VALUES must match exactly."""
    return similarity.group_centroids(
        _t(spark, sf_dir, "embeddings"),
        _t(spark, sf_dir, "documents"),
        "vec_id",
        "embedding",
        "doc_id",
        "lang",
    )


TOP_NGRAM_N = 3
TOP_NGRAM_K = 20


def _top_ngrams_oracle() -> str:
    n = TOP_NGRAM_N
    joined = " || ' ' || ".join(
        f"w[i + {j}]" if j else "w[i]" for j in range(n)
    )
    grams = (
        f"list_transform(range(1, greatest(len(w) - {n - 1}, 0) + 1), "
        f"i -> {joined})"
    )
    return f"""
        WITH t AS (SELECT {_SQL_TOKENS} AS w FROM documents),
        g AS (SELECT unnest({grams}) AS ngram FROM t)
        SELECT ngram, count(*)::BIGINT AS cnt
        FROM g GROUP BY ngram
        ORDER BY cnt DESC, ngram LIMIT {TOP_NGRAM_K}
    """


@register(
    "corpus_top_ngrams",
    oracle=_top_ngrams_oracle(),
    tags=("llm", "text"),
)
def corpus_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide most-frequent n-grams (operators.text.
    corpus_top_ngrams) — the boilerplate detector behind C4-style
    cleaning rules. Map-side-combined count shuffle +
    TakeOrderedAndProject top-k, deterministic tie-break on gram."""
    return text.corpus_top_ngrams(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        TOP_NGRAM_N, TOP_NGRAM_K,
    )


@register(
    "corpus_diff_snapshots",
    oracle="""
        WITH old AS (SELECT doc_id AS id, md5(text) AS d FROM documents),
        new AS (
            SELECT doc_id AS id,
                   md5(CASE WHEN doc_id % 7 = 0 THEN text || ' zzz'
                            ELSE text END) AS d
            FROM documents WHERE doc_id % 10 <> 0
            UNION ALL
            SELECT doc_id + 1000000 AS id, md5('fresh ' || text) AS d
            FROM documents WHERE doc_id % 25 = 0),
        j AS (SELECT coalesce(o.id, n.id) AS id, o.d AS od, n.d AS nd
              FROM old o FULL OUTER JOIN new n ON o.id = n.id)
        SELECT id AS doc_id,
               CASE WHEN od IS NULL THEN 'added'
                    WHEN nd IS NULL THEN 'removed'
                    ELSE 'changed' END AS status
        FROM j
        WHERE od IS NULL OR nd IS NULL OR od <> nd
    """,
    tags=("llm", "text"),
)
def corpus_diff_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (operators.text.corpus_diff): the release
    audit between two pipeline versions. The "new" snapshot is derived
    deterministically from the fixture (every 10th doc removed, every
    7th surviving doc changed, every 25th spawning an added doc), and
    both engines build the identical pair; the diff itself shuffles
    only (id, digest) projections."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    new = docs.filter(d % 10 != 0).select(
        "doc_id",
        F.when(d % 7 == 0, F.concat(F.col("text"), F.lit(" zzz")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = docs.filter(d % 25 == 0).select(
        (d + 1000000).alias("doc_id"),
        F.concat(F.lit("fresh "), F.col("text")).alias("text"),
    )
    return text.corpus_diff(
        docs, new.unionByName(added), "doc_id", "text"
    )


@register(
    "corpus_drift_psi",
    # PSI = sum over bins of (pA - pB) * ln(pA/pB): the standard
    # population-stability drift score between two corpus snapshots.
    # Laplace-smoothed (+0.5/bin) so empty bins can't divide by zero;
    # 6dp rounding absorbs the <=1-ulp libm ln() difference between
    # engines.
    oracle="""
        WITH d AS (SELECT doc_id % 2 AS snap,
                          least(length(text) // 100, 9) AS bin
                   FROM documents),
        c AS (SELECT bin,
                     sum(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS n_a,
                     sum(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS n_b
              FROM d GROUP BY bin),
        t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM c)
        SELECT bin::BIGINT AS bin, n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
               round((n_a + 0.5) / (ta + 5.0), 6) AS p_a,
               round((n_b + 0.5) / (tb + 5.0), 6) AS p_b,
               round(((n_a + 0.5) / (ta + 5.0) - (n_b + 0.5) / (tb + 5.0))
                     * ln(((n_a + 0.5) / (ta + 5.0))
                          / ((n_b + 0.5) / (tb + 5.0))), 6) AS psi_contrib
        FROM c, t
    """,
    tags=("llm", "quality", "drift"),
)
def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor between two corpus snapshots
    (population stability index over document-length bins) — the
    release gate that catches a pipeline change silently shifting the
    data mix. Snapshots are the deterministic doc_id-parity split of
    the fixture; the feature is length(text) binned at 100 chars
    (capped at bin 9). Plan: one row-local binning projection, one
    hash aggregation to |bins| rows, a single-row totals broadcast —
    the corpus is scanned once and never reshuffled, so the monitor
    costs one pass at any scale."""
    docs = _t(spark, sf_dir, "documents").select(
        F.pmod(F.col("doc_id"), F.lit(2)).alias("snap"),
        text.length_bin(F.col("text")).alias("bin"),
    )
    c = docs.groupBy("bin").agg(
        F.sum((F.col("snap") == 0).cast("long")).alias("n_a"),
        F.sum((F.col("snap") == 1).cast("long")).alias("n_b"),
    )
    t = c.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    p_a = (F.col("n_a") + 0.5) / (F.col("ta") + 5.0)
    p_b = (F.col("n_b") + 0.5) / (F.col("tb") + 5.0)
    return c.crossJoin(F.broadcast(t)).select(
        "bin",
        "n_a",
        "n_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round((p_a - p_b) * F.log(p_a / p_b), 6).alias("psi_contrib"),
    )


CURRICULUM_STAGES = 4


def _curriculum_oracle() -> str:
    all_stop = sorted({w for ws in text.STOPWORDS.values() for w in ws})
    stop_list = ", ".join(f"'{w}'" for w in all_stop)
    return f"""
        WITH t AS (SELECT doc_id AS id, text, {_SQL_TOKENS} AS w
                   FROM documents),
        q AS (SELECT id,
                     round((least(len(w) / 100.0, 1.0)
                        + len(list_filter(list_distinct(w),
                              x -> list_contains([{stop_list}], x))) * 1.0
                          / greatest(len(list_distinct(w)), 1)
                        + length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
                          / greatest(length(text), 1)) / 3.0, 6) AS quality
              FROM t),
        r AS (SELECT id, quality,
                     row_number() OVER (ORDER BY quality DESC, id) AS rnk,
                     count(*) OVER () AS n
              FROM q)
        SELECT id AS doc_id, quality,
               (floor((rnk - 1) * {CURRICULUM_STAGES} / n) + 1)::INT AS stage,
               ('0x' || substr(md5('0:' || id::VARCHAR), 1, 15))::BIGINT
                   AS shuffle_key
        FROM r
    """


@register(
    "curriculum_order_docs",
    oracle=_curriculum_oracle(),
    tags=("llm", "text"),
)
def curriculum_order_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering (operators.text.curriculum_order): equal-
    size quality tiers from a DISTRIBUTED global rank (two-phase
    range-sort + broadcast offsets — never a single-partition window)
    plus a portable deterministic intra-stage shuffle key. Stage is
    arithmetic on the rank, so Spark and the oracle agree without
    depending on SQL ntile's remainder rule."""
    return text.curriculum_order(
        _t(spark, sf_dir, "documents"), "doc_id", "text", CURRICULUM_STAGES
    )


def _corpus_report_oracle() -> str:
    all_stop = sorted({w for ws in text.STOPWORDS.values() for w in ws})
    stop_list = ", ".join(f"'{w}'" for w in all_stop)
    return f"""
        WITH t AS (SELECT doc_id AS id, lang AS grp, text,
                          {_SQL_TOKENS} AS w
                   FROM documents),
        m AS (SELECT id, grp, len(w) AS n_tokens, md5(text) AS digest,
                     round((least(len(w) / 100.0, 1.0)
                        + len(list_filter(list_distinct(w),
                              x -> list_contains([{stop_list}], x))) * 1.0
                          / greatest(len(list_distinct(w)), 1)
                        + length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
                          / greatest(length(text), 1)) / 3.0, 6) AS quality
              FROM t),
        d AS (SELECT *, row_number() OVER (PARTITION BY digest
                                           ORDER BY id) AS rn FROM m),
        per AS (SELECT grp, count(*) AS n_docs,
                       sum(n_tokens) AS total_tokens,
                       quantile_cont(n_tokens, 0.5) AS p50,
                       quantile_cont(n_tokens, 0.9) AS p90,
                       avg(quality) AS avg_q,
                       sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS n_dup
                FROM d GROUP BY grp),
        g AS (SELECT sum(total_tokens)::DOUBLE AS gt FROM per)
        SELECT grp AS "group", n_docs::BIGINT AS n_docs,
               total_tokens::BIGINT AS total_tokens,
               round(p50, 6) AS p50_tokens, round(p90, 6) AS p90_tokens,
               round(avg_q, 6) AS avg_quality, n_dup::BIGINT AS n_dup_docs,
               round(total_tokens / g.gt, 6) AS token_share
        FROM per CROSS JOIN g
    """


@register(
    "corpus_stats_report",
    oracle=_corpus_report_oracle(),
    tags=("llm", "text"),
)
def corpus_stats_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset report card per language (operators.text.
    corpus_stats_report): doc/token counts, exact p50/p90 token
    lengths, mean quality, corpus-wide exact-dup counts, token share.
    One corpus scan + one digest window; the grand total re-aggregates
    the |groups|-row table, never the corpus."""
    return text.corpus_stats_report(
        _t(spark, sf_dir, "documents"), "doc_id", "text", "lang"
    )


@register(
    "text_bpe_pair_counts",
    oracle=f"""
        WITH t AS (SELECT {_SQL_TOKENS} AS w FROM documents),
        wd AS (SELECT unnest(w) AS word FROM t),
        wc AS (SELECT word, count(*) AS c FROM wd GROUP BY word),
        p AS (SELECT c, substr(word, i::INT, 1) AS l,
                     substr(word, i::INT + 1, 1) AS r
              FROM (SELECT word, c, unnest(range(1, length(word))) AS i
                    FROM wc WHERE length(word) >= 2))
        SELECT l AS pair_left, r AS pair_right,
               sum(c)::BIGINT AS pair_count
        FROM p GROUP BY 1, 2
    """,
    tags=("llm", "text"),
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training round 1 (operators.text.bpe_pair_counts,
    Sennrich et al. 2016): adjacent character-pair frequencies
    weighted by word counts. The pair explode runs over the word-
    frequency VOCAB, never the corpus — corpus scale enters only
    through one map-side-combined word count."""
    return text.bpe_pair_counts(
        _t(spark, sf_dir, "documents"), "doc_id", "text"
    )


# Deterministic messy-URL construction shared by the Spark program and
# the SQL oracle: the fixture has no URL column, so one is derived from
# (source, doc_id) with scheme-case / www / default-port / trailing-
# slash / fragment variation cycling by doc_id — every canonicalization
# rule gets exercised, and both engines build the identical input.
DOMAIN_CAP = 10


@register(
    "url_canonicalize_docs",
    oracle="""
        WITH u0 AS (
            SELECT doc_id,
                   (CASE doc_id % 3 WHEN 0 THEN 'http://'
                                    WHEN 1 THEN 'HTTPS://www.'
                                    ELSE 'https://' END)
                   || source || '.Example.COM'
                   || (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END)
                   || '/Docs/' || doc_id
                   || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
                   || (CASE WHEN doc_id % 2 = 0 THEN '#frag' ELSE '' END)
                   AS url_raw
            FROM documents),
        c1 AS (SELECT doc_id, url_raw,
                      regexp_replace(url_raw, '#.*$', '') AS u FROM u0),
        c2 AS (SELECT doc_id, url_raw,
                      regexp_replace(regexp_replace(u, '(?i)^https?://', ''),
                                     '(?i)^www\\.', '') AS u FROM c1),
        c3 AS (SELECT doc_id, url_raw,
                      regexp_replace(
                          replace(replace(u, ':80/', '/'), ':443/', '/'),
                          ':(80|443)$', '') AS u FROM c2),
        c4 AS (SELECT doc_id, url_raw,
                      lower(split_part(u, '/', 1))
                      || (CASE WHEN strpos(u, '/') > 0
                               THEN substr(u, strpos(u, '/')) ELSE '' END)
                      AS u FROM c3),
        c5 AS (SELECT doc_id, url_raw,
                      regexp_replace(u, '[?/]+$', '') AS url_canon FROM c4)
        SELECT doc_id, url_raw, url_canon,
               split_part(split_part(url_canon, '/', 1), ':', 1) AS domain
        FROM c5
    """,
    tags=("llm", "text"),
)
def url_canonicalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (functions.scalar.url_canonicalize): strip
    fragment / scheme / www / default ports, lowercase the host, drop
    trailing '?' and '/'. Row-local portable regex, zero shuffle —
    fuses into the scan; the oracle replays both the URL construction
    and every canonicalization step with the same RE2-safe patterns."""
    from lambda_refarch_mapreduce_spark.functions.scalar import (
        url_canonicalize,
        url_domain,
    )

    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 3 == 0, F.lit("http://"))
        .when(d % 3 == 1, F.lit("HTTPS://www."))
        .otherwise(F.lit("https://")),
        F.col("source"),
        F.lit(".Example.COM"),
        F.when(d % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/Docs/"),
        d.cast("string"),
        F.when(d % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 2 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    staged = _t(spark, sf_dir, "documents").select(
        "doc_id", url.alias("url_raw")
    )
    canon = url_canonicalize(F.col("url_raw"))
    return staged.select(
        "doc_id",
        "url_raw",
        canon.alias("url_canon"),
        url_domain(canon).alias("domain"),
    )


@register(
    "domain_cap_docs",
    oracle=f"""
        SELECT doc_id, source, rn::BIGINT AS domain_rank
        FROM (SELECT doc_id, source,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY doc_id) AS rn
              FROM documents)
        WHERE rn <= {DOMAIN_CAP}
    """,
    tags=("llm", "text"),
)
def domain_cap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (operators.text.domain_cap, C4/CC
    anti-spam pass) keyed on the fixture's source column: keep each
    domain's DOMAIN_CAP lowest-id docs. One domain-keyed shuffle; the
    rank filter plans as WindowGroupLimit so a mega-domain never
    materializes past the cap."""
    out = text.domain_cap(
        _t(spark, sf_dir, "documents").select("doc_id", "source"),
        "doc_id",
        "source",
        DOMAIN_CAP,
    )
    return out.select(
        "doc_id", "source", F.col("domain_rank").cast("long").alias("domain_rank")
    )


C4_MIN_KEPT_LINES = 2
C4_BAD_LINE_WORD = "slow"  # stands in for C4's "javascript" line rule


def _c4_clean_oracle() -> str:
    w = PARA_CHUNK_W
    return rf"""
        WITH t AS (SELECT doc_id, text, {_SQL_TOKENS} AS w FROM documents),
        c AS (SELECT doc_id, text,
                     list_transform(range(1, cast(ceil(len(w) / {w}.0) AS INT) + 1),
                                    i -> array_to_string(w[(i - 1) * {w} + 1 : i * {w}], ' ')) AS lines
              FROM t),
        k AS (SELECT doc_id, len(lines) AS n_lines,
                     list_filter(lines,
                         l -> len(regexp_extract_all(l, '\S+')) >= {w}
                              AND NOT contains(lower(l), '{C4_BAD_LINE_WORD}')) AS kept
              FROM c
              WHERE NOT contains(lower(text), 'lorem ipsum'))
        SELECT doc_id, n_lines::INT AS n_lines, len(kept)::INT AS n_lines_kept,
               array_to_string(kept, chr(10)) AS text_clean
        FROM k WHERE len(kept) >= {C4_MIN_KEPT_LINES}
    """


@register("text_c4_line_clean", oracle=_c4_clean_oracle(), tags=("llm", "text"))
def text_c4_line_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate line cleaning (Raffel et al. 2020 §2.2)
    over pseudo-lines: fixture docs are flat word streams with no
    punctuation, so re-chunk into PARA_CHUNK_W-token lines first, then
    drop short lines and lines containing the stand-in bad word
    ('slow' ~ C4's 'javascript' rule), and drop documents with fewer
    than C4_MIN_KEPT_LINES survivors or a 'lorem ipsum' page marker.
    The terminal-punctuation rule is exercised in tests (the fixture
    corpus has no punctuation to key on). Entirely row-local — fuses
    into the ingest scan at 100 TB."""
    docs = _t(spark, sf_dir, "documents")
    chunked = dedup.chunk_tokens(docs, "doc_id", "text", PARA_CHUNK_W)
    return text.c4_line_clean(
        chunked,
        "doc_id",
        "text",
        min_words_per_line=PARA_CHUNK_W,
        require_terminal_punct=False,
        bad_line_words=(C4_BAD_LINE_WORD,),
        bad_doc_substrings=("lorem ipsum",),
        min_kept_lines=C4_MIN_KEPT_LINES,
    )


@register("dedup_paragraphs_corpus", oracle=_para_oracle(), tags=("llm", "dedup"))
def dedup_paragraphs_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Dolma-style corpus-wide exact paragraph dedup: the fixture
    docs are flat word streams, so re-chunk tokens into PARA_CHUNK_W-
    token pseudo-paragraphs first, then keep each distinct paragraph
    only at its first (id, pos) occurrence and rebuild the documents
    (operators.dedup.paragraph_dedup — one digest-keyed shuffle + one
    rebuild shuffle)."""
    docs = _t(spark, sf_dir, "documents")
    chunked = dedup.chunk_tokens(docs, "doc_id", "text", PARA_CHUNK_W)
    return dedup.paragraph_dedup(chunked, "doc_id", "text", "\n")


SPAN_K = 8  # rolling-window width (tokens) for substring dedup


def _span_oracle() -> str:
    k = SPAN_K
    joined = " || ' ' || ".join(
        f"w[i + {j}]" if j else "w[i]" for j in range(k)
    )
    grams = (
        f"list_transform(range(1, greatest(len(w) - {k - 1}, 0) + 1), "
        f"i -> {joined})"
    )
    return f"""
        WITH t AS (SELECT doc_id AS id, {_SQL_TOKENS} AS w FROM documents),
        g0 AS (SELECT id, {grams} AS grams FROM t),
        g1 AS (SELECT id, unnest(grams) AS gram,
                      unnest(range(len(grams))) AS pos
               FROM g0),
        occ AS (SELECT id, pos,
                       row_number() OVER (PARTITION BY md5(gram)
                                          ORDER BY id, pos) AS rn
                FROM g1),
        cov0 AS (SELECT id, unnest(range(pos, pos + {k})) AS tokpos
                 FROM occ WHERE rn > 1),
        cov AS (SELECT DISTINCT id, tokpos FROM cov0),
        tok AS (SELECT id, unnest(w) AS token,
                       unnest(range(len(w))) AS tokpos
                FROM t),
        kept AS (SELECT tk.id, tk.tokpos, tk.token
                 FROM tok tk LEFT JOIN cov c
                   ON c.id = tk.id AND c.tokpos = tk.tokpos
                 WHERE c.id IS NULL),
        r AS (SELECT id, count(*) AS n_kept,
                     string_agg(token, ' ' ORDER BY tokpos) AS text_cleaned
              FROM kept GROUP BY id)
        SELECT t.id AS doc_id,
               len(w)::BIGINT AS n_tokens,
               (len(w) - coalesce(r.n_kept, 0))::BIGINT AS n_removed,
               coalesce(r.text_cleaned, '') AS text_cleaned
        FROM t LEFT JOIN r ON r.id = t.id
    """


@register("dedup_substring_spans", oracle=_span_oracle(), tags=("llm", "dedup"))
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup (Lee et al. 2022): every duplicated
    SPAN_K-token rolling window survives only at its globally-first
    (id, pos) occurrence; later occurrences' tokens are excised and
    documents rebuilt (operators.dedup.duplicate_span_excise). The
    keep-first shuffle carries fixed-width (id, pos, digest) rows —
    span text never rides a shuffle until the final per-doc rebuild."""
    return dedup.duplicate_span_excise(
        _t(spark, sf_dir, "documents"), "doc_id", "text", SPAN_K
    )


@register(
    "embedding_quantize_int8",
    oracle="""
        WITH m AS (SELECT vec_id, embedding,
                          list_max(list_transform(embedding,
                              x -> abs(x::DOUBLE))) / 127.0 AS s
                   FROM embeddings)
        SELECT vec_id,
               round(s, 6) AS scale,
               array_to_string(
                   CASE WHEN s > 0
                        THEN list_transform(embedding, x -> floor(x::DOUBLE / s + 0.5)::INT)
                        ELSE list_transform(embedding, x -> 0) END,
                   ',') AS q_csv,
               round(CASE WHEN s > 0
                          THEN list_max(list_transform(embedding,
                                   x -> abs(floor(x::DOUBLE / s + 0.5) * s - x::DOUBLE)))
                          ELSE 0.0 END, 6) AS max_abs_err
        FROM m
    """,
    tags=("llm", "similarity"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (4x bandwidth cut for the
    ANN tiers). Explicit floor(x/s + 0.5) half-up keeps Spark and
    DuckDB bit-identical where round()'s tie rules would diverge.

    The ``q`` int8 array is projected to a CSV string here (the
    operator itself returns the real array): the driver's
    canonicalizer sorts pandas frames, and raw list cells are
    unhashable — same portability trick as the dedup tier's md5
    digests."""
    out = similarity.quantize_embeddings(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding"
    )
    return out.select(
        "vec_id",
        "scale",
        F.concat_ws(
            ",", F.transform(F.col("q"), lambda x: x.cast("string"))
        ).alias("q_csv"),
        "max_abs_err",
    )


@register(
    "text_unigram_logprob",
    oracle=f"""
        WITH t AS (SELECT doc_id AS id, {_SQL_TOKENS} AS w FROM documents),
        tok AS (SELECT id, unnest(w) AS token FROM t),
        freq AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
        tot AS (SELECT sum(c) AS n FROM freq),
        top AS (SELECT token, ln(c / (SELECT n FROM tot)) AS logp
                FROM freq ORDER BY c DESC, token LIMIT {UNIGRAM_VOCAB}),
        fl AS (SELECT ln(0.5 / n) AS floor_logp FROM tot),
        sc AS (SELECT tok.id,
                      count(*) AS n_tokens,
                      round(avg(CASE WHEN top.token IS NULL THEN 1.0 ELSE 0.0 END), 6) AS oov_frac,
                      round(avg(coalesce(top.logp, fl.floor_logp)), 6) AS avg_logprob
               FROM tok LEFT JOIN top ON top.token = tok.token CROSS JOIN fl
               GROUP BY tok.id)
        SELECT d.doc_id,
               coalesce(sc.n_tokens, 0)::BIGINT AS n_tokens,
               coalesce(sc.oov_frac, 0.0) AS oov_frac,
               coalesce(sc.avg_logprob, 0.0) AS avg_logprob
        FROM documents d LEFT JOIN sc ON sc.id = d.doc_id
    """,
    tags=("llm", "text"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-relative unigram LM quality score: mean token
    log-prob under the corpus's own top-K unigram distribution, OOV at
    a half-count floor. Frequencies shrink to vocab size via map-side
    combine; the vocab returns as a broadcast join — the corpus is
    never shuffled, only the per-doc (id, partial-sum) rows are."""
    return text.unigram_logprob(
        _t(spark, sf_dir, "documents"), "doc_id", "text", UNIGRAM_VOCAB
    )


BIGRAM_ADD_K = 0.5


@register(
    "text_bigram_logprob",
    oracle=f"""
        WITH t AS (SELECT doc_id AS id, {_SQL_TOKENS} AS w FROM documents),
        bg AS (SELECT id, unnest(list_transform(
                   range(1, greatest(len(w) - 1, 0) + 1),
                   i -> w[i] || ' ' || w[i + 1])) AS bg
               FROM t),
        bgc AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY bg),
        uni AS (SELECT unnest(w) AS w1 FROM t),
        unic AS (SELECT w1, count(*) AS c1 FROM uni GROUP BY w1),
        v AS (SELECT count(*)::DOUBLE AS v FROM unic),
        sc AS (SELECT bg.id,
                      count(*) AS n_bigrams,
                      round(avg(ln((bgc.c2 + {BIGRAM_ADD_K}) /
                                   (unic.c1 + {BIGRAM_ADD_K} * v.v))), 6)
                          AS avg_logprob
               FROM bg
               JOIN bgc USING (bg)
               JOIN unic ON unic.w1 = split_part(bg.bg, ' ', 1)
               CROSS JOIN v
               GROUP BY bg.id)
        SELECT d.doc_id,
               coalesce(sc.n_bigrams, 0)::BIGINT AS n_bigrams,
               coalesce(sc.avg_logprob, 0.0) AS avg_logprob
        FROM documents d LEFT JOIN sc ON sc.id = d.doc_id
    """,
    tags=("llm", "text"),
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM quality score (operators.text.bigram_logprob): mean
    add-k-smoothed conditional log-prob of each document's adjacent
    token pairs under the corpus's own bigram/unigram counts — the
    next rung toward CCNet's KenLM perplexity gate after the unigram
    entry. Count tables shrink via map-side combine; the corpus is
    never broadcast."""
    return text.bigram_logprob(
        _t(spark, sf_dir, "documents"), "doc_id", "text", BIGRAM_ADD_K
    )


@register(
    "semdedup_embeddings",
    oracle=f"""
        WITH {_ivf_assign_sql()},
        corpus AS (SELECT vec_id, v, cid AS cluster_id
                   FROM assigned WHERE rn = 1),
        losers AS (SELECT DISTINCT b.vec_id
                   FROM corpus a JOIN corpus b
                     ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
                   WHERE {_COSINE_SQL.format(a="a.v", b="b.v")} >= 0.95)
        SELECT c.vec_id, c.cluster_id
        FROM corpus c LEFT JOIN losers l ON l.vec_id = c.vec_id
        WHERE l.vec_id IS NULL
    """,
    tags=("llm", "similarity"),
)
def semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup: spherical-k-means clusters as semantic blocks, exact
    cosine prune inside each block, keep-lowest-id survivors. The
    centroid refinement is deterministic (lowest-id seeds, one Lloyd
    pass, cid tie-breaks), so the oracle replays it in SQL — see
    _ivf_assign_sql; the planted-duplicate behavior stays pinned in
    test_operators."""
    return similarity.semdedup(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", threshold=0.95
    )


# ---------------------------------------------------------------------------
# Declarative training-data prep (JobSpec prep clause, end to end)
# ---------------------------------------------------------------------------

PREP_MIN_QUALITY = 0.4
PREP_MAX_DUP_FRAC = 0.05


def _jobspec_prep_oracle() -> str:
    all_stop = sorted({w for ws in text.STOPWORDS.values() for w in ws})
    stop_list = ", ".join(f"'{w}'" for w in all_stop)
    return f"""
        WITH t AS (SELECT doc_id, text, {_SQL_TOKENS} AS w FROM documents),
        q AS (SELECT doc_id, text, w,
                     round((least(len(w) / 100.0, 1.0)
                        + len(list_filter(list_distinct(w),
                              x -> list_contains([{stop_list}], x))) * 1.0
                            / greatest(len(list_distinct(w)), 1)
                        + length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
                            / greatest(length(text), 1)) / 3.0, 6) AS quality
              FROM t),
        g AS (SELECT doc_id, text, quality,
                     list_transform(range(1, greatest(len(w) - 1, 0) + 1),
                                    i -> w[i] || ' ' || w[i + 1]) AS grams
              FROM q WHERE quality >= {PREP_MIN_QUALITY}),
        r AS (SELECT doc_id, text, quality
              FROM g
              WHERE round((len(grams) - len(list_distinct(grams))) * 1.0
                          / greatest(len(grams), 1), 6) <= {PREP_MAX_DUP_FRAC}),
        p AS (SELECT doc_id, quality,
                     regexp_replace(regexp_replace(regexp_replace(text,
                         '{text.PII_EMAIL}', '<EMAIL>', 'g'),
                         '{text.PII_IPV4}', '<IP>', 'g'),
                         '{text.PII_PHONE}', '<PHONE>', 'g') AS text
              FROM r),
        d AS (SELECT doc_id, text, quality,
                     row_number() OVER (PARTITION BY md5(text)
                                        ORDER BY doc_id) AS rn
              FROM p)
        SELECT doc_id, text, quality FROM d WHERE rn = 1
    """


@register(
    "jobspec_training_prep", oracle=_jobspec_prep_oracle(), tags=("llm", "jobspec")
)
def jobspec_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declarative training-data prep job: one JobSpec whose prep
    clause chains quality gate → repetition gate → PII redaction →
    corpus keep-first exact dedup, then projects (doc_id, text,
    quality). Gates and redaction are row-local expressions (zero
    shuffle); the only shuffle in the whole job is dedup's digest-
    keyed window — the 100 TB plan a user gets from four dict lines."""
    from lambda_refarch_mapreduce_spark.plans.jobspec import JobSpec, build
    from lambda_refarch_mapreduce_spark.operators.text import quality_expr

    docs = _t(spark, sf_dir, "documents")
    spec = JobSpec(
        source={"df": docs.withColumn("quality", quality_expr(F.col("text")))},
        prep=[
            {"op": "quality_filter", "text": "text", "min_quality": PREP_MIN_QUALITY},
            {
                "op": "repetition_filter",
                "text": "text",
                "n": 2,
                "max_dup_frac": PREP_MAX_DUP_FRAC,
            },
            {"op": "pii_redact", "text": "text"},
            {"op": "dedup_exact", "id": "doc_id", "text": "text"},
        ],
        select={"doc_id": "doc_id", "text": "text", "quality": "quality"},
    )
    return build(spark, spec)


# ---------------------------------------------------------------------------
# Retrieval primitives: TF-IDF weights, BM25 search
# ---------------------------------------------------------------------------

BM25_QUERY = ["spark", "query", "window"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10


@register(
    "text_tfidf_terms",
    oracle=f"""
        WITH t AS (SELECT doc_id AS id, {_SQL_TOKENS} AS w FROM documents),
        tok AS (SELECT id, unnest(w) AS token FROM t),
        tf AS (SELECT id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        nd AS (SELECT count(*) AS n_docs FROM documents)
        SELECT tf.id AS doc_id, tf.token,
               tf.tf::BIGINT AS tf, dfreq.df::BIGINT AS df,
               round(tf.tf * (ln((nd.n_docs + 1) * 1.0 / (dfreq.df + 1)) + 1), 6)
                   AS tfidf
        FROM tf JOIN dfreq USING (token) CROSS JOIN nd
    """,
    tags=("llm", "text"),
)
def text_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, term) TF-IDF — one map-side-combined (id, token)
    count is the only corpus-sized shuffle; df/N ride back as joins
    on vocab-sized sides."""
    return text.tfidf_terms(_t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "text_bm25_search",
    oracle=f"""
        WITH t AS (SELECT doc_id AS id, {_SQL_TOKENS} AS w FROM documents),
        base AS (SELECT id, len(w) AS dl,
                        unnest(list_intersect(list_distinct(w),
                            [{", ".join(repr(t) for t in BM25_QUERY)}])) AS qterm,
                        w
                 FROM t),
        b2 AS (SELECT id, dl, qterm,
                      len(list_filter(w, x -> x = qterm)) AS tf
               FROM base),
        dfreq AS (SELECT qterm, count(*) AS df FROM b2 GROUP BY 1),
        st AS (SELECT count(*) AS n_docs, avg(len(w)) AS avgdl FROM t),
        sc AS (SELECT id,
                      round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                                * (tf * ({BM25_K1} + 1))
                                / (tf + {BM25_K1} * (1 - {BM25_B}
                                       + {BM25_B} * dl / avgdl))), 6) AS bm25
               FROM b2 JOIN dfreq USING (qterm) CROSS JOIN st
               GROUP BY id)
        SELECT id AS doc_id, bm25 FROM sc
        ORDER BY bm25 DESC, id LIMIT {BM25_TOPK}
    """,
    tags=("llm", "text"),
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 bag-of-words retrieval: tokens pruned to the query
    vocabulary BEFORE the corpus shuffle, doc length row-local,
    df/N broadcast, top-k as TakeOrderedAndProject."""
    return text.bm25_search(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        BM25_QUERY,
        BM25_K1,
        BM25_B,
        BM25_TOPK,
    )


N_SHUFFLE_SHARDS = 32
SHUFFLE_SEED = 42


@register(
    "shuffle_shard_assignment",
    oracle=f"""
        SELECT doc_id,
               md5('shuf{SHUFFLE_SEED}:' || doc_id::VARCHAR) AS sort_key,
               (('0x' || substr(md5('shuf{SHUFFLE_SEED}:' || doc_id::VARCHAR), 1, 15))::BIGINT
                % {N_SHUFFLE_SHARDS})::INT AS shard
        FROM documents
    """,
    tags=("llm", "text"),
)
def shuffle_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shuffle-and-shard assignment (the terminal
    pretraining pipeline step, sinks.write_shuffled_shards): portable
    md5 sort key + pmod shard — row-local, the only shuffle in the
    full op is the one that IS the product."""
    from lambda_refarch_mapreduce_spark.sources.sinks import shuffle_key

    key = shuffle_key(F.col("doc_id"), SHUFFLE_SEED)
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        key.alias("sort_key"),
        F.pmod(
            F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint"),
            F.lit(N_SHUFFLE_SHARDS),
        )
        .cast("int")
        .alias("shard"),
    )


MRL_TRUNCATE_DIM = 16


@register(
    "embedding_normalize_truncate",
    oracle=f"""
        WITH t AS (SELECT vec_id,
                          list_transform(embedding[1:{MRL_TRUNCATE_DIM}],
                                         x -> x::DOUBLE) AS v
                   FROM embeddings),
        n AS (SELECT vec_id, v,
                     sqrt(list_sum(list_transform(v, x -> x * x))) AS norm
              FROM t),
        u AS (SELECT vec_id, norm,
                     CASE WHEN norm > 0
                          THEN list_transform(v, x -> round(x / norm, 6))
                          ELSE list_transform(v, x -> x * 0.0) END AS unit
              FROM n)
        SELECT vec_id,
               array_to_string(list_transform(unit,
                   x -> round(x * 1000000)::BIGINT), ',') AS unit_micro_csv,
               round(norm, 6) AS norm
        FROM u
    """,
    tags=("llm", "similarity"),
)
def embedding_normalize_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation (64 -> 16 dims) + L2 re-normalization:
    the 4x byte cut for every downstream shuffle/ANN stage, as one
    row-local codegen projection.

    The ``unit`` array is projected to a CSV of micro-units
    (round(x * 1e6) as int — the components are already rounded to
    6dp, so this is lossless): the driver's canonicalizer cannot sort
    raw list cells, and integer CSV sidesteps any float-to-string
    divergence between Spark's and DuckDB's formatters. The operator
    itself (``similarity.normalize_embeddings``) still returns the
    real array for API users."""
    out = similarity.normalize_embeddings(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", MRL_TRUNCATE_DIM
    )
    return out.select(
        "vec_id",
        F.concat_ws(
            ",",
            F.transform(
                F.col("unit"),
                lambda x: F.round(x * F.lit(1000000.0)).cast("bigint").cast("string"),
            ),
        ).alias("unit_micro_csv"),
        "norm",
    )


# ---------------------------------------------------------------------------
# Round 4: RAG-style chunking and collocation mining
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap


@register(
    "chunk_documents_overlap",
    oracle=f"""
        WITH tw AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
        st AS (SELECT doc_id, w, len(w) AS n,
                      unnest(range(1, greatest(len(w), 1) + 1,
                                   {CHUNK_STRIDE})) AS start
               FROM tw WHERE len(w) > 0)
        SELECT doc_id,
               ((start - 1) / {CHUNK_STRIDE})::BIGINT AS chunk_id,
               least({CHUNK_TOKENS}, n - start + 1)::BIGINT
                   AS n_tokens_chunk,
               array_to_string(w[start : least(start + {CHUNK_TOKENS} - 1,
                                               n)], ' ') AS chunk_text
        FROM st
        WHERE start = 1 OR start + {CHUNK_TOKENS} - 1 <= n + {CHUNK_STRIDE} - 1
    """,
    tags=("llm", "text"),
)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style sliding-window chunking: {CHUNK}-token chunks every
    {STRIDE} tokens (16-token overlap), last partial chunk kept. Pure
    row-local explode over a sequence of starts — zero shuffle; the
    chunk id is derivable from the start offset so downstream joins
    (chunk -> embedding -> doc) need no global numbering. Both engines
    enumerate identical (doc, start) grids."""
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != F.lit(""))
    staged = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("w"))
        .filter(F.size("w") > 0)
        .select("doc_id", "w", F.size("w").alias("n"))
    )
    starts = F.sequence(F.lit(1), F.col("n"), F.lit(CHUNK_STRIDE))
    ex = staged.select(
        "doc_id", "w", "n", F.explode(starts).alias("start")
    ).filter(
        (F.col("start") == 1)
        | (F.col("start") + CHUNK_TOKENS - 1 <= F.col("n") + CHUNK_STRIDE - 1)
    )
    return ex.select(
        "doc_id",
        ((F.col("start") - 1) / CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
        F.least(F.lit(CHUNK_TOKENS), F.col("n") - F.col("start") + 1)
        .cast("bigint")
        .alias("n_tokens_chunk"),
        F.array_join(
            F.slice(
                F.col("w"),
                F.col("start"),
                F.least(F.lit(CHUNK_TOKENS), F.col("n") - F.col("start") + 1),
            ),
            " ",
        ).alias("chunk_text"),
    )


chunk_documents_overlap.__doc__ = chunk_documents_overlap.__doc__.replace(
    "{CHUNK}", str(CHUNK_TOKENS)
).replace("{STRIDE}", str(CHUNK_STRIDE))

PMI_MIN_PAIR = 5
PMI_TOP = 50


@register(
    "collocations_pmi_top",
    oracle=f"""
        WITH tw AS (SELECT {_SQL_TOKENS} AS w FROM documents),
        big AS (SELECT w[i] AS a, w[i + 1] AS b
                FROM (SELECT w, unnest(range(1, greatest(len(w), 1))) AS i
                      FROM tw) x),
        pc AS (SELECT a, b, count(*) AS n_ab FROM big GROUP BY a, b),
        ua AS (SELECT a, count(*) AS n_a FROM big GROUP BY a),
        ub AS (SELECT b, count(*) AS n_b FROM big GROUP BY b),
        tot AS (SELECT count(*)::DOUBLE AS n FROM big),
        scored AS (SELECT pc.a, pc.b, pc.n_ab,
                          round(ln(pc.n_ab * (SELECT n FROM tot)
                                   / (ua.n_a * ub.n_b)), 6) AS pmi
                   FROM pc JOIN ua ON ua.a = pc.a
                           JOIN ub ON ub.b = pc.b
                   WHERE pc.n_ab >= {PMI_MIN_PAIR})
        SELECT a, b, n_ab::BIGINT AS n_ab, pmi
        FROM scored ORDER BY pmi DESC, a, b LIMIT {PMI_TOP}
    """,
    tags=("llm", "text"),
)
def collocations_pmi_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-{TOP} adjacent-token pairs by pointwise
    mutual information ln(N·c(a,b) / (c(a·)·c(·b))), support >= {MINP}.
    One corpus pass emits bigrams; pair/left/right marginals are three
    vocabulary-sized aggregates joined back on the (small) pair table;
    the grand total is a broadcast single row; top-N is
    TakeOrderedAndProject. Marginals are positional (count of bigrams
    with a as left / b as right), matching the oracle exactly."""
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != F.lit(""))
    pairs = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
        ),
        lambda p: p["b"].isNotNull(),
    )
    big = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    pc = big.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    ua = big.groupBy("a").agg(F.count(F.lit(1)).alias("n_a"))
    ub = big.groupBy("b").agg(F.count(F.lit(1)).alias("n_b"))
    tot = big.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    scored = (
        pc.filter(F.col("n_ab") >= PMI_MIN_PAIR)
        .join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "n_ab",
            F.round(
                F.log(
                    F.col("n_ab") * F.col("__n") / (F.col("n_a") * F.col("n_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("a"), F.col("b")
    ).limit(PMI_TOP)


collocations_pmi_top.__doc__ = collocations_pmi_top.__doc__.replace(
    "{TOP}", str(PMI_TOP)
).replace("{MINP}", str(PMI_MIN_PAIR))


# ---------------------------------------------------------------------------
# Multimodal dedup: perceptual average-hash (round 5)
# ---------------------------------------------------------------------------

AHASH_IMAGE_KEYS = 60  # distinct synthetic images -> ~8 docs share each


def _ahash_oracle() -> str:
    """DuckDB twin of multimodal.image_ahash over the synthetic 8x8
    PPMs: raster byte b of doc d = byte (b % 16) of
    md5((d % KEYS) || ':' || (b // 16)); block (br, bc) of the 4x4
    grid sums the 12 bytes of its 2x2 pixel window, bit i set iff
    block_sum * 16 > total — integer arithmetic only, so the oracle
    reproduces the kernel's hash exactly from hex, no decoder."""
    md5s = " || ".join(
        f"md5(key::VARCHAR || ':{k}')" for k in range(12)
    )
    blocks = []
    for br in range(4):
        for bc in range(4):
            idxs = [
                (r * 8 + c) * 3 + ch + 1  # 1-based list index
                for r in (2 * br, 2 * br + 1)
                for c in (2 * bc, 2 * bc + 1)
                for ch in range(3)
            ]
            blocks.append(" + ".join(f"px[{i}]" for i in idxs))
    glist = "list_value(" + ", ".join(blocks) + ")"
    return f"""
        WITH k AS (SELECT doc_id, (doc_id % {AHASH_IMAGE_KEYS}) AS key
                   FROM documents),
        h AS (SELECT doc_id, {md5s} AS hx FROM k),
        p AS (SELECT doc_id,
                     list_transform(range(1, 193),
                         i -> ('0x' || substr(hx, 2*i - 1, 2))::INT) AS px
              FROM h),
        g AS (SELECT doc_id, {glist} AS g FROM p),
        a AS (SELECT doc_id,
                     list_sum(list_transform(range(0, 16),
                         i -> CASE WHEN g[i + 1] * 16 > list_sum(g)
                              THEN 1 << i ELSE 0 END))::BIGINT AS ahash
              FROM g)
        SELECT doc_id, ahash,
               min(doc_id) OVER (PARTITION BY ahash) AS keeper,
               doc_id <> min(doc_id) OVER (PARTITION BY ahash) AS is_dup
        FROM a
    """


@register(
    "image_ahash_dedup",
    oracle=_ahash_oracle(),
    tags=("llm", "multimodal", "dedup"),
)
def image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate IMAGE detection via perceptual average-hash —
    the multimodal counterpart of the text dedup tier: one binary
    8x8 P6 PPM per document (raster = 12 md5-derived byte blocks
    keyed on doc_id % 60, so ~8 docs share each image and the oracle
    can rebuild every byte from hex), REAL-decoded and hashed by
    multimodal.image_ahash (4x4 block grid, integer-exact
    brighter-than-mean bits), then each image is assigned its
    duplicate-group keeper (min doc id over the hash partition) in
    one hash-keyed window — per-doc output, NO per-group list
    materialization, so a million-member duplicate group costs the
    same per row as a unique image. This is exactly how image dedup scales to
    100 TB: the corpus-sized stage is a zero-shuffle Arrow kernel
    emitting an 8-byte fingerprint per image; only (id, hash) pairs
    ever shuffle, and identical-layout images land in the same
    reducer regardless of uniform brightness shifts."""
    docs = _t(spark, sf_dir, "documents")
    key = (F.col("doc_id") % AHASH_IMAGE_KEYS).cast("string")
    raster = F.concat(
        *[F.unhex(F.md5(F.concat(key, F.lit(f":{k}")))) for k in range(12)]
    )
    media = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.concat(F.lit(b"P6\n8 8\n255\n"), raster).alias("content"),
        F.lit("ppm").alias("format"),
        (F.length(raster) + F.lit(11)).cast("long").alias("n_bytes"),
    )
    from pyspark.sql.window import Window

    ah = multimodal.image_ahash(media, grid=(4, 4))
    keeper = F.min("media_id").over(Window.partitionBy("ahash"))
    return ah.select(
        F.col("media_id").alias("doc_id"),
        "ahash",
        keeper.alias("keeper"),
        (F.col("media_id") != keeper).alias("is_dup"),
    )


# ---------------------------------------------------------------------------
# Search-index build + tokenizer-budget report (round 5)
# ---------------------------------------------------------------------------

POSTINGS_TOP_N = 20  # < the 31-term sf vocab, so the top-N cut actually selects
VOCAB_COVERAGE_SIZE = 12  # ~41% occurrence coverage at sf0.01 -> non-trivial per-source variation


@register(
    "postings_index_terms",
    oracle=f"""
        WITH t AS (SELECT doc_id AS id, unnest({_SQL_TOKENS}) AS token
                   FROM documents),
        tf AS (SELECT token, id, count(*) AS tf FROM t GROUP BY 1, 2),
        dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        top AS (SELECT token, df FROM dfreq
                ORDER BY df DESC, token LIMIT {POSTINGS_TOP_N})
        SELECT token, top.df::BIGINT AS df,
               id AS doc_id, tf.tf::BIGINT AS tf
        FROM tf JOIN top USING (token)
    """,
    tags=("llm", "text", "search"),
)
def postings_index_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over the corpus (operators/text.postings_index):
    postings for the top-20 highest-df terms — the batch build
    feeding the BM25 serving path. The corpus shuffles once (the
    (id, token) count tfidf shares); the top-N cut and postings
    assembly touch vocab-sized frames only. The operator API returns
    aligned postings arrays (doc_ids, tfs) for programmatic
    consumers; this entry explodes them to scalar (token, df, doc_id,
    tf) rows because the driver's conformance canonicalization only
    hashes scalar top-level columns (arrays are unhashable in its
    pandas factorize step — see tests/test_entry_contract.py)."""
    pl = text.postings_index(
        _t(spark, sf_dir, "documents"), "doc_id", "text", POSTINGS_TOP_N
    )
    return pl.select(
        "token",
        "df",
        F.explode(F.arrays_zip("doc_ids", "tfs")).alias("__p"),
    ).select(
        "token",
        "df",
        F.col("__p.doc_ids").alias("doc_id"),
        F.col("__p.tfs").alias("tf"),
    )


@register(
    "vocab_coverage_report",
    oracle=f"""
        WITH t AS (SELECT source AS grp, unnest({_SQL_TOKENS}) AS token
                   FROM documents),
        vc AS (SELECT token, count(*) AS c FROM t GROUP BY 1),
        v AS (SELECT token FROM vc
              ORDER BY c DESC, token LIMIT {VOCAB_COVERAGE_SIZE})
        SELECT grp AS source, count(*)::BIGINT AS n_tokens,
               sum(CASE WHEN v.token IS NOT NULL THEN 1 ELSE 0 END)
                   ::BIGINT AS n_covered,
               round(sum(CASE WHEN v.token IS NOT NULL THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 6) AS coverage
        FROM t LEFT JOIN v ON v.token = t.token
        GROUP BY 1
    """,
    tags=("llm", "text"),
)
def vocab_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source coverage of a top-12 corpus vocabulary
    (operators/text.vocab_coverage): the fraction of token
    occurrences a fixed-vocab tokenizer would cover — the budget
    number behind vocab-size decisions. Corpus shuffles once for the
    vocab count, then streams against the broadcast vocabulary."""
    return text.vocab_coverage(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        "source",
        VOCAB_COVERAGE_SIZE,
    )


# ---------------------------------------------------------------------------
# Audio voice-activity report (round 5)
# ---------------------------------------------------------------------------

# 44-byte canonical WAV header like _WAV_HEADER but for a 256-byte data
# chunk (128 samples): PCM16 mono 8000 Hz.
_WAV_HEADER_128 = bytes.fromhex(
    "524946462401000057415645666d7420100000000100010040"
    "1f0000803e0000020010006461746100010000"
)
VAD_WINDOW = 16
# ~median energy of 16 uniform int16 squares -> roughly half the
# windows land voiced, so the report has real variation
VAD_ENERGY_THRESHOLD = 5_700_000_000


@register(
    "audio_vad_report",
    oracle=f"""
        WITH b AS (SELECT doc_id,
                          {" || ".join(f"md5(doc_id::VARCHAR || ':w{k}')"
                                       for k in range(16))} AS hx
                   FROM documents),
        s AS (SELECT doc_id,
                     list_transform(
                         list_transform(range(1, 129), i ->
                             ('0x' || substr(hx, 4*i - 3, 2))::INT
                             + 256 * ('0x' || substr(hx, 4*i - 1, 2))::INT),
                         u -> CASE WHEN u >= 32768 THEN u - 65536 ELSE u END)
                         AS v
              FROM b),
        e AS (SELECT doc_id,
                     list_transform(range(0, 8), w ->
                         list_sum(list_transform(
                             list_slice(v, {VAD_WINDOW}*w + 1,
                                        {VAD_WINDOW}*w + {VAD_WINDOW}),
                             x -> x::BIGINT * x))) AS en
              FROM s)
        SELECT doc_id AS media_id, 8 AS n_windows,
               len(list_filter(en, x -> x > {VAD_ENERGY_THRESHOLD}))::INT
                   AS n_voiced,
               round(len(list_filter(en,
                   x -> x > {VAD_ENERGY_THRESHOLD})) / 8.0, 6) AS voiced_ratio,
               list_max(en)::BIGINT AS max_energy
        FROM e
    """,
    tags=("llm", "multimodal"),
)
def audio_vad_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity report over REAL decoded audio: one PCM16 mono
    WAV per document (128 samples = 16 md5-derived little-endian
    byte blocks, so the oracle rebuilds the identical int16 stream
    from hex), decoded by the RIFF parser and segmented by
    multimodal.audio_activity_windows into 16-sample frames whose
    INTEGER energies gate voiced/unvoiced — the pre-model speech
    detection stage of an audio corpus pipeline. Frame energies are
    exact int64 in both engines; the threshold sits near the uniform
    median so ~half the frames are voiced. Arrow kernel, zero
    shuffle."""
    docs = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    raster = F.concat(
        *[F.unhex(F.md5(F.concat(sid, F.lit(f":w{k}")))) for k in range(16)]
    )
    media = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.lit("audio").alias("media_type"),
        F.concat(F.lit(_WAV_HEADER_128), raster).alias("content"),
        F.lit("wav").alias("format"),
        (F.length(raster) + F.lit(44)).cast("long").alias("n_bytes"),
    )
    return multimodal.audio_activity_windows(
        media, VAD_WINDOW, VAD_ENERGY_THRESHOLD
    )


# ---------------------------------------------------------------------------
# Video scene segmentation (round 5)
# ---------------------------------------------------------------------------

# RAWV header for the scene-cut clips: 2x2, fps 8, EIGHT frames in an
# A,A,B,B,C,C,D,D pattern -> identical-pair diffs are exactly 0 and
# scene-boundary diffs are md5-random (E ~ 1020 for 12 subpixels), so
# threshold 100 yields 3 cuts / 4 scenes deterministically while
# max_diff still varies per document.
_RAWV_SCENES_HEADER = b"RAWV" + _struct.pack("<HHHH", 2, 2, 8, 8)
SCENE_DIFF_THRESHOLD = 100


def _scene_oracle() -> str:
    """DuckDB twin of multimodal.video_scene_cuts over the AABBCCDD
    clips: scene frame s of doc d = first 12 bytes of
    md5(d || ':s' || s); the 7 consecutive diffs are [0, d01, 0, d12,
    0, d23, 0], so cuts = how many of the three boundary diffs exceed
    the threshold and max_diff = their maximum (identical pairs
    contribute 0). Integer |a-b| sums reproduce the kernel exactly."""
    def px(s: int) -> str:
        return (
            f"list_transform(range(1, 13), i -> ('0x' || "
            f"substr(md5(doc_id::VARCHAR || ':s{s}'), 2*i - 1, 2))::INT)"
        )

    diffs = []
    for s in range(3):
        diffs.append(
            f"list_sum(list_transform(range(1, 13), "
            f"i -> abs(p{s}[i] - p{s + 1}[i])))"
        )
    return f"""
        WITH p AS (SELECT doc_id, {px(0)} AS p0, {px(1)} AS p1,
                          {px(2)} AS p2, {px(3)} AS p3
                   FROM documents),
        d AS (SELECT doc_id, {diffs[0]} AS d0, {diffs[1]} AS d1,
                     {diffs[2]} AS d2
              FROM p)
        SELECT doc_id AS media_id, 8 AS n_frames,
               ((d0 > {SCENE_DIFF_THRESHOLD})::INT
                + (d1 > {SCENE_DIFF_THRESHOLD})::INT
                + (d2 > {SCENE_DIFF_THRESHOLD})::INT) AS n_cuts,
               ((d0 > {SCENE_DIFF_THRESHOLD})::INT
                + (d1 > {SCENE_DIFF_THRESHOLD})::INT
                + (d2 > {SCENE_DIFF_THRESHOLD})::INT + 1) AS n_scenes,
               greatest(d0, d1, d2, 0)::BIGINT AS max_diff
        FROM d
    """


@register(
    "video_scene_cuts_report",
    oracle=_scene_oracle(),
    tags=("llm", "multimodal"),
)
def video_scene_cuts_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot segmentation over REAL decoded video — the third leg of
    the multimodal analysis trio (image aHash dedup, audio VAD, video
    scene cuts): one 8-frame RAWV clip per document in an AABBCCDD
    frame pattern (scene frame s = 12 md5-derived bytes, so the
    oracle rebuilds every subpixel from hex), demuxed by
    multimodal.decode_video and segmented by video_scene_cuts via
    integer |a-b| frame diffs against a threshold that cleanly
    separates identical-pair diffs (exactly 0) from scene boundaries
    (md5-random, E~1020). Per-clip summary out, zero shuffle."""
    docs = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    frames = []
    for k in range(8):
        scene = k // 2
        frames.append(
            F.unhex(
                F.substring(
                    F.md5(F.concat(sid, F.lit(f":s{scene}"))), 1, 24
                )
            )
        )
    payload = F.concat(F.lit(_RAWV_SCENES_HEADER), *frames)
    media = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.lit("video").alias("media_type"),
        payload.alias("content"),
        F.lit("rawv").alias("format"),
        F.length(payload).cast("long").alias("n_bytes"),
    )
    return multimodal.video_scene_cuts(media, SCENE_DIFF_THRESHOLD)


# ---------------------------------------------------------------------------
# Embedding-space drift between snapshots (round 5)
# ---------------------------------------------------------------------------


@register(
    "embedding_drift_centroids",
    oracle="""
        WITH e AS (SELECT vec_id, label, vec_id % 2 AS p, embedding
                   FROM embeddings),
        x AS (SELECT label, p, i, round(avg(embedding[i]), 6) AS c,
                     count(*) AS n
              FROM e CROSS JOIN range(1, 65) t(i) GROUP BY 1, 2, 3),
        j AS (SELECT a.label, a.i, a.c AS ca, b.c AS cb,
                     a.n AS na, b.n AS nb
              FROM (SELECT * FROM x WHERE p = 0) a
              JOIN (SELECT * FROM x WHERE p = 1) b USING (label, i))
        SELECT label, max(na)::BIGINT AS n_a, max(nb)::BIGINT AS n_b,
               round(sum(ca * cb)
                     / sqrt(sum(ca * ca) * sum(cb * cb)), 6)
                   AS centroid_cosine,
               round(sqrt(sum((ca - cb) * (ca - cb))), 6)
                   AS centroid_l2_shift
        FROM j GROUP BY 1
    """,
    tags=("llm", "embedding"),
)
def embedding_drift_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-SPACE drift between two corpus snapshots (even/odd
    vec_id halves stand in for release N / release N+1) — the vector
    counterpart of corpus_drift_psi's scalar histograms: per-label
    centroid cosine and L2 shift, the monitor that catches an
    embedding-model regression or a label's semantic migration before
    it poisons ANN serving. Centroids come from
    similarity.group_centroids' dim-fixed aggregate buffers (the
    corpus is never exploded to row x dim; only |labels| x 2 x 64
    centroid rows unpivot), rounded to 6dp in both engines before the
    cosine so the drift arithmetic runs on identical numbers; the
    comparison join and final reduction touch centroid rows only."""
    emb = _t(spark, sf_dir, "embeddings")
    labeled = emb.select(
        "vec_id",
        F.concat_ws(
            ":", F.col("label"), (F.col("vec_id") % 2).cast("string")
        ).alias("grp"),
    )
    cents = similarity.group_centroids(
        emb, labeled, label_id_col="vec_id", label_col="grp"
    ).select(
        F.split("group", ":")[0].cast("int").alias("label"),
        F.split("group", ":")[1].cast("int").alias("p"),
        "dim",
        "centroid_val",
        "n_vectors",
    )
    a = cents.filter(F.col("p") == 0).select(
        "label", "dim",
        F.col("centroid_val").alias("ca"), F.col("n_vectors").alias("na"),
    )
    b = cents.filter(F.col("p") == 1).select(
        "label", "dim",
        F.col("centroid_val").alias("cb"), F.col("n_vectors").alias("nb"),
    )
    j = a.join(b, ["label", "dim"])
    return j.groupBy("label").agg(
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        F.round(
            F.sum(F.col("ca") * F.col("cb"))
            / F.sqrt(
                F.sum(F.col("ca") * F.col("ca"))
                * F.sum(F.col("cb") * F.col("cb"))
            ),
            6,
        ).alias("centroid_cosine"),
        F.round(
            F.sqrt(F.sum((F.col("ca") - F.col("cb")) ** 2)), 6
        ).alias("centroid_l2_shift"),
    )


@register(
    "release_manifest_digests",
    oracle="""
        SELECT coalesce(source, 'ALL') AS source,
               count(*)::BIGINT AS n_docs,
               bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT)
                   AS fingerprint
        FROM documents
        GROUP BY ROLLUP (source)
    """,
    tags=("llm", "text", "release"),
)
def release_manifest_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed release manifest — the dataset-versioning
    primitive a reproducible training run pins its corpus to: per
    source (and corpus-wide via ROLLUP) a document count and an
    order-independent fingerprint, the bit-XOR of each document's
    60-bit md5 prefix. XOR is commutative/associative, so the
    aggregate is map-side combinable with NO sort and NO overflow at
    any corpus size (unlike summed hashes), any single changed,
    added, or dropped document flips the fingerprint, and two
    releases diff by comparing |sources|+1 rows instead of re-hashing
    corpora (corpus_diff_snapshots is the row-level drill-down when
    they differ). One map-side-combined pass; digests never leave
    their partitions un-aggregated."""
    return (
        _t(spark, sf_dir, "documents")
        .rollup("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.bit_xor(
                F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast(
                    "long"
                )
            ).alias("fingerprint"),
        )
        .select(
            F.coalesce("source", F.lit("ALL")).alias("source"),
            "n_docs",
            "fingerprint",
        )
    )


NB_TOP_TOKENS = 25


@register(
    "train_token_quality_model",
    oracle=f"""
        WITH med AS (SELECT median(n_chars) AS m FROM documents),
        d AS (SELECT doc_id, (n_chars > (SELECT m FROM med)) AS pos,
                     unnest(list_distinct({_SQL_TOKENS})) AS token
              FROM documents),
        tot AS (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
                       sum(CASE WHEN pos THEN 0 ELSE 1 END) AS nn
                FROM (SELECT DISTINCT doc_id, pos FROM d)),
        t AS (SELECT token,
                     sum(CASE WHEN pos THEN 1 ELSE 0 END) AS dp,
                     sum(CASE WHEN pos THEN 0 ELSE 1 END) AS dn
              FROM d GROUP BY 1)
        SELECT token, dp::BIGINT AS docs_pos, dn::BIGINT AS docs_neg,
               round(ln((dp + 1.0) / (np + 2.0))
                     - ln((dn + 1.0) / (nn + 2.0)), 6) AS log_odds
        FROM t CROSS JOIN tot
        ORDER BY abs(ln((dp + 1.0) / (np + 2.0))
                     - ln((dn + 1.0) / (nn + 2.0))) DESC, token
        LIMIT {NB_TOP_TOKENS}
    """,
    tags=("llm", "text", "training"),
)
def train_token_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN a quality-filter model on the engine — the closed-form
    counterpart of text_classifier_quality's inference: Bernoulli
    Naive Bayes per-token log-odds learned from a weak label (doc
    length above the corpus median), add-1 smoothed, top tokens by
    |log-odds|. Training IS aggregation here: one corpus-sized
    (doc, distinct-token) shuffle, vocab-sized count tables, a
    single-row class-prior broadcast — the whole fit is one pass, no
    gradient loop, which is why bag-of-words filter models (fastText
    and friends) train comfortably at 100 TB while neural scorers
    sample. The learned weights feed exactly the map-literal scoring
    seam text_classifier_quality demonstrates."""
    from lambda_refarch_mapreduce_spark.functions.scalar import (
        tokenize as _tokenize,
    )

    docs = _t(spark, sf_dir, "documents")
    med = docs.agg(F.median("n_chars").alias("m"))
    d = docs.crossJoin(F.broadcast(med)).select(
        "doc_id",
        (F.col("n_chars") > F.col("m")).alias("pos"),
        F.explode(
            F.array_distinct(_tokenize(F.col("text")))
        ).alias("token"),
    )
    tot = (
        d.select("doc_id", "pos")
        .distinct()
        .agg(
            F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("np"),
            F.sum(F.when(F.col("pos"), 0).otherwise(1)).alias("nn"),
        )
    )
    t = d.groupBy("token").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("dp"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).alias("dn"),
    )
    j = t.crossJoin(F.broadcast(tot))
    lo = F.log((F.col("dp") + 1.0) / (F.col("np") + 2.0)) - F.log(
        (F.col("dn") + 1.0) / (F.col("nn") + 2.0)
    )
    return (
        j.select(
            "token",
            F.col("dp").alias("docs_pos"),
            F.col("dn").alias("docs_neg"),
            F.round(lo, 6).alias("log_odds"),
        )
        .orderBy(F.abs(lo).desc(), "token")
        .limit(NB_TOP_TOKENS)
    )


# ---------------------------------------------------------------------------
# Zipf / power-law tail fit over the token frequency distribution
# (round 6b)
# ---------------------------------------------------------------------------

ZIPF_KMIN = 5  # tail threshold: fit tokens with frequency >= kmin

# discrete power-law MLE (Clauset-Shalizi-Newman continuous
# approximation): alpha = 1 + n / sum(ln(k / (kmin - 1/2))). The log
# sum collapses to per-distinct-frequency terms (m tokens share
# frequency k), so both engines sum the SAME few-hundred products and
# the float sum is short; e0 literals keep both engines in DOUBLE.
_ZIPF_ALPHA = "(1 + n / slog)"
_ZIPF_SE = "((n / slog) / sqrt(n * 1e0))"


@register(
    "zipf_alpha_tokens",
    oracle=f"""
        WITH t AS (SELECT unnest({_SQL_TOKENS}) AS token FROM documents),
        vc AS (SELECT token, count(*) AS k FROM t GROUP BY 1),
        byk AS (SELECT k, count(*) AS m FROM vc
                WHERE k >= {ZIPF_KMIN} GROUP BY 1),
        a AS (SELECT sum(m) AS n,
                     sum(m * ln(k / {ZIPF_KMIN - 0.5}e0)) AS slog
              FROM byk)
        SELECT {ZIPF_KMIN} AS kmin,
               CAST(n AS BIGINT) AS n_tail_tokens,
               round({_ZIPF_ALPHA}, 6) AS alpha,
               round({_ZIPF_SE}, 6) AS alpha_se
        FROM a
    """,
    tags=("llm", "text", "stats"),
)
def zipf_alpha_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law (Zipf) exponent of the corpus token-frequency tail by
    maximum likelihood — the vocabulary heavy-tail statistic behind
    tokenizer-budget and coverage decisions (natural corpora sit near
    alpha ~= 2; synthetic or templated text drifts away, making this a
    cheap corpus-authenticity signal beside the quality filters).
    Plan: one token-count shuffle (map-side combined), then the
    frequency-of-frequencies rollup — a few-hundred-row frame — and a
    single-row MLE projection. The log-sum collapses to per-distinct-
    frequency terms so the float sum is short and engine-stable; the
    alpha / stderr formula text is shared verbatim with the oracle."""
    from lambda_refarch_mapreduce_spark.functions.scalar import tokenize

    docs = _t(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") >= ZIPF_KMIN)
    )
    byk = counts.groupBy("k").agg(F.count(F.lit(1)).alias("m"))
    a = byk.agg(
        F.sum("m").alias("n"),
        F.sum(
            F.col("m") * F.expr(f"ln(k / {ZIPF_KMIN - 0.5}e0)")
        ).alias("slog"),
    )
    return a.selectExpr(
        f"{ZIPF_KMIN} AS kmin",
        "CAST(n AS BIGINT) AS n_tail_tokens",
        f"round({_ZIPF_ALPHA}, 6) AS alpha",
        f"round({_ZIPF_SE}, 6) AS alpha_se",
    )


# ---------------------------------------------------------------------------
# NB filter evaluation: confusion matrix / precision / recall / F1 of
# the trained model against its weak labels (round 6b)
# ---------------------------------------------------------------------------


@register(
    "nb_filter_confusion_eval",
    oracle=f"""
        WITH med AS (SELECT median(n_chars) AS m FROM documents),
        lab AS (SELECT doc_id, (n_chars > (SELECT m FROM med)) AS pos
                FROM documents),
        d AS (SELECT doc_id, (n_chars > (SELECT m FROM med)) AS pos,
                     unnest(list_distinct({_SQL_TOKENS})) AS token
              FROM documents),
        tot AS (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
                       sum(CASE WHEN pos THEN 0 ELSE 1 END) AS nn
                FROM lab),
        t AS (SELECT token,
                     sum(CASE WHEN pos THEN 1 ELSE 0 END) AS dp,
                     sum(CASE WHEN pos THEN 0 ELSE 1 END) AS dn
              FROM d GROUP BY 1),
        model AS (SELECT token,
                         CAST(round((ln((dp + 1.0) / (np + 2.0))
                                     - ln((dn + 1.0) / (nn + 2.0)))
                                    * 1000000) AS BIGINT) AS lo_int
                  FROM t CROSS JOIN tot
                  ORDER BY abs(ln((dp + 1.0) / (np + 2.0))
                               - ln((dn + 1.0) / (nn + 2.0))) DESC, token
                  LIMIT {NB_TOP_TOKENS}),
        sc AS (SELECT d.doc_id, sum(model.lo_int) AS score_int
               FROM d JOIN model ON d.token = model.token
               GROUP BY 1),
        pred AS (SELECT lab.doc_id, lab.pos,
                        (coalesce(sc.score_int, 0) > 0) AS phat
                 FROM lab LEFT JOIN sc ON lab.doc_id = sc.doc_id),
        c AS (SELECT
                sum(CASE WHEN pos AND phat THEN 1 ELSE 0 END) AS tp,
                sum(CASE WHEN NOT pos AND phat THEN 1 ELSE 0 END) AS fp,
                sum(CASE WHEN pos AND NOT phat THEN 1 ELSE 0 END) AS fn,
                sum(CASE WHEN NOT pos AND NOT phat THEN 1 ELSE 0 END) AS tn
              FROM pred)
        SELECT tp::BIGINT AS tp, fp::BIGINT AS fp,
               fn::BIGINT AS fn, tn::BIGINT AS tn,
               round(tp * 1e0 / (tp + fp), 6) AS precision_,
               round(tp * 1e0 / (tp + fn), 6) AS recall_,
               round(2e0 * tp / (2e0 * tp + fp + fn), 6) AS f1,
               round((tp + tn) * 1e0 / (tp + fp + fn + tn), 6) AS accuracy
        FROM c
    """,
    tags=("llm", "training", "stats"),
)
def nb_filter_confusion_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Close the train→eval loop for the on-engine NB quality filter:
    score every document with the trained top-25 log-odds model
    (presence scoring, the text_classifier_quality seam) and report
    the confusion matrix + precision/recall/F1/accuracy against the
    weak labels — the IN-SAMPLE fit diagnostics a filter owner reads
    before trusting the model on held-out data (pair with
    dataset_split_counts for a real holdout). Scoring quantizes each
    log-odds weight to integer micro-units BEFORE summing, so the
    per-doc score is an order-free integer sum and the sign threshold
    is engine-exact — a float sum could flip a near-zero doc between
    engines. Plan: the training pass (one corpus shuffle, vocab
    tables), a broadcast of the 25-token model back onto the same
    (doc, token) frame, one doc-keyed aggregate, one confusion-count
    aggregate."""
    from lambda_refarch_mapreduce_spark.functions.scalar import (
        tokenize as _tokenize,
    )

    docs = _t(spark, sf_dir, "documents")
    med = docs.agg(F.median("n_chars").alias("m"))
    lab = docs.crossJoin(F.broadcast(med)).select(
        "doc_id", (F.col("n_chars") > F.col("m")).alias("pos")
    )
    d = docs.crossJoin(F.broadcast(med)).select(
        "doc_id",
        (F.col("n_chars") > F.col("m")).alias("pos"),
        F.explode(F.array_distinct(_tokenize(F.col("text")))).alias("token"),
    )
    tot = lab.agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).alias("nn"),
    )
    t = d.groupBy("token").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("dp"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).alias("dn"),
    )
    lo = F.log((F.col("dp") + 1.0) / (F.col("np") + 2.0)) - F.log(
        (F.col("dn") + 1.0) / (F.col("nn") + 2.0)
    )
    model = (
        t.crossJoin(F.broadcast(tot))
        .select(
            "token",
            F.round(lo * 1_000_000).cast("long").alias("lo_int"),
            F.abs(lo).alias("__a"),
        )
        .orderBy(F.col("__a").desc(), "token")
        .limit(NB_TOP_TOKENS)
        .drop("__a")
    )
    sc = (
        d.join(F.broadcast(model), "token")
        .groupBy("doc_id")
        .agg(F.sum("lo_int").alias("score_int"))
    )
    pred = lab.join(sc, "doc_id", "left").select(
        "pos", (F.coalesce(F.col("score_int"), F.lit(0)) > 0).alias("phat")
    )
    c = pred.agg(
        F.sum(F.when(F.col("pos") & F.col("phat"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("pos") & F.col("phat"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("pos") & ~F.col("phat"), 1).otherwise(0)).alias("fn"),
        F.sum(
            F.when(~F.col("pos") & ~F.col("phat"), 1).otherwise(0)
        ).alias("tn"),
    )
    return c.selectExpr(
        "CAST(tp AS BIGINT) AS tp",
        "CAST(fp AS BIGINT) AS fp",
        "CAST(fn AS BIGINT) AS fn",
        "CAST(tn AS BIGINT) AS tn",
        "round(tp * 1e0 / (tp + fp), 6) AS precision_",
        "round(tp * 1e0 / (tp + fn), 6) AS recall_",
        "round(2e0 * tp / (2e0 * tp + fp + fn), 6) AS f1",
        "round((tp + tn) * 1e0 / (tp + fp + fn + tn), 6) AS accuracy",
    )


LIFT_BINS = 10


@register(
    "nb_filter_lift_deciles",
    oracle=f"""
        WITH med AS (SELECT median(n_chars) AS m FROM documents),
        lab AS (SELECT doc_id, (n_chars > (SELECT m FROM med)) AS pos
                FROM documents),
        d AS (SELECT doc_id, (n_chars > (SELECT m FROM med)) AS pos,
                     unnest(list_distinct({_SQL_TOKENS})) AS token
              FROM documents),
        tot AS (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
                       sum(CASE WHEN pos THEN 0 ELSE 1 END) AS nn
                FROM lab),
        t AS (SELECT token,
                     sum(CASE WHEN pos THEN 1 ELSE 0 END) AS dp,
                     sum(CASE WHEN pos THEN 0 ELSE 1 END) AS dn
              FROM d GROUP BY 1),
        model AS (SELECT token,
                         CAST(round((ln((dp + 1.0) / (np + 2.0))
                                     - ln((dn + 1.0) / (nn + 2.0)))
                                    * 1000000) AS BIGINT) AS lo_int
                  FROM t CROSS JOIN tot
                  ORDER BY abs(ln((dp + 1.0) / (np + 2.0))
                               - ln((dn + 1.0) / (nn + 2.0))) DESC, token
                  LIMIT {NB_TOP_TOKENS}),
        sc AS (SELECT d.doc_id, sum(model.lo_int) AS score_int
               FROM d JOIN model ON d.token = model.token
               GROUP BY 1),
        scored AS (SELECT lab.doc_id, lab.pos,
                          coalesce(sc.score_int, 0) AS score_int
                   FROM lab LEFT JOIN sc ON lab.doc_id = sc.doc_id),
        r AS (SELECT pos,
                     row_number() OVER (ORDER BY score_int DESC, doc_id)
                         AS rnk,
                     count(*) OVER () AS n
              FROM scored),
        base AS (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) AS tot_pos,
                        count(*) AS tot_n
                 FROM r)
        SELECT (((rnk - 1) * {LIFT_BINS}) // n + 1)::INT AS decile,
               count(*)::BIGINT AS n_docs,
               sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS n_pos,
               round(sum(CASE WHEN pos THEN 1 ELSE 0 END) * 1e0 / count(*),
                     6) AS pos_rate,
               round((sum(CASE WHEN pos THEN 1 ELSE 0 END) * 1e0 / count(*))
                     / (max(tot_pos) * 1e0 / max(tot_n)), 6) AS lift
        FROM r CROSS JOIN base GROUP BY 1
    """,
    tags=("llm", "training", "stats", "scale"),
)
def nb_filter_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gains/lift table for the trained NB filter: documents
    ranked by model score descending, per score-decile positive rate
    vs the base rate — the chart a filter owner reads to pick a
    keep-fraction ("the top 20% of scores holds 1.7x the base-rate
    positives"). The rank comes from the distributed global_rank over
    the integer fixed-point scores (never a one-reducer ntile), the
    decile cut is exact-integer arithmetic (the pareto entry's
    machinery applied to model scores), and the base-rate term is a
    single-row broadcast. The oracle replays training, scoring,
    ranking, and the lift arithmetic in SQL."""
    from lambda_refarch_mapreduce_spark.functions.scalar import (
        tokenize as _tokenize,
    )
    from lambda_refarch_mapreduce_spark.operators.relational import (
        global_rank,
    )

    docs = _t(spark, sf_dir, "documents")
    med = docs.agg(F.median("n_chars").alias("m"))
    lab = docs.crossJoin(F.broadcast(med)).select(
        "doc_id", (F.col("n_chars") > F.col("m")).alias("pos")
    )
    d = docs.crossJoin(F.broadcast(med)).select(
        "doc_id",
        (F.col("n_chars") > F.col("m")).alias("pos"),
        F.explode(F.array_distinct(_tokenize(F.col("text")))).alias("token"),
    )
    tot = lab.agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).alias("nn"),
    )
    t = d.groupBy("token").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("dp"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).alias("dn"),
    )
    lo = F.log((F.col("dp") + 1.0) / (F.col("np") + 2.0)) - F.log(
        (F.col("dn") + 1.0) / (F.col("nn") + 2.0)
    )
    model = (
        t.crossJoin(F.broadcast(tot))
        .select(
            "token",
            F.round(lo * 1_000_000).cast("long").alias("lo_int"),
            F.abs(lo).alias("__a"),
        )
        .orderBy(F.col("__a").desc(), "token")
        .limit(NB_TOP_TOKENS)
        .drop("__a")
    )
    sc = (
        d.join(F.broadcast(model), "token")
        .groupBy("doc_id")
        .agg(F.sum("lo_int").alias("score_int"))
    )
    scored = lab.join(sc, "doc_id", "left").select(
        "doc_id",
        "pos",
        F.coalesce(F.col("score_int"), F.lit(0)).alias("score_int"),
    )
    # local_mode="arrow" (r14): one row per document — corpus-scale
    ranked = global_rank(
        scored,
        [F.col("score_int").desc(), F.col("doc_id")],
        rank_col="rnk",
        local_mode="arrow",
    )
    base = scored.agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("tot_pos"),
        F.count(F.lit(1)).alias("tot_n"),
    )
    return (
        ranked.crossJoin(F.broadcast(base))
        .selectExpr(
            f"CAST(((rnk - 1) * {LIFT_BINS}) div tot_n + 1 AS INT)"
            " AS decile",
            "pos",
            "tot_pos",
            "tot_n",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("n_pos"),
            F.expr(
                "round(sum(CASE WHEN pos THEN 1 ELSE 0 END) * 1e0"
                " / count(1), 6)"
            ).alias("pos_rate"),
            F.expr(
                "round((sum(CASE WHEN pos THEN 1 ELSE 0 END) * 1e0"
                " / count(1)) / (max(tot_pos) * 1e0 / max(tot_n)), 6)"
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Round 8: MMR diversity re-ranking — the post-retrieval pass that
# stops near-duplicate neighbors from crowding out coverage.
# ---------------------------------------------------------------------------

MMR_K = 5
MMR_CAND_N = 20
MMR_LAMBDA = 0.7
MMR_QUERY_ID = 0


def _mmr_oracle(k: int, cand_n: int, lam: float, qid: int) -> str:
    """Unrolled greedy-MMR SQL (the pagerank unrolled-iteration gate
    pattern): one (rescore, argmax, accumulate) CTE trio per pick,
    with the score expression textually identical to the operator's
    (operators.similarity._mmr_score_expr) so both engines fold the
    same IEEE tree over the same 6dp-rounded rel / pairwise sims."""
    lam_sql = f"{lam!r}e0"
    score0 = f"({lam_sql} * rel - (1e0 - {lam_sql}) * 0e0)"
    score_n = f"({lam_sql} * rel - (1e0 - {lam_sql}) * ms)"
    parts = [
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v"
        " FROM embeddings),",
        f"q AS (SELECT v AS qv FROM e WHERE vec_id = {qid}),",
        "sc AS (SELECT e.vec_id AS id,"
        f" round({_COSINE_SQL.format(a='qv', b='e.v')}, 6) AS rel"
        f" FROM e CROSS JOIN q WHERE e.vec_id <> {qid}),",
        f"cand AS (SELECT id, rel FROM sc ORDER BY rel DESC, id"
        f" LIMIT {cand_n}),",
        "cv AS (SELECT c.id, c.rel, e.v FROM cand c"
        " JOIN e ON e.vec_id = c.id),",
        "sims AS (SELECT a.id AS ia, b.id AS ib,"
        f" round({_COSINE_SQL.format(a='a.v', b='b.v')}, 6) AS sim"
        " FROM cv a JOIN cv b ON a.id <> b.id),",
        f"s0 AS (SELECT id, rel, {score0} AS score FROM cand"
        " ORDER BY score DESC, id LIMIT 1),",
        "sel0 AS (SELECT id FROM s0),",
    ]
    for i in range(1, k):
        p = i - 1
        parts.append(
            f"r{i} AS (SELECT c.id, c.rel, max(s.sim) AS ms"
            f" FROM cand c JOIN sims s ON s.ia = c.id"
            f" JOIN sel{p} ON s.ib = sel{p}.id"
            f" WHERE c.id NOT IN (SELECT id FROM sel{p})"
            " GROUP BY c.id, c.rel),"
        )
        parts.append(
            f"s{i} AS (SELECT id, rel, {score_n} AS score FROM r{i}"
            " ORDER BY score DESC, id LIMIT 1),"
        )
        parts.append(
            f"sel{i} AS (SELECT id FROM sel{p}"
            f" UNION ALL SELECT id FROM s{i}),"
        )
    sql = "\n".join(parts).rstrip().rstrip(",")
    final = "\nUNION ALL\n".join(
        f"SELECT {i}::INT AS pick, id AS neighbor_id, rel,"
        f" round(score, 6) AS mmr_score FROM s{i}"
        for i in range(k)
    )
    return sql + "\n" + final


@register(
    "similarity_mmr_rerank",
    oracle=_mmr_oracle(MMR_K, MMR_CAND_N, MMR_LAMBDA, MMR_QUERY_ID),
    tags=("llm", "similarity"),
)
def similarity_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance diversity re-ranking
    (operators.similarity.mmr_rerank) over the exact top-20 cosine
    candidates of one query vector — the serving-side pass between
    retrieval and the consumer (RAG context building, deduped search
    results) that trades pure relevance for coverage: each of the 5
    picks maximizes λ·rel − (1−λ)·max-sim-to-already-picked at
    λ={MMR_LAMBDA}. The candidate stage is the scalable part (any of
    the catalog's top-k retrievals); the rerank itself touches only
    the |C| candidate rows and their |C|² pairwise sims — serving
    metadata, no collect, no corpus access. Wall time at any sf is
    dominated by SCHEDULING, not data: the greedy is inherently
    sequential (pick i needs pick i-1), so it runs as k+2 tiny
    localCheckpointed jobs of fixed local-mode overhead — a
    latency-critical server would run this last hop client-side on
    the same candidate metadata. The oracle replays the greedy loop
    as unrolled SQL with the score expression shared textually, so
    the whole selection order is gated, not just the final set."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == MMR_QUERY_ID)
    cand = similarity.brute_force_topk(
        emb, q, "vec_id", "embedding", MMR_CAND_N
    )
    withv = cand.join(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("cv"),
        ),
        "neighbor_id",
    )
    return similarity.mmr_rerank(
        withv, "neighbor_id", "cv", "cosine", MMR_K, MMR_LAMBDA
    )


similarity_mmr_rerank.__doc__ = similarity_mmr_rerank.__doc__.replace(
    "{MMR_LAMBDA}", str(MMR_LAMBDA)
)


# Calibration reliability bins for the NB filter: scores bucket into
# 0.5-nat bins (integer floor on the micro-unit score — |score| <<
# 2^53 so the double floor is exact on both engines), predicted
# probability is the sigmoid of the bin MIDPOINT in nats, one shared
# formula string.
NB_CAL_BIN_MICRO = 500_000  # 0.5 nats per bin, in micro-nat units
NB_CAL_PROB_EXPR = "(1e0 / (1e0 + exp(-((bin + 5e-1) * 5e-1))))"


@register(
    "nb_model_calibration_bins",
    oracle=f"""
        WITH med AS (SELECT median(n_chars) AS m FROM documents),
        lab AS (SELECT doc_id, (n_chars > (SELECT m FROM med)) AS pos
                FROM documents),
        d AS (SELECT doc_id, (n_chars > (SELECT m FROM med)) AS pos,
                     unnest(list_distinct({_SQL_TOKENS})) AS token
              FROM documents),
        tot AS (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
                       sum(CASE WHEN pos THEN 0 ELSE 1 END) AS nn
                FROM lab),
        t AS (SELECT token,
                     sum(CASE WHEN pos THEN 1 ELSE 0 END) AS dp,
                     sum(CASE WHEN pos THEN 0 ELSE 1 END) AS dn
              FROM d GROUP BY 1),
        model AS (SELECT token,
                         CAST(round((ln((dp + 1.0) / (np + 2.0))
                                     - ln((dn + 1.0) / (nn + 2.0)))
                                    * 1000000) AS BIGINT) AS lo_int
                  FROM t CROSS JOIN tot
                  ORDER BY abs(ln((dp + 1.0) / (np + 2.0))
                               - ln((dn + 1.0) / (nn + 2.0))) DESC,
                           token
                  LIMIT {NB_TOP_TOKENS}),
        sc AS (SELECT d.doc_id, sum(model.lo_int) AS score_int
               FROM d JOIN model ON d.token = model.token
               GROUP BY 1),
        pb AS (SELECT lab.pos,
                      CAST(floor(coalesce(sc.score_int, 0)
                                 / {NB_CAL_BIN_MICRO}e0) AS BIGINT)
                          AS bin
               FROM lab LEFT JOIN sc ON lab.doc_id = sc.doc_id),
        g AS (SELECT bin, count(*)::BIGINT AS n_docs,
                     sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT
                         AS n_pos
              FROM pb GROUP BY 1)
        SELECT bin, n_docs, n_pos,
               round({NB_CAL_PROB_EXPR}, 6) AS pred_prob,
               round(n_pos * 1e0 / n_docs, 6) AS pos_rate,
               round(({NB_CAL_PROB_EXPR} - n_pos * 1e0 / n_docs)
                     * ({NB_CAL_PROB_EXPR} - n_pos * 1e0 / n_docs), 6)
                   AS sq_gap
        FROM g
    """,
    tags=("llm", "training", "stats"),
)
def nb_model_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration reliability table for the NB quality filter — the
    third leg of its eval stool after the confusion matrix
    (nb_filter_confusion_eval) and the gains chart
    (nb_filter_lift_deciles): do the model's log-odds MEAN what they
    claim? Documents bucket into 0.5-nat score bins (integer floor on
    the order-free micro-unit score sum), each bin compares the
    sigmoid of its midpoint (the predicted probability, one shared
    formula string) against the empirical positive rate, and sq_gap
    is that bin's squared reliability term — the calibration
    component of the Brier decomposition, the quantity temperature
    scaling would shrink. Plan: the same train→score passes as the
    confusion entry (one corpus shuffle, 25-token broadcast model,
    doc-keyed aggregate), then ONE bounded bin aggregate. Returns one
    row per occupied bin: (bin, n_docs, n_pos, pred_prob, pos_rate,
    sq_gap)."""
    from lambda_refarch_mapreduce_spark.functions.scalar import (
        tokenize as _tokenize,
    )

    docs = _t(spark, sf_dir, "documents")
    med = docs.agg(F.median("n_chars").alias("m"))
    lab = docs.crossJoin(F.broadcast(med)).select(
        "doc_id", (F.col("n_chars") > F.col("m")).alias("pos")
    )
    d = docs.crossJoin(F.broadcast(med)).select(
        "doc_id",
        (F.col("n_chars") > F.col("m")).alias("pos"),
        F.explode(F.array_distinct(_tokenize(F.col("text")))).alias(
            "token"
        ),
    )
    tot = lab.agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).alias("nn"),
    )
    t = d.groupBy("token").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("dp"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).alias("dn"),
    )
    lo = F.log((F.col("dp") + 1.0) / (F.col("np") + 2.0)) - F.log(
        (F.col("dn") + 1.0) / (F.col("nn") + 2.0)
    )
    model = (
        t.crossJoin(F.broadcast(tot))
        .select(
            "token",
            F.round(lo * 1_000_000).cast("long").alias("lo_int"),
            F.abs(lo).alias("__a"),
        )
        .orderBy(F.col("__a").desc(), "token")
        .limit(NB_TOP_TOKENS)
        .drop("__a")
    )
    sc = (
        d.join(F.broadcast(model), "token")
        .groupBy("doc_id")
        .agg(F.sum("lo_int").alias("score_int"))
    )
    pb = lab.join(sc, "doc_id", "left").select(
        "pos",
        F.expr(
            f"CAST(floor(coalesce(score_int, 0)"
            f" / {NB_CAL_BIN_MICRO}e0) AS BIGINT)"
        ).alias("bin"),
    )
    g = pb.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
    )
    return g.selectExpr(
        "bin",
        "n_docs",
        "n_pos",
        f"round({NB_CAL_PROB_EXPR}, 6) AS pred_prob",
        "round(n_pos * 1e0 / n_docs, 6) AS pos_rate",
        f"round(({NB_CAL_PROB_EXPR} - n_pos * 1e0 / n_docs)"
        f" * ({NB_CAL_PROB_EXPR} - n_pos * 1e0 / n_docs), 6)"
        " AS sq_gap",
    )
