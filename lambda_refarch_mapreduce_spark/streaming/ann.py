"""Continuous ANN index ingestion: embeddings stream in, each
micro-batch is IVF-assigned and PQ-encoded against FROZEN
centroids/codebooks, and the m-byte code rows are appended
idempotently to a parquet index. Searching reads ONLY committed code
rows — raw vectors are never rescanned.

This is the similarity-tier twin of streaming/corpus.py (same
reference lineage: objects arrive → event fires → state advances,
reducerCoordinator.py:107-189) and the streaming completion of the
build-once/serve-many split the batch tier already exposes
(similarity.ivfadc_encode / ivfadc_search):

- TRAIN once, offline: ivf_centroids + pq_codebooks on a bootstrap
  sample. The quantizers must be frozen for the index layout to be
  stable — re-training would re-bucket history (the standard IVF
  operating model; re-train + re-encode is a batch job, not a stream —
  shipped below as retrain_index: fresh quantizers + full re-encode
  into a new generation directory + an atomic CURRENT pointer flip).
- INGEST continuously: each micro-batch is one ivfadc_encode
  projection (row-local; the only shuffle is the partitioned write).
- SERVE anytime: ivfadc_search over the committed code rows.

Idempotence under at-least-once foreachBatch follows corpus.py's
scheme exactly: per-batch overwrite into ``codes/_batch_id=N/`` plus a
commit log appended LAST, with readers semi-joining the log so a
crashed attempt's partial rows are invisible.

Scale posture: the index grows by batch-sized appends only;
``codes/`` is partitioned by ``list_id``, so a search that probes
n_probe of n_centroids lists prunes ~(1 - n_probe/n_centroids) of the
index FILES at planning time (partition pruning on the directory
layout) before any row is read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_refarch_mapreduce_spark.operators import similarity
from lambda_refarch_mapreduce_spark.streaming.corpus import (
    _committed,
    _read_or_empty,
)

_CODES_SCHEMA = "neighbor_id bigint, list_id int, codes array<int>"


def ingest_embedding_stream(
    stream_vecs: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
    index_dir: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
):
    """foreachBatch pipeline: encode the micro-batch with the frozen
    quantizers (similarity.ivfadc_encode, broadcast strategy — the
    streaming plan is built once per batch, so plan-literal blowup
    would be paid per micro-batch) and write
    ``codes/_batch_id=N/list_id=.../`` as an idempotent overwrite,
    then append the batch id to the commit log. Returns the
    DataStreamWriter (caller starts it)."""
    codes_path = os.path.join(index_dir, "codes")
    commits_path = os.path.join(index_dir, "commits")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        commits = _committed(spark, commits_path)
        if commits.filter(F.col("batch_id") == batch_id).limit(1).count():
            return  # already fully committed; replay is a no-op
        coded = similarity.ivfadc_encode(
            batch_df,
            centroids,
            codebooks,
            id_col,
            vec_col,
            codebook_strategy="broadcast",
        )
        (
            coded.write.mode("overwrite")
            .partitionBy("list_id")
            .parquet(os.path.join(codes_path, f"_batch_id={batch_id}"))
        )
        # commit LAST: the batch becomes visible atomically
        spark.createDataFrame([(batch_id,)], "batch_id bigint").write.mode(
            "append"
        ).parquet(commits_path)

    writer = stream_vecs.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer


def read_committed_codes(spark: SparkSession, index_dir: str) -> DataFrame:
    """The committed code rows (neighbor_id, list_id, codes): rows from
    replayed-but-uncommitted attempts are filtered by a broadcast
    semi-join on the commit log."""
    commits = _committed(spark, os.path.join(index_dir, "commits")).select(
        F.col("batch_id").alias("_batch_id")
    )
    codes = _read_or_empty(
        spark,
        os.path.join(index_dir, "codes"),
        _CODES_SCHEMA + ", _batch_id bigint",
    )
    return codes.join(F.broadcast(commits), "_batch_id", "left_semi").select(
        "neighbor_id", "list_id", "codes"
    )


def search_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """IVFADC top-k against everything ingested so far: committed code
    rows only, probe-list pruning, ADC scoring, WindowGroupLimit —
    identical semantics to similarity.ivfadc_topk over the same
    corpus (pinned by tests/test_streaming.py)."""
    coded = read_committed_codes(spark, index_dir)
    return similarity.ivfadc_search(
        coded,
        queries,
        centroids,
        codebooks,
        id_col,
        vec_col,
        k,
        n_probe,
        codebook_strategy="broadcast",
    )


# ---------------------------------------------------------------------------
# Index lifecycle: generations + batch re-train / re-encode / atomic swap
# ---------------------------------------------------------------------------
# The frozen-quantizer contract above keeps INGEST incremental; when
# drift accumulates (recon_err creeping up, list skew), the fix is a
# BATCH job, not a stream: train fresh quantizers on the raw vectors,
# re-encode everything into a brand-new generation directory, and flip
# one pointer file. Serving reads through the pointer, so the swap is
# atomic from the reader's perspective and the old generation remains
# intact (instant rollback = write the old name back).
#
# Layout:
#   index_dir/
#     CURRENT            # text file naming the live generation
#     gen-000001/
#       quantizers/      # parquet: (kind, j, cid, vec) — self-contained serve
#       codes/_batch_id=N/list_id=.../
#       commits/
#     gen-000002/        # next retrain output
#
# The pointer flip uses write-temp + os.replace — atomic on POSIX
# filesystems. On an object store, replace CURRENT with the
# metastore/conditional-put pointer of your platform; everything else
# (immutable generation dirs, commit logs) is object-store-safe as-is.
#
# The bulk re-encode commits under _batch_id=-1 (reserved): streaming
# batch ids are >= 0, so an ingest stream restarted against the new
# generation (fresh checkpoint) never collides with the bootstrap load.

_BOOTSTRAP_BATCH_ID = -1
_QUANT_SCHEMA = "kind string, j int, cid int, vec array<double>"


def _gen_path(index_dir: str, n: int) -> str:
    return os.path.join(index_dir, f"gen-{n:06d}")


def current_generation(index_dir: str) -> int:
    """The live generation number (0 if no CURRENT pointer exists —
    a legacy/flat index at ``index_dir`` itself)."""
    try:
        with open(os.path.join(index_dir, "CURRENT")) as fh:
            return int(fh.read().strip().rsplit("-", 1)[1])
    except (OSError, ValueError, IndexError):
        return 0


def current_generation_dir(index_dir: str) -> str:
    """Resolve the live generation directory through the CURRENT
    pointer; a pointer-less index (the flat layout ingest writes) is
    its own generation."""
    n = current_generation(index_dir)
    return _gen_path(index_dir, n) if n > 0 else index_dir


def _flip_current(index_dir: str, n: int) -> None:
    tmp = os.path.join(index_dir, "CURRENT.tmp")
    with open(tmp, "w") as fh:
        fh.write(f"gen-{n:06d}\n")
    os.replace(tmp, os.path.join(index_dir, "CURRENT"))  # POSIX-atomic


def save_quantizers(
    spark: SparkSession,
    gen_dir: str,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
) -> None:
    """Persist the generation's quantizers beside its codes so the
    index serves without any driver-side state (and a reader can never
    pair codes with the wrong quantizer version)."""
    rows = [("cent", 0, cid, list(map(float, v))) for cid, v in centroids]
    for j, cb in enumerate(codebooks):
        rows.extend(("book", j, cid, list(map(float, v))) for cid, v in cb)
    spark.createDataFrame(rows, _QUANT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(gen_dir, "quantizers"))


def load_quantizers(
    spark: SparkSession, gen_dir: str
) -> tuple[list[tuple[int, list[float]]], list[list[tuple[int, list[float]]]]]:
    """(centroids, codebooks) back from a generation directory."""
    rows = spark.read.parquet(os.path.join(gen_dir, "quantizers")).collect()
    cents = sorted(
        ((r.cid, list(r.vec)) for r in rows if r.kind == "cent"),
        key=lambda t: t[0],
    )
    by_j: dict[int, list[tuple[int, list[float]]]] = {}
    for r in rows:
        if r.kind == "book":
            by_j.setdefault(r.j, []).append((r.cid, list(r.vec)))
    books = [sorted(by_j[j], key=lambda t: t[0]) for j in sorted(by_j)]
    if not cents or not books:
        raise ValueError(
            f"no quantizers persisted under {gen_dir!r} — was this "
            "generation written by retrain_index/init_index?"
        )
    return cents, books


def init_index(
    spark: SparkSession,
    index_dir: str,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
) -> str:
    """Create generation 1 (quantizers only, empty codes) and point
    CURRENT at it. Returns the generation directory — pass it to
    ingest_embedding_stream as the index dir."""
    gen_dir = _gen_path(index_dir, 1)
    save_quantizers(spark, gen_dir, centroids, codebooks)
    _flip_current(index_dir, 1)
    return gen_dir


def retrain_index(
    spark: SparkSession,
    index_dir: str,
    raw_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    m: int = 8,
    n_codes: int = 16,
    refine_iters: int = 1,
) -> str:
    """The batch re-train + re-encode + swap job the frozen-quantizer
    ingest defers to: train fresh quantizers on ``raw_vectors`` (the
    archived full corpus — codes are lossy, so re-training always goes
    back to the raw vectors), re-encode everything into generation
    N+1, then atomically flip CURRENT. One scan of the raw vectors
    (ivfadc_encode shares the coarse-assign and PQ projections), one
    partitioned write; the old generation stays untouched for
    rollback/in-flight readers. Returns the new generation dir."""
    cents = similarity.ivf_centroids(
        raw_vectors, id_col, vec_col, n_centroids, refine_iters
    )
    books = similarity.pq_codebooks(
        raw_vectors, id_col, vec_col, m, n_codes, refine_iters
    )
    if not cents or not books:
        raise ValueError("retrain_index: raw_vectors trained empty quantizers")
    new_n = current_generation(index_dir) + 1
    gen_dir = _gen_path(index_dir, new_n)
    coded = similarity.ivfadc_encode(
        raw_vectors, cents, books, id_col, vec_col,
        codebook_strategy="broadcast",
    )
    (
        coded.write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(
            os.path.join(gen_dir, "codes", f"_batch_id={_BOOTSTRAP_BATCH_ID}")
        )
    )
    spark.createDataFrame(
        [(_BOOTSTRAP_BATCH_ID,)], "batch_id bigint"
    ).write.mode("append").parquet(os.path.join(gen_dir, "commits"))
    save_quantizers(spark, gen_dir, cents, books)
    _flip_current(index_dir, new_n)  # swap LAST: readers never see a
    # partially-built generation
    return gen_dir


def search_current(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """IVFADC top-k against the LIVE generation: resolve CURRENT, load
    that generation's own persisted quantizers, search its committed
    codes. Quantizers and codes always come from the same generation,
    so a concurrent swap can never mix index versions."""
    gen_dir = current_generation_dir(index_dir)
    cents, books = load_quantizers(spark, gen_dir)
    return search_index(
        spark, gen_dir, queries, cents, books, id_col, vec_col, k, n_probe
    )


def forget_vectors(
    spark: SparkSession,
    index_dir: str,
    forget_ids: DataFrame,
    id_col: str = "vec_id",
) -> str:
    """Deletion propagation (right-to-be-forgotten) through the index:
    build generation N+1 as the CURRENT generation's committed codes
    MINUS the given ids — quantizers are copied unchanged (deletions
    don't move centroids; retrain_index is the tool when drift says
    they should), the pointer flips atomically, and the old
    generation remains for audit/rollback until retired.

    Plan: one anti-join of the code rows against the id set (broadcast
    when small — AQE decides) + one partitioned write; the raw corpus
    is never touched. Returns the new generation dir."""
    gen_dir = current_generation_dir(index_dir)
    cents, books = load_quantizers(spark, gen_dir)
    coded = read_committed_codes(spark, gen_dir)
    col = id_col if id_col in forget_ids.columns else forget_ids.columns[0]
    ids = forget_ids.select(F.col(col).alias("neighbor_id")).distinct()
    kept = coded.join(ids, "neighbor_id", "left_anti")
    new_n = current_generation(index_dir) + 1
    new_dir = _gen_path(index_dir, new_n)
    (
        kept.write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(
            os.path.join(new_dir, "codes", f"_batch_id={_BOOTSTRAP_BATCH_ID}")
        )
    )
    spark.createDataFrame(
        [(_BOOTSTRAP_BATCH_ID,)], "batch_id bigint"
    ).write.mode("append").parquet(os.path.join(new_dir, "commits"))
    save_quantizers(spark, new_dir, cents, books)
    _flip_current(index_dir, new_n)
    return new_dir
