"""Structured Streaming analog of the reference's incremental reduce
(SURVEY.md §2.9): file-source stream driven to completion with
availableNow, checked against the batch result — streaming and batch
must agree (the reference's tree reduction had the same invariant:
any arrival order gives the same final sums)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from lambda_refarch_mapreduce_spark.sources.readers import load_table
from lambda_refarch_mapreduce_spark.streaming.events import (
    incremental_sum,
    read_event_stream,
    windowed_agg,
)
from tests.conftest import SF_SMOKE


def _events_dir(spark, tmp_path, n_files=4):
    """Split the events table into several files to simulate
    incremental arrival (the reference's mapper outputs landing in
    S3 one by one)."""
    d = str(tmp_path / "events_stream")
    load_table(spark, SF_SMOKE, "events").repartition(n_files).write.parquet(d)
    return d


def _run_to_memory(sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_incremental_sum_matches_batch(spark, tmp_path):
    d = _events_dir(spark, tmp_path)
    schema = spark.read.parquet(d).schema
    stream = read_event_stream(spark, d, schema, max_files_per_trigger=1)
    name = f"t_{uuid.uuid4().hex[:8]}"
    _run_to_memory(incremental_sum(stream, "user_id", "value"), name)
    got = {
        r.user_id: round(r.total, 2)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        r.user_id: round(r.total, 2)
        for r in spark.read.parquet(d)
        .groupBy("user_id")
        .agg(F.sum("value").alias("total"))
        .collect()
    }
    assert got == want


def test_windowed_agg_matches_batch(spark, tmp_path):
    d = _events_dir(spark, tmp_path)
    schema = spark.read.parquet(d).schema
    stream = read_event_stream(spark, d, schema)
    out = windowed_agg(stream, "ts", "value", window="1 hour", watermark="2 hours")
    name = f"t_{uuid.uuid4().hex[:8]}"
    _run_to_memory(out, name)
    got = {
        (str(r.window_start), r.total and round(r.total, 2), r.n_events)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (str(r["window.start"]), round(r.total, 2), r.n_events)
        for r in spark.read.parquet(d)
        .groupBy(F.window("ts", "1 hour").alias("window"))
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window.start"), "total", "n_events")
        .collect()
    }
    assert got == want


def test_stateful_running_stats_matches_batch(spark, tmp_path):
    """Custom keyed state (applyInPandasWithState): after draining all
    files, per-key accumulators must equal the batch aggregation."""
    from lambda_refarch_mapreduce_spark.streaming.stateful import (
        running_stats_per_key,
    )

    d = _events_dir(spark, tmp_path)
    schema = spark.read.parquet(d).schema
    stream = read_event_stream(spark, d, schema, max_files_per_trigger=2)
    out = running_stats_per_key(stream, "user_id", "value")
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode emits one row per key per micro-batch: take the
    # final state = max n_events per key
    rows = spark.sql(
        f"""SELECT key, n_events, total, running_max FROM (
            SELECT *, row_number() OVER (PARTITION BY key ORDER BY n_events DESC) rn
            FROM {name}) WHERE rn = 1"""
    ).collect()
    got = {r.key: (r.n_events, round(r.total, 2), round(r.running_max, 2)) for r in rows}
    want = {
        str(r.user_id): (r.n, round(r.total, 2), round(r.mx, 2))
        for r in spark.read.parquet(d)
        .groupBy("user_id")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert got == want


def test_streaming_dedup_drop_duplicates(spark, tmp_path):
    """Streaming dropDuplicates on event_id: feeding the same files
    twice (union of two identical dirs) must yield each id once."""
    d = _events_dir(spark, tmp_path, n_files=2)
    schema = spark.read.parquet(d).schema
    s1 = read_event_stream(spark, d, schema)
    deduped = s1.unionByName(read_event_stream(spark, d, schema)).dropDuplicates(
        ["event_id"]
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.groupBy().count().writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql(f"SELECT * FROM {name}").collect()[0][0]
    assert n == spark.read.parquet(d).count()


def test_session_window_agg(spark, tmp_path):
    """session_window grouping: single-user bursts separated by gaps
    collapse into sessions; verified against a hand-computed split."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base + dt.timedelta(minutes=m), 1.0)
        for m in (0, 1, 2, 30, 31, 90)  # 3 sessions with 10-min gap
    ]
    src = str(tmp_path / "sess")
    spark.createDataFrame(rows, "user_id int, ts timestamp, value double").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "10 minutes"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ns = sorted(r.n for r in spark.sql(f"SELECT n FROM {name}").collect())
    assert ns == [1, 2, 3]


def test_foreachbatch_parquet_sink(spark, tmp_path):
    """Windowed agg → foreachBatch parquet: the on-disk result after
    draining must equal the batch computation of closed windows."""
    from lambda_refarch_mapreduce_spark.streaming.events import (
        stream_to_parquet,
        windowed_agg,
    )

    d = _events_dir(spark, tmp_path)
    schema = spark.read.parquet(d).schema
    stream = read_event_stream(spark, d, schema)
    out = windowed_agg(stream, "ts", "value", window="1 hour", watermark="0 seconds")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = stream_to_parquet(out, sink, ckpt).start()
    q.awaitTermination(120)

    got = spark.read.parquet(sink)
    batch = (
        spark.read.parquet(d)
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("n_events"))
    )
    # append mode only emits windows closed by the final watermark —
    # every emitted window must match the batch result exactly
    batch_map = {
        r["window"]["start"]: (round(r["total"], 2), r["n_events"])
        for r in batch.collect()
    }
    rows = got.collect()
    assert rows, "sink is empty"
    for r in rows:
        assert batch_map[r["window_start"]] == (round(r["total"], 2), r["n_events"])


def test_watermark_drops_late_rows_after_eviction(spark, tmp_path):
    """The watermark guarantee Spark actually makes (append mode):
    a window is emitted exactly once when the watermark passes its
    end, and late rows arriving AFTER that eviction are dropped
    (numRowsDroppedByWatermark), never re-emitted. Note the lag: the
    watermark operative in batch N is computed from batch N-1, so
    eviction of window 9-10 happens in batch 2, and only a batch-3
    arrival is truly late."""
    import datetime as dt
    import glob
    import os

    d = str(tmp_path / "late_src")

    def t(h: int, m: int) -> dt.datetime:
        return dt.datetime(2024, 1, 1, h, m)

    def put(rows: list, mtime: int) -> None:
        before = set(glob.glob(os.path.join(d, "*.parquet")))
        spark.createDataFrame(
            rows, "user_id int, ts timestamp, value double"
        ).coalesce(1).write.mode("append").parquet(d)
        # file source processes files in mtime order — pin it
        for f in set(glob.glob(os.path.join(d, "*.parquet"))) - before:
            os.utime(f, (mtime, mtime))

    put([(1, t(9, 30), 1.0)], 100)   # creates window 9-10
    put([(2, t(12, 5), 1.0)], 200)   # event time jumps ahead
    put([(3, t(12, 10), 1.0)], 300)  # batch 2 runs with wm 11:55 -> 9-10 evicted+emitted
    put([(4, t(9, 45), 99.0)], 400)  # batch 3: late arrival after eviction

    schema = spark.read.parquet(d).schema
    stream = read_event_stream(spark, d, schema, max_files_per_trigger=1)
    out = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.sum("value").alias("total"))
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
    )
    rows = [
        (r["window"]["start"].hour, r["total"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    ]
    assert dropped == 1, q.recentProgress
    # 9-10 emitted exactly once, WITHOUT the late 99.0
    assert rows == [(9, 1.0)], rows


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """Stream-stream inner join with a time-interval condition: two
    file streams (clicks, views) joined per user within a 15-minute
    window. Both sides carry watermarks so join state is evictable —
    the property that makes stream-stream joins runnable forever.
    Result must equal the batch join of the same data."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    clicks_dir = str(tmp_path / "clicks")
    views_dir = str(tmp_path / "views")
    clicks = [
        (1, base + dt.timedelta(minutes=m), f"c{m}") for m in (0, 10, 40)
    ]
    views = [
        (1, base + dt.timedelta(minutes=m), f"v{m}") for m in (5, 12, 90)
    ]
    spark.createDataFrame(clicks, "user_id int, cts timestamp, click_id string").write.parquet(clicks_dir)
    spark.createDataFrame(views, "user_id int, vts timestamp, view_id string").write.parquet(views_dir)

    cs = (
        spark.readStream.schema(spark.read.parquet(clicks_dir).schema)
        .parquet(clicks_dir)
        .withWatermark("cts", "1 hour")
        .withColumnRenamed("user_id", "c_user")
    )
    vs = (
        spark.readStream.schema(spark.read.parquet(views_dir).schema)
        .parquet(views_dir)
        .withWatermark("vts", "1 hour")
    )

    joined = cs.join(
        vs,
        F.expr(
            """c_user = user_id AND
               vts >= cts AND vts <= cts + interval 15 minutes"""
        ),
    ).select("click_id", "view_id")

    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.click_id, r.view_id)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (c[2], v[2])
        for c in clicks
        for v in views
        if c[0] == v[0] and c[1] <= v[1] <= c[1] + dt.timedelta(minutes=15)
    }
    assert got == want and want, (got, want)


def test_ingest_dedup_stream_drops_cross_batch_dups(spark, tmp_path):
    """Continuous ingestion: a doc arriving in a later micro-batch
    that duplicates an earlier batch's content (exactly or near) is
    dropped; the corpus parquet ends up dup-free and the index grows
    with survivors only."""
    import os

    from lambda_refarch_mapreduce_spark.streaming.corpus import ingest_dedup_stream

    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    schema = "doc_id bigint, text string"
    b1 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "an entirely different document about spark shuffles and joins"),
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            # exact dup of doc 1 -> digest hit
            (10, "the quick brown fox jumps over the lazy dog again and again"),
            # fresh content
            (11, "completely novel text with no overlap whatsoever in shingles"),
            # exact dup within this same batch -> within-batch keep-first
            (12, "completely novel text with no overlap whatsoever in shingles"),
        ],
        schema,
    )
    b1.coalesce(1).write.parquet(src + "/f1")
    b2.coalesce(1).write.parquet(src + "/f2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    corpus_dir = str(tmp_path / "corpus")
    q = ingest_dedup_stream(
        stream,
        corpus_dir,
        str(tmp_path / "index"),
        str(tmp_path / "ckpt"),
    ).start()
    q.awaitTermination(120)

    got = spark.read.parquet(corpus_dir)
    ids = {r.doc_id for r in got.select("doc_id").collect()}
    texts = [r.text for r in got.select("text").collect()]
    assert 1 in ids and 2 in ids  # first batch all kept
    assert 10 not in ids  # cross-batch exact dup dropped
    assert 11 in ids or 12 in ids  # one copy of the within-batch pair
    assert not (11 in ids and 12 in ids)
    assert len(texts) == len(set(texts))  # corpus is dup-free
    # index grew by exactly the surviving distinct contents
    digests = spark.read.parquet(str(tmp_path / "index" / "digests"))
    assert digests.distinct().count() == len(set(texts))


def test_ingest_dedup_stream_restart_no_reappend(spark, tmp_path):
    """Restarting the ingest query on the same checkpoint with no new
    arrivals must not re-append committed batches (foreachBatch
    exactly-once via checkpointed batch ids)."""
    import os

    from lambda_refarch_mapreduce_spark.streaming.corpus import ingest_dedup_stream

    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, "some perfectly unique document text for the restart test")],
        "doc_id bigint, text string",
    ).coalesce(1).write.parquet(src + "/f1")

    corpus_dir = str(tmp_path / "corpus")

    def run():
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .parquet(src + "/f*")
        )
        q = ingest_dedup_stream(
            stream, corpus_dir, str(tmp_path / "index"), str(tmp_path / "ckpt")
        ).start()
        q.awaitTermination(120)

    run()
    n1 = spark.read.parquet(corpus_dir).count()
    run()  # restart, nothing new
    n2 = spark.read.parquet(corpus_dir).count()
    assert n1 == n2 == 1


def test_ingest_dedup_stream_replay_is_idempotent(spark, tmp_path):
    """A fresh checkpoint replays batch 0 from scratch (foreachBatch is
    at-least-once). The commit log must turn the replay into a no-op:
    no duplicate corpus rows, no duplicate index rows."""
    import os

    from lambda_refarch_mapreduce_spark.streaming.corpus import ingest_dedup_stream

    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, "a perfectly unique document for the replay idempotence test")],
        "doc_id bigint, text string",
    ).coalesce(1).write.parquet(src + "/f1")

    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "index")

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .parquet(src + "/f*")
        )
        q = ingest_dedup_stream(stream, corpus_dir, index_dir, ckpt).start()
        q.awaitTermination(120)

    run(str(tmp_path / "ckpt1"))
    run(str(tmp_path / "ckpt2"))  # replays batch 0 against the same sinks
    assert spark.read.parquet(corpus_dir).count() == 1
    digests = spark.read.parquet(str(tmp_path / "index" / "digests"))
    assert digests.count() == 1


def test_ingest_dedup_stream_partial_attempt_overwritten(spark, tmp_path):
    """Crash simulation for the at-least-once hole: a previous attempt
    of batch 0 wrote its digest index rows but died before the commit
    row. The replay must NOT see those uncommitted digests (else the
    batch's own docs look like exact dups and are lost) — it recomputes
    the original verdicts, overwrites the partial partition, and the
    document lands in the corpus exactly once."""
    import os

    from pyspark.sql import functions as F

    from lambda_refarch_mapreduce_spark.streaming.corpus import (
        ingest_dedup_stream,
        read_committed,
    )

    text = "the one document whose digest a crashed attempt already indexed"
    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, text)], "doc_id bigint, text string"
    ).coalesce(1).write.parquet(src + "/f1")

    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "index")
    # plant the crashed attempt: digest rows for batch 0, no commit row
    spark.createDataFrame([(text,)], "t string").select(
        F.md5("t").alias("digest")
    ).write.parquet(os.path.join(index_dir, "digests", "_batch_id=0"))

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .parquet(src + "/f*")
    )
    q = ingest_dedup_stream(
        stream, corpus_dir, index_dir, str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)

    got = spark.read.parquet(corpus_dir)
    assert [r.doc_id for r in got.collect()] == [1]  # not lost, not doubled
    committed = read_committed(
        spark, corpus_dir, index_dir, "doc_id bigint, text string"
    )
    assert committed.count() == 1


def test_read_committed_hides_uncommitted_partition(spark, tmp_path):
    """read_committed must filter rows whose batch never committed."""
    import os

    from lambda_refarch_mapreduce_spark.streaming.corpus import read_committed

    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "index")
    spark.createDataFrame(
        [(1, "committed doc")], "doc_id bigint, text string"
    ).write.parquet(os.path.join(corpus_dir, "_batch_id=0"))
    spark.createDataFrame(
        [(2, "uncommitted doc")], "doc_id bigint, text string"
    ).write.parquet(os.path.join(corpus_dir, "_batch_id=7"))
    spark.createDataFrame([(0,)], "batch_id bigint").write.parquet(
        os.path.join(index_dir, "commits")
    )

    assert spark.read.parquet(corpus_dir).count() == 2  # raw read sees both
    got = read_committed(
        spark, corpus_dir, index_dir, "doc_id bigint, text string"
    )
    assert [r.doc_id for r in got.collect()] == [1]


def test_python_datasource_streaming_batches(spark, tmp_path):
    """Streaming read of the custom Python DataSource: micro-batches
    advance by docs_per_batch ids, rows match the batch generator
    exactly (replayable offsets), and downstream agg works."""
    from pyspark.sql import functions as F

    from lambda_refarch_mapreduce_spark.sources.pyds import (
        register_synthetic_docs,
        synth_doc,
    )

    register_synthetic_docs(spark)
    out = str(tmp_path / "sink")
    q = (
        spark.readStream.format("synthetic_docs")
        .option("docs_per_batch", "40")
        .option("tokens_per_doc", "10")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        import time

        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            try:
                if spark.read.parquet(out).count() >= 80:
                    break
            except Exception:
                pass
            time.sleep(1)
    finally:
        q.stop()
    got = spark.read.parquet(out)
    n = got.count()
    assert n >= 80 and n % 40 == 0  # whole micro-batches, no partials
    rows = {r.doc_id: r.text for r in got.collect()}
    assert len(rows) == n  # ids unique: each batch is a disjoint slice
    for i in (0, 39, 41):  # spot-check against the pure generator
        if i in rows:
            assert rows[i] == synth_doc(0, i, 10, 0)
    # downstream relational ops compose
    assert got.groupBy("source").agg(F.count(F.lit(1))).count() <= 5


def test_streaming_ann_index_matches_batch_ivfadc(spark, tmp_path):
    """Streaming ANN ingest (streaming/ann.py): embeddings arrive in
    parquet chunks, each micro-batch is encoded against frozen
    centroids/codebooks and appended to the index; searching the
    committed index must return EXACTLY what batch ivfadc_topk
    computes over the same corpus with the same quantizers — the
    streaming path changes the arrival schedule, never the answer."""
    from lambda_refarch_mapreduce_spark import load_table
    from lambda_refarch_mapreduce_spark.operators import similarity
    from lambda_refarch_mapreduce_spark.streaming import ann

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = similarity.ivf_centroids(emb, "vec_id", "embedding", 8, 1)
    books = similarity.pq_codebooks(emb, "vec_id", "embedding", 8, 8)

    # corpus arrives as three chunks
    src = str(tmp_path / "vec_src")
    emb.withColumn("_chunk", F.pmod(F.col("vec_id"), F.lit(3))).write.partitionBy(
        "_chunk"
    ).parquet(src)
    schema = spark.read.parquet(src).drop("_chunk").schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "2"
    ).parquet(src + "/_chunk=*")

    index_dir = str(tmp_path / "ann_index")
    q = ann.ingest_embedding_stream(
        stream, cents, books, index_dir, str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)

    queries = emb.filter(F.col("vec_id") < 10)
    got = {
        (r.query_id, r.neighbor_id, r.dist2, r.rank)
        for r in ann.search_index(
            spark, index_dir, queries, cents, books, k=5, n_probe=3
        ).collect()
    }
    coded = similarity.ivfadc_encode(
        emb, cents, books, codebook_strategy="broadcast"
    )
    want = {
        (r.query_id, r.neighbor_id, r.dist2, r.rank)
        for r in similarity.ivfadc_search(
            coded, queries, cents, books, k=5, n_probe=3,
            codebook_strategy="broadcast",
        ).collect()
    }
    assert got == want and len(got) > 0
    # the index is committed-batch clean: every code row belongs to a
    # committed batch and every vector is indexed exactly once
    codes = ann.read_committed_codes(spark, index_dir)
    assert codes.count() == emb.count()
    assert codes.select("neighbor_id").distinct().count() == emb.count()


def test_ann_retrain_swap_search_equivalence(spark, tmp_path):
    """Index lifecycle (streaming/ann.py generations): bootstrap a
    generation with frozen quantizers, stream-ingest half the corpus,
    then run the batch retrain job (fresh quantizers on the FULL raw
    corpus, full re-encode, atomic CURRENT flip). search_current must
    equal batch ivfadc_topk over the same corpus before AND after the
    swap, and the old generation must stay intact for rollback."""
    from lambda_refarch_mapreduce_spark import load_table
    from lambda_refarch_mapreduce_spark.operators import similarity
    from lambda_refarch_mapreduce_spark.streaming import ann

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    half = emb.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 0)
    cents0 = similarity.ivf_centroids(half, "vec_id", "embedding", 8, 1)
    books0 = similarity.pq_codebooks(half, "vec_id", "embedding", 8, 8)

    index_dir = str(tmp_path / "ann_lifecycle")
    gen1 = ann.init_index(spark, index_dir, cents0, books0)
    assert gen1.endswith("gen-000001")
    assert ann.current_generation(index_dir) == 1
    # persisted quantizers roundtrip exactly
    assert ann.load_quantizers(spark, gen1) == (cents0, books0)

    # stream the bootstrap half into generation 1
    src = str(tmp_path / "vec_src")
    half.withColumn("_chunk", F.pmod(F.col("vec_id"), F.lit(4))).write.partitionBy(
        "_chunk"
    ).parquet(src)
    schema = spark.read.parquet(src).drop("_chunk").schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "2"
    ).parquet(src + "/_chunk=*")
    q = ann.ingest_embedding_stream(
        stream, cents0, books0, gen1, str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)

    queries = emb.filter(F.col("vec_id") < 10)

    def rows(df):
        return {(r.query_id, r.neighbor_id, r.dist2, r.rank) for r in df.collect()}

    got1 = rows(ann.search_current(spark, index_dir, queries, k=5, n_probe=3))
    want1 = rows(
        similarity.ivfadc_search(
            similarity.ivfadc_encode(half, cents0, books0),
            queries, cents0, books0, k=5, n_probe=3,
        )
    )
    assert got1 == want1 and len(got1) > 0

    # batch retrain on the FULL raw corpus -> generation 2 + swap
    gen2 = ann.retrain_index(
        spark, index_dir, emb, n_centroids=8, m=8, n_codes=8
    )
    assert gen2.endswith("gen-000002")
    assert ann.current_generation(index_dir) == 2

    got2 = rows(ann.search_current(spark, index_dir, queries, k=5, n_probe=3))
    want2 = rows(
        similarity.ivfadc_topk(
            emb, queries, k=5, n_centroids=8, n_probe=3, m=8, n_codes=8
        )
    )
    assert got2 == want2 and len(got2) > 0
    # the retrain actually changed the answer basis (new corpus ->
    # new quantizers -> generally different neighbors); if these were
    # equal the swap test would be vacuous
    assert got2 != got1

    # rollback safety: generation 1 is untouched and still serves
    cents1, books1 = ann.load_quantizers(spark, gen1)
    still = rows(
        ann.search_index(
            spark, gen1, queries, cents1, books1, k=5, n_probe=3
        )
    )
    assert still == got1


def test_streaming_drift_psi_matches_batch_entry(spark, tmp_path):
    """Streaming drift monitor (streaming/drift.py): snapshot-B docs
    arrive in chunks, each micro-batch folds its length histogram into
    the committed running state, and PSI against the frozen snapshot-A
    baseline must reproduce the batch corpus_drift_psi entry bin for
    bin (PSI contributions are symmetric in the two snapshots, and
    both monitors share operators.text.length_bin + the same Laplace
    smoothing). Replayed batches must not double-count."""
    from lambda_refarch_mapreduce_spark import load_table
    from lambda_refarch_mapreduce_spark.plans import catalog_llm  # noqa: F401
    from lambda_refarch_mapreduce_spark.plans.catalog import REGISTRY
    from lambda_refarch_mapreduce_spark.streaming import drift

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    snap_a = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    snap_b = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1)

    baseline = drift.baseline_histogram(snap_a)

    src = str(tmp_path / "doc_src")
    snap_b.withColumn("_chunk", F.pmod(F.col("doc_id"), F.lit(3))).write.partitionBy(
        "_chunk"
    ).parquet(src)
    schema = spark.read.parquet(src).drop("_chunk").schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src + "/_chunk=*")
    index_dir = str(tmp_path / "drift_idx")
    q = drift.ingest_length_histogram(
        stream, index_dir, str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)

    observed = drift.running_histogram(spark, index_dir)
    # the running histogram is exactly snapshot B's histogram
    want_hist = {
        (r.bin, r.n) for r in drift.baseline_histogram(snap_b).collect()
    }
    assert {(r.bin, r.n) for r in observed.collect()} == want_hist

    got = {
        r.bin: (r.n_base, r.n_obs, r.psi_contrib)
        for r in drift.psi_against_baseline(observed, baseline).collect()
    }
    batch = {
        r.bin: r.psi_contrib
        for r in REGISTRY["corpus_drift_psi"].spark(spark, sf).collect()
    }
    # bins the batch entry emits (present in either snapshot) must
    # match its contributions exactly; full-range-only bins are absent
    # from both snapshots
    for b, (n_base, n_obs, contrib) in got.items():
        if b in batch:
            assert contrib == batch[b], (b, contrib, batch[b])
        else:
            assert n_base == 0 and n_obs == 0
    assert set(batch) <= set(got)


import pytest


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("google") is None,
    reason="transformWithStateInPandas requires the protobuf package "
    "(its Python state-server protocol is protobuf-based) — absent in "
    "this container, same environment-blocked class as the Avro jar. "
    "The operator (streaming/stateful.py::running_stats_per_key_tws) "
    "is implemented; if protobuf appears, this test is the gate.",
)
def test_transform_with_state_matches_batch_and_twin(spark, tmp_path):
    """Spark 4 transformWithStateInPandas (typed state handles): the
    running-stats processor must equal the batch aggregation after
    draining, and agree with its applyInPandasWithState twin."""
    import uuid as _uuid

    from lambda_refarch_mapreduce_spark.streaming.events import (
        read_event_stream,
    )
    from lambda_refarch_mapreduce_spark.streaming.stateful import (
        running_stats_per_key_tws,
    )

    d = _events_dir(spark, tmp_path)
    schema = spark.read.parquet(d).schema
    stream = read_event_stream(spark, d, schema, max_files_per_trigger=2)
    out = running_stats_per_key_tws(stream, "user_id", "value")
    name = f"t_{_uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        f"""SELECT key, n_events, total, running_max FROM (
            SELECT *, row_number() OVER (PARTITION BY key ORDER BY n_events DESC) rn
            FROM {name}) WHERE rn = 1"""
    ).collect()
    got = {
        r.key: (r.n_events, round(r.total, 2), round(r.running_max, 2))
        for r in rows
    }
    want = {
        str(r.user_id): (r.n, round(r.total, 2), round(r.mx, 2))
        for r in spark.read.parquet(d)
        .groupBy("user_id")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert got == want


def test_ann_forget_vectors_deletion_propagation(spark, tmp_path):
    """Right-to-be-forgotten through the ANN index: after
    forget_vectors, search over the new generation must equal batch
    ivfadc over the surviving vectors with the SAME (unchanged)
    quantizers, forgotten ids must be absent from both the index and
    any result, and the prior generation must remain for audit."""
    from lambda_refarch_mapreduce_spark import load_table
    from lambda_refarch_mapreduce_spark.operators import similarity
    from lambda_refarch_mapreduce_spark.streaming import ann

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    index_dir = str(tmp_path / "ann_forget")
    gen1 = ann.retrain_index(
        spark, index_dir, emb, n_centroids=8, m=8, n_codes=8
    )
    cents, books = ann.load_quantizers(spark, gen1)

    forget = emb.filter(F.pmod(F.col("vec_id"), F.lit(3)) == 0).select(
        "vec_id"
    )
    gen2 = ann.forget_vectors(spark, index_dir, forget)
    assert gen2.endswith("gen-000002")
    # quantizers copied unchanged
    assert ann.load_quantizers(spark, gen2) == (cents, books)
    # forgotten ids are gone from the committed index
    remaining = ann.read_committed_codes(spark, gen2)
    forgotten = {r.vec_id for r in forget.collect()}
    assert not (
        {r.neighbor_id for r in remaining.collect()} & forgotten
    )

    queries = emb.filter(F.col("vec_id") < 10)

    def rows(df):
        return {(r.query_id, r.neighbor_id, r.dist2, r.rank) for r in df.collect()}

    got = rows(ann.search_current(spark, index_dir, queries, k=5, n_probe=3))
    survivors = emb.join(forget, "vec_id", "left_anti")
    want = rows(
        similarity.ivfadc_search(
            similarity.ivfadc_encode(survivors, cents, books),
            queries, cents, books, k=5, n_probe=3,
        )
    )
    assert got == want and len(got) > 0
    assert not {r[1] for r in got} & forgotten


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static join: a streaming fact enriched by a static
    (broadcastable) dimension — per-segment totals after draining must
    equal the batch join+aggregate."""
    d = _events_dir(spark, tmp_path)
    schema = spark.read.parquet(d).schema
    stream = read_event_stream(spark, d, schema, max_files_per_trigger=2)
    dim = (
        spark.read.parquet(d)
        .select("user_id")
        .distinct()
        .withColumn("segment", F.pmod(F.col("user_id"), F.lit(4)))
    )
    joined = stream.join(F.broadcast(dim), "user_id").groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    _run_to_memory(joined, name)
    got = {
        (r.segment, r.n, r.total)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (r.segment, r.n, r.total)
        for r in spark.read.parquet(d)
        .join(F.broadcast(dim), "user_id")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .collect()
    }
    assert got == want and len(got) == 4


def test_stream_last_touch_attribution_matches_batch(spark, tmp_path):
    """Streaming last-touch attribution (keyed O(1) state) drained
    over time-ordered files must equal the batch window twin's
    channel totals on the same events."""
    import os
    import time as _time

    from lambda_refarch_mapreduce_spark.operators import analytics
    from lambda_refarch_mapreduce_spark.streaming.stateful import (
        attribute_last_touch_stream,
    )

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    d = str(tmp_path / "ordered_events")
    os.makedirs(d)
    # event-time-ordered arrival: three sequential time slices, one
    # file each, strictly increasing mtimes (the append-only log
    # contract the operator documents)
    pdf = ev.orderBy("ts", "event_id").toPandas()
    cuts = [0, len(pdf) // 3, 2 * len(pdf) // 3, len(pdf)]
    for i in range(3):
        part = pdf.iloc[cuts[i]:cuts[i + 1]]
        spark.createDataFrame(part, schema=ev.schema).coalesce(1).write.parquet(
            os.path.join(d, f"slice={i:02d}")
        )
        _time.sleep(0.05)
    paths = [os.path.join(d, f"slice={i:02d}") for i in range(3)]
    schema = spark.read.parquet(paths[0]).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/slice=*")
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        attribute_last_touch_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.channel, r.n, r.total)
        for r in spark.sql(
            f"SELECT channel, count(*) AS n, round(sum(value), 2) AS total "
            f"FROM {name} GROUP BY channel"
        ).collect()
    }
    want = {
        (r.channel, r.conversions, r.total_value)
        for r in analytics.last_touch_attribution(
            spark.read.parquet(d + "/slice=*").select(*[f.name for f in ev.schema])
        ).collect()
    }
    assert got == want and len(got) > 0


def test_stream_funnel_matches_batch_summary(spark, tmp_path):
    """Streaming strict-order funnel drained over time-ordered files:
    per-stage reach counts must equal the batch funnel's user
    counts."""
    import os
    import time as _time

    from lambda_refarch_mapreduce_spark.operators import analytics
    from lambda_refarch_mapreduce_spark.streaming.stateful import (
        funnel_stages_stream,
    )

    stages = ["view", "click", "purchase"]
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    d = str(tmp_path / "ordered_events_f")
    os.makedirs(d)
    pdf = ev.orderBy("ts", "event_id").toPandas()
    cuts = [0, len(pdf) // 3, 2 * len(pdf) // 3, len(pdf)]
    for i in range(3):
        part = pdf.iloc[cuts[i]:cuts[i + 1]]
        spark.createDataFrame(part, schema=ev.schema).coalesce(1).write.parquet(
            os.path.join(d, f"slice={i:02d}")
        )
        _time.sleep(0.05)
    schema = spark.read.parquet(os.path.join(d, "slice=00")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/slice=*")
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        funnel_stages_stream(stream, stages)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.stage, r.n)
        for r in spark.sql(
            f"SELECT stage, count(*) AS n FROM {name} GROUP BY stage"
        ).collect()
    }
    want = {
        (r.stage, r.users)
        for r in analytics.funnel(
            spark.read.parquet(d + "/slice=*").select(*[f.name for f in ev.schema]),
            stages,
        ).collect()
        if r.users > 0
    }
    assert got == want and len(got) == 3


def test_stream_mv_maintenance_matches_full_recompute(spark, tmp_path):
    """Continuous MV maintenance (streaming/warehouse.py): a 3-slice
    CDC changelog drained one file per trigger must leave the live
    view EQUAL to the full recompute over the fully-applied base —
    including a key updated in slice 0, re-updated in slice 1 (the
    overlay-negation path: the second refresh must negate the
    post-first-change value, not the original), and deleted in slice
    2; a group that empties must drop out. Then the hard restart
    case: the checkpoint is LOST and a slice-3 file (one genuinely
    new insert plus a STALE lower-seq update of the deleted key) has
    landed — the restart packs replayed AND new files into one
    micro-batch, and the content-based freshness rule must apply
    exactly the new insert: replayed changes and the stale update
    drop (a batch-id watermark would have dropped the whole batch,
    new insert included). Old generations must be pruned to
    keep_generations."""
    import os
    import time as _time

    from lambda_refarch_mapreduce_spark.operators.analytics import apply_cdc
    from lambda_refarch_mapreduce_spark.streaming import warehouse as wh

    base = spark.createDataFrame(
        [(1, 10, 10.0), (2, 10, 5.0), (3, 11, 7.0), (4, 12, 2.0)],
        "k long, cust long, v double",
    ).withColumn("seg", (F.col("cust") % 2).cast("int"))
    slices = [
        # slice 0: update k1, insert k5
        [(1, 10, 20.0, 1, "U"), (5, 13, 4.0, 1, "I")],
        # slice 1: RE-update k1 (overlay negation), delete k3 (its
        # group seg=1 still holds k5 via cust=13)
        [(1, 10, 30.0, 2, "U"), (3, 11, 0.0, 2, "D")],
        # slice 2: delete k1, delete k5 -> group seg=1 empties out
        [(1, 10, 0.0, 3, "D"), (5, 13, 0.0, 3, "D")],
    ]
    d = str(tmp_path / "changelog")
    os.makedirs(d)
    sch = "k long, cust long, v double, seq long, op string"

    def write_slice(i, rows):
        spark.createDataFrame(rows, sch).withColumn(
            "seg", (F.col("cust") % 2).cast("int")
        ).coalesce(1).write.parquet(os.path.join(d, f"slice={i:02d}"))
        _time.sleep(0.05)

    for i, rows in enumerate(slices):
        write_slice(i, rows)
    view_dir = str(tmp_path / "view")
    wh.init_view(spark, view_dir, base, ["seg"], "v")
    schema = spark.read.parquet(os.path.join(d, "slice=00")).schema

    def drain(ckpt, per_file):
        stream = spark.readStream.schema(schema)
        if per_file:
            stream = stream.option("maxFilesPerTrigger", 1)
        stream = stream.parquet(d + "/slice=*")
        q = wh.maintain_view_stream(
            stream, view_dir, base, str(tmp_path / ckpt),
            ["k"], ["seg"], "v",
        ).start()
        q.awaitTermination(120)

    drain("ckpt", per_file=True)
    assert wh.current_generation(view_dir) == 4  # init + 3 batches

    def recompute():
        all_changes = spark.read.parquet(d + "/slice=*").select(
            "k", "cust", "v", "seg", "seq", "op"
        )
        # the recompute honors the same rule the maintainer does: the
        # stale slice-3 update of k1 (seq 2 < the delete's seq 3)
        # loses the per-key compaction inside apply_cdc
        return apply_cdc(
            base.select("k", "cust", "v", "seg"), all_changes, ["k"], "seq"
        )

    def view_rows():
        return {
            (r.seg, round(r.total, 6), r.n_rows)
            for r in wh.read_view(spark, view_dir).collect()
        }

    want = {
        (r.seg, round(r.total, 6), r.n_rows)
        for r in recompute().groupBy("seg")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    got = view_rows()
    assert got == want and len(got) == 1  # seg=1 emptied and dropped
    # the merge-on-read effective base equals the applied table
    eff = {
        tuple(r)
        for r in wh.effective_base(spark, view_dir, base, ["k"])
        .select("k", "cust", "v", "seg")
        .collect()
    }
    assert eff == {tuple(r) for r in recompute().collect()}
    # read_live hands back a consistent pair with one CURRENT resolve
    gen, live_view, live_ov = wh.read_live(spark, view_dir)
    assert gen == 4 and live_view.count() == 1 and live_ov.count() == 3

    # hard restart: checkpoint lost AND a new slice landed — one new
    # insert (k6, passes) and a STALE lower-seq update of deleted k1
    # (seq 2 < overlay's delete at seq 3, must drop for view AND
    # overlay). The restart drains with NO per-file trigger, so the
    # single micro-batch mixes all replayed files with the new one.
    write_slice(3, [(6, 14, 9.0, 1, "I"), (1, 10, 99.0, 2, "U")])
    drain("ckpt2", per_file=False)
    assert wh.current_generation(view_dir) == 5  # exactly one refresh
    want2 = {
        (r.seg, round(r.total, 6), r.n_rows)
        for r in recompute().groupBy("seg")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    assert view_rows() == want2
    # k1 stays deleted (stale update dropped everywhere)
    assert not (
        wh.effective_base(spark, view_dir, base, ["k"])
        .filter(F.col("k") == 1)
        .head(1)
    )
    # retention: only the live generation and keep-1 predecessors stay
    gens = sorted(
        p for p in os.listdir(view_dir) if p.startswith("gen-")
    )
    assert gens == ["gen-000004", "gen-000005"]
    # a second lost-checkpoint drain with nothing new: no generation
    drain("ckpt3", per_file=False)
    assert wh.current_generation(view_dir) == 5


def test_streaming_ab_monitor_matches_batch_entry(spark, tmp_path):
    """Streaming A/B monitor (streaming/abtest.py): purchase/click
    events arrive in chunks, each micro-batch folds its per-value
    count frame into committed state, and the served Mann-Whitney
    statistic must equal the batch mann_whitney_auc_value entry on the
    union EXACTLY (shared kernel, integer state). Replayed batches
    must not double-count."""
    from lambda_refarch_mapreduce_spark import load_table
    from lambda_refarch_mapreduce_spark.plans import (  # noqa: F401
        catalog_analytics,
    )
    from lambda_refarch_mapreduce_spark.plans.catalog import REGISTRY
    from lambda_refarch_mapreduce_spark.streaming import abtest

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")

    src = str(tmp_path / "ev_src")
    events.withColumn(
        "_chunk", F.pmod(F.col("event_id"), F.lit(3))
    ).write.partitionBy("_chunk").parquet(src)
    schema = spark.read.parquet(src).drop("_chunk").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/_chunk=*")
    )
    index_dir = str(tmp_path / "ab_idx")
    q = abtest.ingest_value_counts(
        stream, index_dir, str(tmp_path / "ckpt"), "purchase", "click"
    ).start()
    q.awaitTermination(120)

    # running state == the batch count frame on the union
    want_counts = {
        (r.v, r.ca, r.cb)
        for r in abtest.batch_value_counts(
            events, "purchase", "click"
        ).collect()
    }
    got_counts = {
        (r.v, r.ca, r.cb)
        for r in abtest.running_value_counts(spark, index_dir).collect()
    }
    assert got_counts == want_counts

    got = abtest.mann_whitney_now(spark, index_dir).collect()[0]
    want = REGISTRY["mann_whitney_auc_value"].spark(spark, sf).collect()[0]
    assert (got.n_a, got.n_b) == (want.n_purchase, want.n_click)
    assert got.auc == want.auc and got.z == want.z
    assert got.significant == want.significant

    # the Cliff's delta readout shares the same moment row: delta is
    # the effect-size reading of the same committed state
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cliffs_delta_from_value_counts,
    )

    got_cd = abtest.cliffs_now(spark, index_dir).collect()[0]
    want_cd = cliffs_delta_from_value_counts(
        abtest.batch_value_counts(events, "purchase", "click"),
        "v",
        "ca",
        "cb",
    ).collect()[0]
    assert tuple(got_cd) == tuple(want_cd)
    assert got_cd.z == got.z and abs(got_cd.delta - (2 * got.auc - 1)) < 5e-6

    # ...and the Kuiper / CvM readouts complete the CDF family on the
    # same committed frame
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cvm_from_value_counts,
        kuiper_from_value_counts,
    )

    got_kp = abtest.kuiper_now(spark, index_dir).collect()[0]
    want_kp = kuiper_from_value_counts(
        abtest.batch_value_counts(events, "purchase", "click"),
        "v",
        "ca",
        "cb",
    ).collect()[0]
    assert tuple(got_kp) == tuple(want_kp)
    got_cm = abtest.cvm_now(spark, index_dir).collect()[0]
    want_cm = cvm_from_value_counts(
        abtest.batch_value_counts(events, "purchase", "click"),
        "v",
        "ca",
        "cb",
    ).collect()[0]
    assert tuple(got_cm) == tuple(want_cm)
    assert got_kp.kuiper_v is not None and got_cm.cvm_t is not None

    # replay idempotence (foreachBatch is at-least-once): a second
    # application of an ALREADY-COMMITTED batch id must be a no-op —
    # exercised directly against the module-level batch function the
    # closure delegates to.
    abtest._apply_counts_batch(
        events.limit(50), 0, index_dir, "purchase", "click"
    )
    got_after_replay = {
        (r.v, r.ca, r.cb)
        for r in abtest.running_value_counts(spark, index_dir).collect()
    }
    assert got_after_replay == want_counts

    # lifecycle enforcement (VERDICT r7 #5): a FRESH checkpoint
    # meeting the surviving index must fail loudly — its replayed
    # batches would re-number from 0 and genuinely new data would be
    # silently skipped as already-committed. Previously this scenario
    # was a silent no-op; now corpus.guard_checkpoint_epoch raises.
    from pyspark.errors import StreamingQueryException

    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/_chunk=*")
    )
    q2 = abtest.ingest_value_counts(
        stream2, index_dir, str(tmp_path / "ckpt2"), "purchase", "click"
    ).start()
    try:
        q2.awaitTermination(120)
        raised = None
    except StreamingQueryException as e:
        raised = str(e)
    assert raised and "checkpoint epoch mismatch" in raised, raised
    # ...and the committed state is untouched by the failed run
    got_after_fresh_ckpt = {
        (r.v, r.ca, r.cb)
        for r in abtest.running_value_counts(spark, index_dir).collect()
    }
    assert got_after_fresh_ckpt == want_counts

    # the count frame is test-agnostic: the same committed state
    # serves KS and Welch readouts, each matching its batch kernel on
    # the union exactly
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        group_value_counts,
        ks_from_value_counts,
        welch_from_value_counts,
    )

    batch_counts = group_value_counts(events, "purchase", "click")
    for now_fn, kernel in (
        (abtest.ks_now, ks_from_value_counts),
        (abtest.welch_now, welch_from_value_counts),
    ):
        got_row = now_fn(spark, index_dir).collect()[0]
        want_row = kernel(batch_counts).collect()[0]
        assert tuple(got_row) == tuple(want_row), (got_row, want_row)

    # ...and the round-10 quantile-shift readout: the full Q-Q table
    # from the same committed frame equals the batch kernel exactly
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        qq_from_value_counts,
    )

    got_qq = sorted(
        tuple(r) for r in abtest.qq_now(spark, index_dir).collect()
    )
    want_qq = sorted(
        tuple(r) for r in qq_from_value_counts(batch_counts).collect()
    )
    assert got_qq == want_qq and len(got_qq) == 19

    # ...and the round-10 tail-weighted Anderson-Darling readout
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        anderson_darling_from_value_counts,
    )

    got_ad = abtest.ad_now(spark, index_dir).collect()[0]
    want_ad = anderson_darling_from_value_counts(
        batch_counts
    ).collect()[0]
    assert tuple(got_ad) == tuple(want_ad)

    # a restart of the SAME checkpoint is the legitimate lifecycle:
    # new source data drains under the recorded epoch without error
    # and the committed state advances to the union
    extra = events.limit(20).withColumn(
        "value", F.col("value") + F.lit(1000.0)
    )
    extra.coalesce(1).write.parquet(src + "/_chunk=3")
    stream3 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/_chunk=*")
    )
    q3 = abtest.ingest_value_counts(
        stream3, index_dir, str(tmp_path / "ckpt"), "purchase", "click"
    ).start()
    q3.awaitTermination(120)
    # the union must read BACK the written chunk: limit(20) is
    # nondeterministic, so re-evaluating `extra` inside the union can
    # pick a different 20 rows than the materialization the stream
    # actually consumed
    extra_written = spark.read.parquet(src + "/_chunk=3").select(
        *events.columns
    )
    union_counts = {
        (r.v, r.ca, r.cb)
        for r in abtest.batch_value_counts(
            events.unionAll(extra_written), "purchase", "click"
        ).collect()
    }
    got_after_restart = {
        (r.v, r.ca, r.cb)
        for r in abtest.running_value_counts(spark, index_dir).collect()
    }
    assert got_after_restart == union_counts

    # ...and every readout of this monitor equals its batch kernel on
    # the grown union after the restart (r13 inventory sweep — no
    # abtest readout without post-restart parity; the readouts are
    # pure functions of the committed state, so this also re-proves
    # the state equality above at the statistic level)
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cliffs_delta_from_value_counts,
        cvm_from_value_counts,
        kuiper_from_value_counts,
        mann_whitney_from_value_counts,
    )

    union_vc = abtest.batch_value_counts(
        events.unionAll(extra_written), "purchase", "click"
    )
    for readout, kernel in (
        (abtest.mann_whitney_now, mann_whitney_from_value_counts),
        (abtest.ks_now, ks_from_value_counts),
        (abtest.welch_now, welch_from_value_counts),
        (abtest.ad_now, anderson_darling_from_value_counts),
        (abtest.cliffs_now, cliffs_delta_from_value_counts),
        (abtest.kuiper_now, kuiper_from_value_counts),
        (abtest.cvm_now, cvm_from_value_counts),
    ):
        got_row = readout(spark, index_dir).collect()[0]
        want_row = kernel(union_vc, "v", "ca", "cb").collect()[0]
        assert tuple(got_row) == tuple(want_row), (
            readout.__name__,
            got_row,
            want_row,
        )
    got_qq2 = sorted(
        tuple(r) for r in abtest.qq_now(spark, index_dir).collect()
    )
    want_qq2 = sorted(
        tuple(r) for r in qq_from_value_counts(union_vc).collect()
    )
    assert got_qq2 == want_qq2 and len(got_qq2) == 19


def test_statestore_offline_inspection_matches_batch(spark, tmp_path):
    """Spark 4 offline streaming-state inspection — the ops capability
    behind state audits (is a forgotten user really gone from state?)
    and stuck-pipeline debugging without stopping the query: the
    `state-metadata` source lists each stateful operator's stores and
    batch range from the checkpoint alone, and the `statestore` source
    reads the keyed state itself as a DataFrame. The inspected state
    of a grouped running aggregate must equal the batch aggregate of
    everything ingested."""
    import os

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [(i, i % 5, float(i * 7 % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, k long, v double")
    df.coalesce(1).write.parquet(src + "/f1")

    stream = spark.readStream.schema("id long, k long, v double").parquet(
        src + "/f*"
    )
    agg = stream.groupBy("k").agg(
        F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")
    )
    ckpt = str(tmp_path / "ckpt")
    q = (
        agg.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    meta = spark.read.format("state-metadata").load(ckpt)
    m = meta.collect()
    assert len(m) == 1 and m[0].operatorName == "stateStoreSave"
    assert m[0].minBatchId == 0

    state = (
        spark.read.format("statestore")
        .load(ckpt)
        .selectExpr("key.k AS k", "value.sum AS total", "value.count AS n")
    )
    got = {(r.k, r.total, r.n) for r in state.collect()}
    want = {
        (r.k, r.total, r.n)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_streaming_countmin_merge_equals_batch_sketch(spark, tmp_path):
    """Streaming count-min (streaming/sketch.py): events arrive in
    chunks, each micro-batch commits its own d x w cell frame, and the
    MERGED sketch (cell addition == groupBy sum) must equal the batch
    sketch built over the union CELL FOR CELL — the mergeability law
    that makes per-batch/per-day sketches free to combine. Estimates
    served from the merged sketch therefore match the batch entry's
    kernel exactly, and the one-sided no-undercount contract holds."""
    from lambda_refarch_mapreduce_spark import load_table
    from lambda_refarch_mapreduce_spark.operators.sketch import (
        countmin_build,
    )
    from lambda_refarch_mapreduce_spark.streaming import sketch as ssk

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")
    src = str(tmp_path / "ev_src")
    events.withColumn(
        "_chunk", F.pmod(F.col("event_id"), F.lit(3))
    ).write.partitionBy("_chunk").parquet(src)
    schema = spark.read.parquet(src).drop("_chunk").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/_chunk=*")
    )
    index_dir = str(tmp_path / "cms_idx")
    q = ssk.ingest_countmin(
        stream, index_dir, str(tmp_path / "ckpt"), "user_id", 4, 64
    ).start()
    q.awaitTermination(120)

    merged = {
        (r.d, r.bucket): r.c
        for r in ssk.running_sketch(spark, index_dir).collect()
    }
    batch = {
        (r.d, r.bucket): r.c
        for r in countmin_build(events, "user_id", 4, 64).collect()
    }
    assert merged == batch  # cell-for-cell merge law

    exact = {
        r.user_id: r.n
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    probes = events.select("user_id").distinct()
    est = {
        r.user_id: r.est_n
        for r in ssk.lookup_now(
            spark, index_dir, probes, "user_id", 4, 64
        ).collect()
    }
    assert set(est) == set(exact)
    for u, n in exact.items():
        assert est[u] >= n, (u, est[u], n)  # never undercounts


def test_streaming_bloom_merge_and_no_false_negatives(spark, tmp_path):
    """Streaming Bloom filter (streaming/sketch.py): per-batch set-bit
    frames committed idempotently; the running filter (union+distinct
    == bitwise OR, the Bloom merge law) must equal the batch filter
    over the union BIT FOR BIT, and the packed running words must
    never reject a key that streamed through (no false negatives),
    while still rejecting most of a disjoint probe range."""
    from lambda_refarch_mapreduce_spark import load_table
    from lambda_refarch_mapreduce_spark.operators import sketch as osk
    from lambda_refarch_mapreduce_spark.streaming import sketch as ssk

    n_bits, k = 1 << 12, 2
    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")
    src = str(tmp_path / "ev_src")
    events.withColumn(
        "_chunk", F.pmod(F.col("event_id"), F.lit(3))
    ).write.partitionBy("_chunk").parquet(src)
    schema = spark.read.parquet(src).drop("_chunk").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/_chunk=*")
    )
    index_dir = str(tmp_path / "bloom_idx")
    q = ssk.ingest_bloom(
        stream, index_dir, str(tmp_path / "ckpt"), "user_id", n_bits, k
    ).start()
    q.awaitTermination(120)

    merged = {r.pos for r in ssk.running_bloom_bits(spark, index_dir).collect()}
    batch = {
        r.pos
        for r in osk.bloom_bits(events, "user_id", n_bits, k).collect()
    }
    assert merged == batch  # merge law, bit for bit

    words = ssk.bloom_words_now(spark, index_dir, n_bits)
    seen = {r.user_id for r in events.select("user_id").distinct().collect()}
    probe = spark.range(0, 5000).select(F.col("id").alias("uid"))
    passed = {
        r.uid
        for r in probe.filter(
            osk.bloom_might_contain(F.col("uid"), words, n_bits, k)
        ).collect()
    }
    assert seen <= passed  # no false negatives, ever
    assert len(passed) < 2500  # and the filter actually filters


def test_streaming_survival_monitor_matches_batch_kernels(spark, tmp_path):
    """Streaming survival monitor (streaming/survival.py, VERDICT r8
    'next round' #6): subject outcomes arrive in chunks, each
    micro-batch folds its (group, time) death/censor frame into
    committed state, and the served Kaplan-Meier curves (per arm and
    pooled) and log-rank statistic must equal the batch kernels on
    the union EXACTLY (shared kernels, additive integer state).
    Replayed batches must not double-count."""
    from lambda_refarch_mapreduce_spark import load_table
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        kaplan_meier,
        log_rank_from_subjects,
    )
    from lambda_refarch_mapreduce_spark.streaming import survival

    sf = "/root/testdata/sf0.001"
    seg_a, seg_b = "BUILDING", "MACHINERY"
    o = load_table(spark, sf, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d")
    )
    pu = o.groupBy("o_custkey").agg(
        F.min("d").alias("f"), F.max("d").alias("l")
    )
    hz = o.agg(F.max("d").alias("h"))
    seg = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    subjects = (
        pu.join(seg, "o_custkey")
        .crossJoin(F.broadcast(hz))
        .select(
            "o_custkey",
            (F.datediff("l", "f") + 1).cast("long").alias("t"),
            (F.datediff("h", "l") >= 365).cast("int").alias("event"),
            F.col("c_mktsegment").alias("g"),
        )
    )

    src = str(tmp_path / "subj_src")
    subjects.withColumn(
        "_chunk", F.pmod(F.col("o_custkey"), F.lit(3))
    ).write.partitionBy("_chunk").parquet(src)
    schema = spark.read.parquet(src).drop("_chunk").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/_chunk=*")
    )
    index_dir = str(tmp_path / "surv_idx")
    q = survival.ingest_survival_counts(
        stream, index_dir, str(tmp_path / "ckpt"), seg_a, seg_b
    ).start()
    q.awaitTermination(120)

    # running state == the batch collapse on the union
    want_counts = {
        (r.g, r.t, r.d, r.c)
        for r in survival.batch_survival_counts(
            subjects, seg_a, seg_b
        ).collect()
    }
    got_counts = {
        (r.g, r.t, r.d, r.c)
        for r in survival.running_survival_counts(
            spark, index_dir
        ).collect()
    }
    assert got_counts == want_counts

    # per-arm KM == batch kernel on that segment's subjects
    for arm, segname in (("a", seg_a), ("b", seg_b)):
        got = {
            tuple(r)
            for r in survival.kaplan_meier_now(
                spark, index_dir, group=arm
            ).collect()
        }
        want = {
            tuple(r)
            for r in kaplan_meier(
                subjects.filter(F.col("g") == segname)
            ).collect()
        }
        assert got == want, arm
    # pooled KM over both arms
    got_pool = {
        tuple(r)
        for r in survival.kaplan_meier_now(spark, index_dir).collect()
    }
    want_pool = {
        tuple(r)
        for r in kaplan_meier(
            subjects.filter(F.col("g").isin(seg_a, seg_b))
        ).collect()
    }
    assert got_pool == want_pool

    # Nelson-Aalen readout over the same committed frame == the batch
    # kernel on the union (one monitor, every survival estimator)
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        nelson_aalen_from_counts,
    )

    got_na = {
        tuple(r)
        for r in survival.nelson_aalen_now(
            spark, index_dir, group="a"
        ).collect()
    }
    want_na = {
        tuple(r)
        for r in nelson_aalen_from_counts(
            survival.batch_survival_counts(subjects, seg_a, seg_b)
            .filter(F.col("g") == "a")
            .select("t", "d", "c")
        ).collect()
    }
    assert got_na == want_na

    # log-rank readout == batch kernel on the union
    got_lr = survival.log_rank_now(spark, index_dir).collect()[0]
    want_lr = log_rank_from_subjects(
        subjects, "t", "event", "g", seg_a, seg_b
    ).collect()[0]
    assert tuple(got_lr) == tuple(want_lr)

    # Gehan-Wilcoxon readout == batch kernel on the same state (the
    # early-weighted member of the survival pair)
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        gehan_wilcoxon_from_counts,
    )

    got_gw = survival.gehan_now(spark, index_dir).collect()[0]
    want_gw = gehan_wilcoxon_from_counts(
        survival.batch_survival_counts(subjects, seg_a, seg_b)
    ).collect()[0]
    assert tuple(got_gw) == tuple(want_gw)
    assert (got_gw.n_a, got_gw.n_b) == (got_lr.n_a, got_lr.n_b)

    # replay idempotence: re-applying an already-committed batch id is
    # a no-op (module-level function, abtest.py's contract)
    survival._apply_survival_batch(
        subjects.limit(40), 0, index_dir, seg_a, seg_b
    )
    got_after_replay = {
        (r.g, r.t, r.d, r.c)
        for r in survival.running_survival_counts(
            spark, index_dir
        ).collect()
    }
    assert got_after_replay == want_counts


def test_streaming_survival_epoch_guard_raises_on_fresh_checkpoint(
    spark, tmp_path
):
    """Lifecycle contract for the survival monitor (same shared guard
    as abtest/sketch twins, both restart paths): a FRESH checkpoint
    meeting the surviving index raises instead of silently
    undercounting; a SAME-checkpoint restart drains new data."""
    import os

    from pyspark.errors import StreamingQueryException
    from lambda_refarch_mapreduce_spark.streaming import survival

    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [(5, 1, "a"), (7, 0, "b"), (3, 1, "a")],
        "t long, event int, g string",
    ).write.parquet(os.path.join(src, "f0"))
    schema = "t long, event int, g string"
    index_dir = str(tmp_path / "idx")

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/f*")
        )

    q = survival.ingest_survival_counts(
        stream(), index_dir, str(tmp_path / "ckpt"), "a", "b"
    ).start()
    q.awaitTermination(120)
    base = {
        (r.g, r.t, r.d, r.c)
        for r in survival.running_survival_counts(
            spark, index_dir
        ).collect()
    }
    assert base

    # fresh checkpoint + surviving index -> loud failure, state intact
    q2 = survival.ingest_survival_counts(
        stream(), index_dir, str(tmp_path / "ckpt2"), "a", "b"
    ).start()
    try:
        q2.awaitTermination(120)
        raised = None
    except StreamingQueryException as e:
        raised = str(e)
    assert raised and "checkpoint epoch mismatch" in raised, raised
    after = {
        (r.g, r.t, r.d, r.c)
        for r in survival.running_survival_counts(
            spark, index_dir
        ).collect()
    }
    assert after == base

    # same checkpoint + new file -> drains and merges
    spark.createDataFrame(
        [(5, 1, "a")], schema
    ).write.parquet(os.path.join(src, "f1"))
    q3 = survival.ingest_survival_counts(
        stream(), index_dir, str(tmp_path / "ckpt"), "a", "b"
    ).start()
    q3.awaitTermination(120)
    merged = {
        (r.g, r.t, r.d, r.c)
        for r in survival.running_survival_counts(
            spark, index_dir
        ).collect()
    }
    assert ("a", 5, 2, 0) in merged

    # ...and every readout of this monitor equals its batch kernel on
    # the grown union after the restart (r13 inventory sweep — no
    # survival readout without post-restart parity)
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        gehan_wilcoxon_from_counts,
        kaplan_meier,
        log_rank_from_subjects,
        nelson_aalen_from_counts,
    )

    union = spark.createDataFrame(
        [(5, 1, "a"), (7, 0, "b"), (3, 1, "a"), (5, 1, "a")], schema
    )
    union_counts = survival.batch_survival_counts(union, "a", "b")

    got_km = {
        tuple(r)
        for r in survival.kaplan_meier_now(spark, index_dir).collect()
    }
    want_km = {tuple(r) for r in kaplan_meier(union).collect()}
    assert got_km == want_km

    got_na = {
        tuple(r)
        for r in survival.nelson_aalen_now(
            spark, index_dir, group="a"
        ).collect()
    }
    want_na = {
        tuple(r)
        for r in nelson_aalen_from_counts(
            union_counts.filter(F.col("g") == "a").select("t", "d", "c")
        ).collect()
    }
    assert got_na == want_na

    got_lr = survival.log_rank_now(spark, index_dir).collect()[0]
    want_lr = log_rank_from_subjects(
        union, "t", "event", "g", "a", "b"
    ).collect()[0]
    assert tuple(got_lr) == tuple(want_lr)

    got_gw = survival.gehan_now(spark, index_dir).collect()[0]
    want_gw = gehan_wilcoxon_from_counts(union_counts).collect()[0]
    assert tuple(got_gw) == tuple(want_gw)


def test_streaming_sprt_monitor_matches_batch_entry(spark, tmp_path):
    """Streaming sequential-test monitor (streaming/sprt.py): events
    arrive in chunks, each micro-batch folds its per-day
    (successes, trials) frame into committed state, and the served
    SPRT decision equals the batch sprt_ab_daily_llr entry on the
    union EXACTLY (shared kernel, additive integer state). Replays
    must not double-count."""
    from lambda_refarch_mapreduce_spark import load_table
    from lambda_refarch_mapreduce_spark.plans import (  # noqa: F401
        catalog_analytics,
    )
    from lambda_refarch_mapreduce_spark.plans.catalog import REGISTRY
    from lambda_refarch_mapreduce_spark.plans.catalog_analytics import (
        SPRT_A_MICRO,
        SPRT_L1_MICRO,
        SPRT_L2_MICRO,
    )
    from lambda_refarch_mapreduce_spark.streaming import sprt

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")
    src = str(tmp_path / "ev_src")
    events.withColumn(
        "_chunk", F.pmod(F.col("event_id"), F.lit(3))
    ).write.partitionBy("_chunk").parquet(src)
    schema = spark.read.parquet(src).drop("_chunk").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/_chunk=*")
    )
    index_dir = str(tmp_path / "sprt_idx")
    q = sprt.ingest_day_counts(
        stream,
        index_dir,
        str(tmp_path / "ckpt"),
        "event_type = 'purchase'",
        "event_type IN ('purchase', 'click')",
    ).start()
    q.awaitTermination(120)

    # running state == the batch day collapse on the union
    want_counts = {
        (r.dd, r.x, r.m)
        for r in sprt.batch_day_counts(
            events,
            "event_type = 'purchase'",
            "event_type IN ('purchase', 'click')",
        ).collect()
    }
    got_counts = {
        (r.dd, r.x, r.m)
        for r in sprt.running_day_counts(spark, index_dir).collect()
    }
    assert got_counts == want_counts

    got = sprt.sprt_now(
        spark, index_dir, SPRT_L1_MICRO, SPRT_L2_MICRO, SPRT_A_MICRO
    ).collect()[0]
    want = REGISTRY["sprt_ab_daily_llr"].spark(spark, sf).collect()[0]
    assert tuple(got) == tuple(want)

    # the same committed frame serves the Mann-Kendall trend readout,
    # equal to the batch kernel on the union (shared kernel)
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        mann_kendall_trend,
    )

    # ...and the Holt-Winters forecast readout over the same frame
    # equals the batch kernel on the union
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        holt_winters_from_series,
    )

    got_fc = sprt.forecast_now(spark, index_dir).collect()[0]
    want_fc = holt_winters_from_series(
        sprt.batch_day_counts(
            events,
            "event_type = 'purchase'",
            "event_type IN ('purchase', 'click')",
        ).withColumn("__one", F.lit(1)),
        ["__one"],
        ["dd"],
        "m",
    ).drop("__one").collect()[0]
    assert tuple(got_fc) == tuple(want_fc)

    got_mk = sprt.trend_now(spark, index_dir).collect()[0]
    want_mk = mann_kendall_trend(
        sprt.batch_day_counts(
            events,
            "event_type = 'purchase'",
            "event_type IN ('purchase', 'click')",
        ),
        "dd",
        "x",
    ).collect()[0]
    assert tuple(got_mk) == tuple(want_mk)

    # ...and the rolling-origin backtest readout (round-10 shared
    # kernel) equals the batch kernel on the union
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        rolling_backtest_holt,
    )

    got_bt = sprt.backtest_now(spark, index_dir).collect()[0]
    want_bt = rolling_backtest_holt(
        sprt.batch_day_counts(
            events,
            "event_type = 'purchase'",
            "event_type IN ('purchase', 'click')",
        ),
        [],
        ["dd"],
        "m",
    ).collect()[0]
    assert tuple(got_bt) == tuple(want_bt)

    # ...and the seasonal-decomposition readout per committed day
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        seasonal_decompose_additive,
    )

    got_dc = sorted(
        tuple(r) for r in sprt.decompose_now(spark, index_dir).collect()
    )
    want_dc = sorted(
        tuple(r)
        for r in seasonal_decompose_additive(
            sprt.batch_day_counts(
                events,
                "event_type = 'purchase'",
                "event_type IN ('purchase', 'click')",
            ),
            [],
            "dd",
            "m",
        ).collect()
    )
    assert got_dc == want_dc and len(got_dc) > 0

    # ...and the retrospective changepoint readout on the committed
    # micro-rate series
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cusum_changepoint,
    )

    got_cp = sprt.changepoint_now(spark, index_dir).collect()[0]
    want_cp = cusum_changepoint(
        sprt.batch_day_counts(
            events,
            "event_type = 'purchase'",
            "event_type IN ('purchase', 'click')",
        ).selectExpr("dd", "(x * 1000000) div m AS rate_micro"),
        "dd",
        "rate_micro",
    ).collect()[0]
    assert tuple(got_cp) == tuple(want_cp)

    # ...and the seasonal Mann-Kendall readout (weekly phases)
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        seasonal_mann_kendall,
    )

    got_smk = sprt.seasonal_trend_now(spark, index_dir).collect()[0]
    want_smk = seasonal_mann_kendall(
        sprt.batch_day_counts(
            events,
            "event_type = 'purchase'",
            "event_type IN ('purchase', 'click')",
        ),
        "dd",
        "x",
    ).collect()[0]
    assert tuple(got_smk) == tuple(want_smk)

    # ...and the Holt-Winters backtest readout (round-11 shared
    # kernel) equals the batch kernel on the union
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        rolling_backtest_hw,
    )

    got_hwbt = sprt.seasonal_backtest_now(spark, index_dir).collect()[0]
    want_hwbt = rolling_backtest_hw(
        sprt.batch_day_counts(
            events,
            "event_type = 'purchase'",
            "event_type IN ('purchase', 'click')",
        ),
        [],
        ["dd"],
        "m",
    ).collect()[0]
    assert tuple(got_hwbt) == tuple(want_hwbt)

    # ...and the Ljung-Box white-noise readout on the committed daily
    # trial-volume series equals the batch kernel on the union
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        ljung_box_from_series,
    )

    got_lb = sprt.ljung_box_now(spark, index_dir).collect()[0]
    want_lb = ljung_box_from_series(
        sprt.batch_day_counts(
            events,
            "event_type = 'purchase'",
            "event_type IN ('purchase', 'click')",
        ),
        "dd",
        "m",
        7,
    ).collect()[0]
    assert tuple(got_lb) == tuple(want_lb)

    # ...and the runs-test readout on the committed micro-rate series
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        runs_test_from_series,
    )

    got_rt = sprt.runs_now(spark, index_dir).collect()[0]
    want_rt = runs_test_from_series(
        sprt.batch_day_counts(
            events,
            "event_type = 'purchase'",
            "event_type IN ('purchase', 'click')",
        ).selectExpr("dd", "(x * 1000000) div m AS rate_micro"),
        "dd",
        "rate_micro",
    ).collect()[0]
    assert tuple(got_rt) == tuple(want_rt)

    # replay idempotence: an already-committed batch id is a no-op
    sprt._apply_day_counts_batch(
        events.limit(30),
        0,
        index_dir,
        "event_type = 'purchase'",
        "event_type IN ('purchase', 'click')",
    )
    got_after = {
        (r.dd, r.x, r.m)
        for r in sprt.running_day_counts(spark, index_dir).collect()
    }
    assert got_after == want_counts


def test_monitor_readouts_serve_before_first_commit(spark, tmp_path):
    """The monitors' contract is 'servable at ANY moment' — including
    the moment before the first micro-batch commits. Every sprt and
    abtest readout must run on a fresh (empty) index without error
    and return its degenerate shape: empty tables for per-row
    readouts, one all-NULL/zero row for single-row statistics."""
    from lambda_refarch_mapreduce_spark.streaming import abtest, sprt

    sprt_dir = str(tmp_path / "sprt_idx")
    ab_dir = str(tmp_path / "ab_idx")

    counts = sprt.running_day_counts(spark, sprt_dir)
    assert counts.count() == 0

    r = sprt.sprt_now(spark, sprt_dir, 1000, -1000, 2944439).collect()
    assert len(r) == 1 and r[0].n_days == 0

    mk = sprt.trend_now(spark, sprt_dir).collect()[0]
    assert mk.n_obs == 0 and mk.s_mk == 0

    fc = sprt.forecast_now(spark, sprt_dir).collect()
    assert fc == [] or (len(fc) == 1 and fc[0].level is None)

    bt = sprt.backtest_now(spark, sprt_dir).collect()[0]
    assert bt.n_obs == 0 and bt.mae_holt is None

    hwbt = sprt.seasonal_backtest_now(spark, sprt_dir).collect()[0]
    assert hwbt.n_obs == 0 and hwbt.n_forecasts == 0
    assert hwbt.mae_hw is None and hwbt.skill_vs_holt is None

    dc = sprt.decompose_now(spark, sprt_dir).collect()
    assert dc == []

    cp = sprt.changepoint_now(spark, sprt_dir).collect()[0]
    assert cp.n_obs == 0 and cp.k_stat is None and cp.significant is None

    rcp = sprt.rank_changepoint_now(spark, sprt_dir).collect()[0]
    assert rcp.n_obs == 0 and rcp.u_stat is None
    assert rcp.p_approx is None and rcp.significant is None

    smk = sprt.seasonal_trend_now(spark, sprt_dir).collect()[0]
    assert smk.n_obs == 0 and smk.s_mk == 0

    lb = sprt.ljung_box_now(spark, sprt_dir).collect()[0]
    assert lb.n_obs == 0 and lb.n_lags == 0
    assert lb.q_stat is None and lb.significant is None

    rt = sprt.runs_now(spark, sprt_dir).collect()[0]
    assert (rt.n_above, rt.n_below, rt.n_runs) == (0, 0, 0)
    assert rt.z_runs is None and rt.verdict is None

    vc = abtest.running_value_counts(spark, ab_dir)
    assert vc.count() == 0
    qq = abtest.qq_now(spark, ab_dir).collect()
    assert qq == []  # no values -> no quantiles on either side
    ad = abtest.ad_now(spark, ab_dir).collect()[0]
    assert ad.a2 == 0.0  # empty term fold; counts NULL

    # ONE-ARM index (ADVICE r10): after only arm A has committed, the
    # readouts must stay honest — AD was a DIVIDE_BY_ZERO (1/nb) under
    # ANSI mode and QQ fabricated a full shift table from the pooled
    # alphabet (i * nb = 0 passes every probe row). Now: AD reports
    # the real counts with NULL a2/significant, QQ returns the empty
    # table the old per-side construction produced.
    one_arm = spark.createDataFrame(
        [("purchase", float(v)) for v in (1, 2, 3, 4, 5)],
        "event_type string, value double",
    )
    abtest._apply_counts_batch(one_arm, 0, ab_dir, "purchase", "click")
    assert abtest.running_value_counts(spark, ab_dir).count() == 5
    ad1 = abtest.ad_now(spark, ab_dir).collect()[0]
    assert ad1.n_a == 5 and ad1.n_b == 0
    assert ad1.a2 is None and ad1.significant is None
    assert abtest.qq_now(spark, ab_dir).collect() == []
    # the round-11 sweep of the same class: MW/KS/Welch readouts on
    # the one-arm index report real counts with NULL statistics
    # instead of an ANSI DIVIDE_BY_ZERO
    mw1 = abtest.mann_whitney_now(spark, ab_dir).collect()[0]
    assert (mw1.n_a, mw1.n_b) == (5, 0)
    assert mw1.auc is None and mw1.z is None and mw1.significant is None
    ks1 = abtest.ks_now(spark, ab_dir).collect()[0]
    assert (ks1.n_a, ks1.n_b) == (5, 0)
    assert ks1.ks_d is None and ks1.significant is None
    w1 = abtest.welch_now(spark, ab_dir).collect()[0]
    assert (w1.n_a, w1.n_b) == (5, 0)
    assert w1.mean_a is not None and w1.mean_b is None
    assert w1.t_stat is None and w1.significant is None
    cd1 = abtest.cliffs_now(spark, ab_dir).collect()[0]
    assert (cd1.n_a, cd1.n_b) == (5, 0)
    assert cd1.delta is None and cd1.magnitude is None
    kp1 = abtest.kuiper_now(spark, ab_dir).collect()[0]
    assert (kp1.n_a, kp1.n_b) == (5, 0)
    assert kp1.kuiper_v is None and kp1.significant is None
    cm1 = abtest.cvm_now(spark, ab_dir).collect()[0]
    assert (cm1.n_a, cm1.n_b) == (5, 0)
    assert cm1.cvm_t is None and cm1.significant is None


def test_streaming_sprt_epoch_guard_and_restart_readouts(
    spark, tmp_path
):
    """Lifecycle contract for the SPRT/timeseries monitor — the same
    two restart paths the survival/abtest twins pin (VERDICT r10
    stretch #7, closing the tier's pattern): a FRESH checkpoint
    meeting a surviving index raises loudly instead of silently
    double-counting, and a SAME-checkpoint restart drains new files —
    after which the decompose and changepoint readouts still equal
    the batch kernels on the grown union."""
    import os

    from pyspark.errors import StreamingQueryException
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        cusum_changepoint,
        seasonal_decompose_additive,
    )
    from lambda_refarch_mapreduce_spark.streaming import sprt

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "event_id long, event_type string, ts timestamp, value double"
    raw_schema = "event_id long, event_type string, ts string, value double"
    cast_cols = [
        "event_id",
        "event_type",
        "CAST(ts AS TIMESTAMP) ts",
        "value",
    ]
    rows0 = [
        (
            i,
            "purchase" if i % 3 == 0 else "click",
            f"2024-01-{(i % 20) + 1:02d} 00:00:00",
            float(i),
        )
        for i in range(60)
    ]
    spark.createDataFrame(rows0, raw_schema).selectExpr(
        *cast_cols
    ).write.parquet(os.path.join(src, "f0"))
    index_dir = str(tmp_path / "idx")

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/f*")
        )

    args = (
        "event_type = 'purchase'",
        "event_type IN ('purchase', 'click')",
    )
    q = sprt.ingest_day_counts(
        stream(), index_dir, str(tmp_path / "ckpt"), *args
    ).start()
    q.awaitTermination(120)
    base = {
        (r.dd, r.x, r.m)
        for r in sprt.running_day_counts(spark, index_dir).collect()
    }
    assert base

    # fresh checkpoint + surviving index -> loud failure, state intact
    q2 = sprt.ingest_day_counts(
        stream(), index_dir, str(tmp_path / "ckpt2"), *args
    ).start()
    try:
        q2.awaitTermination(120)
        raised = None
    except StreamingQueryException as e:
        raised = str(e)
    assert raised and "checkpoint epoch mismatch" in raised, raised
    after = {
        (r.dd, r.x, r.m)
        for r in sprt.running_day_counts(spark, index_dir).collect()
    }
    assert after == base

    # same checkpoint + new file -> drains; readouts equal batch on
    # the union (the decompose/changepoint parity surviving restart)
    rows1 = [
        (
            100 + i,
            "purchase" if i % 2 == 0 else "click",
            f"2024-01-{(i % 25) + 1:02d} 00:00:00",
            float(i),
        )
        for i in range(40)
    ]
    spark.createDataFrame(rows1, raw_schema).selectExpr(
        *cast_cols
    ).write.parquet(os.path.join(src, "f1"))
    q3 = sprt.ingest_day_counts(
        stream(), index_dir, str(tmp_path / "ckpt"), *args
    ).start()
    q3.awaitTermination(120)

    union = spark.createDataFrame(rows0 + rows1, raw_schema).selectExpr(
        *cast_cols
    )
    want_counts = {
        (r.dd, r.x, r.m)
        for r in sprt.batch_day_counts(union, *args).collect()
    }
    got_counts = {
        (r.dd, r.x, r.m)
        for r in sprt.running_day_counts(spark, index_dir).collect()
    }
    assert got_counts == want_counts

    got_dc = sorted(
        tuple(r) for r in sprt.decompose_now(spark, index_dir).collect()
    )
    want_dc = sorted(
        tuple(r)
        for r in seasonal_decompose_additive(
            sprt.batch_day_counts(union, *args), [], "dd", "m"
        ).collect()
    )
    assert got_dc == want_dc and len(got_dc) > 0

    got_cp = sprt.changepoint_now(spark, index_dir).collect()[0]
    want_cp = cusum_changepoint(
        sprt.batch_day_counts(union, *args).selectExpr(
            "dd", "(x * 1000000) div m AS rate_micro"
        ),
        "dd",
        "rate_micro",
    ).collect()[0]
    assert tuple(got_cp) == tuple(want_cp)

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        pettitt_changepoint,
    )

    got_rcp = sprt.rank_changepoint_now(spark, index_dir).collect()[0]
    want_rcp = pettitt_changepoint(
        sprt.batch_day_counts(union, *args).selectExpr(
            "dd", "(x * 1000000) div m AS rate_micro"
        ),
        "dd",
        "rate_micro",
    ).collect()[0]
    assert tuple(got_rcp) == tuple(want_rcp)

    # ...and the round-11 Ljung-Box / runs readouts survive the
    # restart with batch parity on the grown union too (VERDICT r11
    # next-round #6 — the decompose/changepoint treatment for the new
    # monitors)
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        ljung_box_from_series,
        runs_test_from_series,
    )

    got_lb = sprt.ljung_box_now(spark, index_dir).collect()[0]
    want_lb = ljung_box_from_series(
        sprt.batch_day_counts(union, *args), "dd", "m", 7
    ).collect()[0]
    assert tuple(got_lb) == tuple(want_lb)
    assert got_lb.q_stat is not None  # real statistic on 25 days

    got_rt = sprt.runs_now(spark, index_dir).collect()[0]
    want_rt = runs_test_from_series(
        sprt.batch_day_counts(union, *args).selectExpr(
            "dd", "(x * 1000000) div m AS rate_micro"
        ),
        "dd",
        "rate_micro",
    ).collect()[0]
    assert tuple(got_rt) == tuple(want_rt)
    assert got_rt.n_runs > 0 and got_rt.verdict is not None

    # ...and the remaining six readouts of this monitor (r13 inventory
    # sweep — no sprt readout without post-restart parity): the SPRT
    # walk itself, trend, forecast, backtest, seasonal trend and the
    # seasonal backtest, each vs its batch kernel on the grown union
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        holt_winters_from_series,
        mann_kendall_trend,
        rolling_backtest_holt,
        rolling_backtest_hw,
        seasonal_mann_kendall,
        sprt_walk_from_counts,
    )
    from lambda_refarch_mapreduce_spark.plans.catalog_analytics import (
        SPRT_A_MICRO,
        SPRT_L1_MICRO,
        SPRT_L2_MICRO,
    )

    union_days = sprt.batch_day_counts(union, *args)
    got_sp = sprt.sprt_now(
        spark, index_dir, SPRT_L1_MICRO, SPRT_L2_MICRO, SPRT_A_MICRO
    ).collect()[0]
    want_sp = sprt_walk_from_counts(
        union_days, SPRT_L1_MICRO, SPRT_L2_MICRO, SPRT_A_MICRO
    ).collect()[0]
    assert tuple(got_sp) == tuple(want_sp)

    got_mk = sprt.trend_now(spark, index_dir).collect()[0]
    want_mk = mann_kendall_trend(union_days, "dd", "x").collect()[0]
    assert tuple(got_mk) == tuple(want_mk)

    got_fc = sprt.forecast_now(spark, index_dir).collect()[0]
    want_fc = (
        holt_winters_from_series(
            union_days.withColumn("__one", F.lit(1)),
            ["__one"],
            ["dd"],
            "m",
        )
        .drop("__one")
        .collect()[0]
    )
    assert tuple(got_fc) == tuple(want_fc)

    got_bt = sprt.backtest_now(spark, index_dir).collect()[0]
    want_bt = rolling_backtest_holt(
        union_days, [], ["dd"], "m"
    ).collect()[0]
    assert tuple(got_bt) == tuple(want_bt)

    got_smk = sprt.seasonal_trend_now(spark, index_dir).collect()[0]
    want_smk = seasonal_mann_kendall(union_days, "dd", "x").collect()[0]
    assert tuple(got_smk) == tuple(want_smk)

    got_hwbt = sprt.seasonal_backtest_now(spark, index_dir).collect()[0]
    want_hwbt = rolling_backtest_hw(
        union_days, [], ["dd"], "m"
    ).collect()[0]
    assert tuple(got_hwbt) == tuple(want_hwbt)


def test_streaming_kgroup_monitor_matches_batch_kernels(spark, tmp_path):
    """The k-group monitor (streaming/kgroup.py — the k-sample
    generalization of the two-arm A/B monitor): events stream in
    chunks, the committed (g, v, c) state equals the batch collapse
    on the union, every readout (Kruskal-Wallis / Brown-Forsythe /
    ANOVA / Jonckheere-Terpstra) equals its batch kernel exactly, replays are no-ops, and
    the serve-at-any-moment contract holds on the empty and the
    one-group index."""
    from lambda_refarch_mapreduce_spark import load_table
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        anova_f_from_groups,
        brown_forsythe_from_counts,
        jonckheere_terpstra_from_counts,
        kruskal_wallis_from_counts,
    )
    from lambda_refarch_mapreduce_spark.streaming import kgroup

    # empty index: NULL statistics, zero/NULL counts, no errors
    empty_dir = str(tmp_path / "empty_idx")
    for ro in (
        kgroup.kruskal_now,
        kgroup.brown_forsythe_now,
        kgroup.anova_now,
        kgroup.mood_now,
    ):
        r = ro(spark, empty_dir).collect()[0]
        assert r.k_groups == 0 and r.significant is None
    jt0 = kgroup.jt_now(spark, empty_dir).collect()[0]
    assert jt0.k_groups == 0 and jt0.z_jt is None and jt0.trend is None

    # one-group index: real counts, NULL statistics
    one_dir = str(tmp_path / "one_idx")
    one_grp = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 2, 5)],
        "event_type string, value double",
    )
    kgroup._apply_group_counts_batch(one_grp, 0, one_dir)
    kw1 = kgroup.kruskal_now(spark, one_dir).collect()[0]
    assert (kw1.k_groups, kw1.n_total) == (1, 4)
    assert kw1.z_wh is None and kw1.significant is None
    bf1 = kgroup.brown_forsythe_now(spark, one_dir).collect()[0]
    assert bf1.k_groups == 1 and bf1.f_stat is None
    an1 = kgroup.anova_now(spark, one_dir).collect()[0]
    assert an1.k_groups == 1 and an1.f_stat is None
    jt1 = kgroup.jt_now(spark, one_dir).collect()[0]
    assert (jt1.k_groups, jt1.n_total) == (1, 4)
    assert jt1.jt_auc is None and jt1.z_jt is None
    md1 = kgroup.mood_now(spark, one_dir).collect()[0]
    assert (md1.k_groups, md1.n_total) == (1, 4)
    assert md1.chi2 is None and md1.significant is None

    # streamed in chunks == batch kernels on the union
    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")
    src = str(tmp_path / "ev_src")
    events.withColumn(
        "_chunk", F.pmod(F.col("event_id"), F.lit(3))
    ).write.partitionBy("_chunk").parquet(src)
    schema = spark.read.parquet(src).drop("_chunk").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/_chunk=*")
    )
    index_dir = str(tmp_path / "kg_idx")
    q = kgroup.ingest_group_counts(
        stream, index_dir, str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)

    want_counts = {
        (r.g, r.v, r.c)
        for r in kgroup.batch_group_counts(events).collect()
    }
    got_counts = {
        (r.g, r.v, r.c)
        for r in kgroup.running_group_counts(spark, index_dir).collect()
    }
    assert got_counts == want_counts

    batch_counts = kgroup.batch_group_counts(events)
    got_kw = kgroup.kruskal_now(spark, index_dir).collect()[0]
    want_kw = kruskal_wallis_from_counts(batch_counts).collect()[0]
    assert tuple(got_kw) == tuple(want_kw)
    assert got_kw.k_groups == 5 and got_kw.h_stat is not None

    got_bf = kgroup.brown_forsythe_now(spark, index_dir).collect()[0]
    want_bf = brown_forsythe_from_counts(batch_counts).collect()[0]
    assert tuple(got_bf) == tuple(want_bf)

    got_jt = kgroup.jt_now(spark, index_dir).collect()[0]
    want_jt = jonckheere_terpstra_from_counts(batch_counts).collect()[0]
    assert tuple(got_jt) == tuple(want_jt)
    assert got_jt.jt_auc is not None and got_jt.trend is not None

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        mood_median_from_counts,
    )

    got_md = kgroup.mood_now(spark, index_dir).collect()[0]
    want_md = mood_median_from_counts(batch_counts).collect()[0]
    assert tuple(got_md) == tuple(want_md)
    assert got_md.k_groups == 5 and got_md.chi2 is not None

    got_an = kgroup.anova_now(spark, index_dir).collect()[0]
    want_groups = batch_counts.groupBy("g").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("v")).alias("s"),
        F.sum(
            F.col("v").cast("decimal(38,0)") * F.col("v") * F.col("c")
        ).alias("q"),
    )
    want_an = anova_f_from_groups(want_groups).collect()[0]
    assert tuple(got_an) == tuple(want_an)

    # the batch entry consistency hook: the streamed KW equals the
    # registered kruskal_wallis_value_by_type entry on the same SF
    from lambda_refarch_mapreduce_spark.plans import (  # noqa: F401
        catalog_analytics,
    )
    from lambda_refarch_mapreduce_spark.plans.catalog import REGISTRY

    want_entry = REGISTRY["kruskal_wallis_value_by_type"].spark(
        spark, sf
    ).collect()[0]
    assert tuple(got_kw) == tuple(want_entry)

    # replay idempotence: an already-committed batch id is a no-op
    kgroup._apply_group_counts_batch(events.limit(30), 0, index_dir)
    after = {
        (r.g, r.v, r.c)
        for r in kgroup.running_group_counts(spark, index_dir).collect()
    }
    assert after == want_counts


def test_streaming_kgroup_epoch_guard_raises_on_fresh_checkpoint(
    spark, tmp_path
):
    """Lifecycle contract for the k-group monitor (the shared guard,
    both restart paths): a FRESH checkpoint meeting the surviving
    index raises instead of silently undercounting; a SAME-checkpoint
    restart drains new data."""
    import os

    from pyspark.errors import StreamingQueryException
    from lambda_refarch_mapreduce_spark.streaming import kgroup

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "event_type string, value double"
    spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("a", 3.0)], schema
    ).write.parquet(os.path.join(src, "f0"))
    index_dir = str(tmp_path / "idx")

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/f*")
        )

    q = kgroup.ingest_group_counts(
        stream(), index_dir, str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)
    base = {
        (r.g, r.v, r.c)
        for r in kgroup.running_group_counts(spark, index_dir).collect()
    }
    assert base

    q2 = kgroup.ingest_group_counts(
        stream(), index_dir, str(tmp_path / "ckpt2")
    ).start()
    try:
        q2.awaitTermination(120)
        raised = None
    except StreamingQueryException as e:
        raised = str(e)
    assert raised and "checkpoint epoch mismatch" in raised, raised
    after = {
        (r.g, r.v, r.c)
        for r in kgroup.running_group_counts(spark, index_dir).collect()
    }
    assert after == base

    # same checkpoint + new file -> drains and merges
    spark.createDataFrame([("c", 5.0)], schema).write.parquet(
        os.path.join(src, "f1")
    )
    q3 = kgroup.ingest_group_counts(
        stream(), index_dir, str(tmp_path / "ckpt")
    ).start()
    q3.awaitTermination(120)
    merged = {
        (r.g, r.v, r.c)
        for r in kgroup.running_group_counts(spark, index_dir).collect()
    }
    assert ("c", 500, 1) in merged

    # ...and the KW / Brown-Forsythe readouts equal the batch kernels
    # on the grown union after the restart (VERDICT r11 next-round #6
    # — the sprt monitor's restart-parity treatment for the k-group
    # readouts; the third group makes both statistics well-defined)
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        brown_forsythe_from_counts,
        kruskal_wallis_from_counts,
    )

    union = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("a", 3.0), ("c", 5.0)], schema
    )
    union_counts = kgroup.batch_group_counts(union)
    got_kw = kgroup.kruskal_now(spark, index_dir).collect()[0]
    want_kw = kruskal_wallis_from_counts(union_counts).collect()[0]
    assert tuple(got_kw) == tuple(want_kw)
    assert got_kw.k_groups == 3 and got_kw.h_stat is not None

    got_bf = kgroup.brown_forsythe_now(spark, index_dir).collect()[0]
    want_bf = brown_forsythe_from_counts(union_counts).collect()[0]
    assert tuple(got_bf) == tuple(want_bf)
    assert got_bf.k_groups == 3

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        mood_median_from_counts,
    )

    got_md = kgroup.mood_now(spark, index_dir).collect()[0]
    want_md = mood_median_from_counts(union_counts).collect()[0]
    assert tuple(got_md) == tuple(want_md)
    assert got_md.k_groups == 3

    # ...and the remaining two family members (r13 inventory sweep —
    # no kgroup readout without post-restart parity): ANOVA on the
    # per-group exact moments, JT on the ordered alternative
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        anova_f_from_groups,
        jonckheere_terpstra_from_counts,
    )

    got_an = kgroup.anova_now(spark, index_dir).collect()[0]
    want_groups = union_counts.groupBy("g").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("v")).alias("s"),
        F.sum(
            F.col("v").cast("decimal(38,0)") * F.col("v") * F.col("c")
        ).alias("q"),
    )
    want_an = anova_f_from_groups(want_groups).collect()[0]
    assert tuple(got_an) == tuple(want_an)
    assert got_an.k_groups == 3

    got_jt = kgroup.jt_now(spark, index_dir).collect()[0]
    want_jt = jonckheere_terpstra_from_counts(union_counts).collect()[0]
    assert tuple(got_jt) == tuple(want_jt)
    assert got_jt.k_groups == 3


def test_streaming_sketch_epoch_guard_and_restart_readouts(
    spark, tmp_path
):
    """Lifecycle contract for the sketch monitors (r13 inventory sweep
    — lookup_now / bloom_words_now were the last readouts without
    their own both-restart-path test; they ride the same shared
    corpus.guard_checkpoint_epoch as every monitor): a FRESH
    checkpoint meeting the surviving index raises instead of silently
    undercounting; a SAME-checkpoint restart drains new data and both
    readouts keep their contracts on the grown union (count-min never
    undercounts; the Bloom words never reject a streamed key)."""
    import os

    from pyspark.errors import StreamingQueryException
    from lambda_refarch_mapreduce_spark.operators import sketch as osk
    from lambda_refarch_mapreduce_spark.operators.sketch import (
        countmin_build,
    )
    from lambda_refarch_mapreduce_spark.streaming import sketch as ssk

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "user_id long"
    spark.createDataFrame(
        [(1,), (2,), (2,), (3,)], schema
    ).write.parquet(os.path.join(src, "f0"))

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/f*")
        )

    cms_dir = str(tmp_path / "cms_idx")
    q = ssk.ingest_countmin(
        stream(), cms_dir, str(tmp_path / "cms_ckpt"), "user_id", 4, 64
    ).start()
    q.awaitTermination(120)
    base = {
        (r.d, r.bucket): r.c
        for r in ssk.running_sketch(spark, cms_dir).collect()
    }
    assert base

    # fresh checkpoint + surviving index -> loud failure, state intact
    q2 = ssk.ingest_countmin(
        stream(), cms_dir, str(tmp_path / "cms_ckpt2"), "user_id", 4, 64
    ).start()
    try:
        q2.awaitTermination(120)
        raised = None
    except StreamingQueryException as e:
        raised = str(e)
    assert raised and "checkpoint epoch mismatch" in raised, raised
    after = {
        (r.d, r.bucket): r.c
        for r in ssk.running_sketch(spark, cms_dir).collect()
    }
    assert after == base

    # same checkpoint + new file -> drains; merged state and the
    # lookup_now readout equal the batch sketch on the union
    spark.createDataFrame([(2,), (4,)], schema).write.parquet(
        os.path.join(src, "f1")
    )
    q3 = ssk.ingest_countmin(
        stream(), cms_dir, str(tmp_path / "cms_ckpt"), "user_id", 4, 64
    ).start()
    q3.awaitTermination(120)
    union = spark.createDataFrame(
        [(1,), (2,), (2,), (3,), (2,), (4,)], schema
    )
    merged = {
        (r.d, r.bucket): r.c
        for r in ssk.running_sketch(spark, cms_dir).collect()
    }
    batch = {
        (r.d, r.bucket): r.c
        for r in countmin_build(union, "user_id", 4, 64).collect()
    }
    assert merged == batch  # cell-for-cell merge law after restart
    exact = {1: 1, 2: 3, 3: 1, 4: 1}
    est = {
        r.user_id: r.est_n
        for r in ssk.lookup_now(
            spark, cms_dir, union.distinct(), "user_id", 4, 64
        ).collect()
    }
    assert set(est) == set(exact)
    for u, n in exact.items():
        assert est[u] >= n, (u, est[u], n)

    # the Bloom twin: same two restart paths, then the packed words
    # must still accept every streamed key on the grown union
    n_bits, k = 1 << 12, 2
    bsrc = str(tmp_path / "bsrc")
    os.makedirs(bsrc)
    spark.createDataFrame([(10,), (20,)], schema).write.parquet(
        os.path.join(bsrc, "f0")
    )

    def bstream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(bsrc + "/f*")
        )

    bloom_dir = str(tmp_path / "bloom_idx")
    qb = ssk.ingest_bloom(
        bstream(), bloom_dir, str(tmp_path / "b_ckpt"), "user_id",
        n_bits, k,
    ).start()
    qb.awaitTermination(120)
    qb2 = ssk.ingest_bloom(
        bstream(), bloom_dir, str(tmp_path / "b_ckpt2"), "user_id",
        n_bits, k,
    ).start()
    try:
        qb2.awaitTermination(120)
        braised = None
    except StreamingQueryException as e:
        braised = str(e)
    assert braised and "checkpoint epoch mismatch" in braised, braised

    spark.createDataFrame([(30,)], schema).write.parquet(
        os.path.join(bsrc, "f1")
    )
    qb3 = ssk.ingest_bloom(
        bstream(), bloom_dir, str(tmp_path / "b_ckpt"), "user_id",
        n_bits, k,
    ).start()
    qb3.awaitTermination(120)
    words = ssk.bloom_words_now(spark, bloom_dir, n_bits)
    streamed = spark.createDataFrame(
        [(10,), (20,), (30,)], schema
    ).select(F.col("user_id").alias("uid"))
    accepted = {
        r.uid
        for r in streamed.filter(
            osk.bloom_might_contain(F.col("uid"), words, n_bits, k)
        ).collect()
    }
    assert accepted == {10, 20, 30}  # no false negatives after restart
