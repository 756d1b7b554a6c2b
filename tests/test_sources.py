"""Source formats beyond plain CSV/parquet: gzip CSV (reference O4 —
Node-only suffix-sniffed gunzip, mapper.js:71-79, here transparent),
JSON lines, text; plus the metrics/cost report (O12-O14 analog)."""

from __future__ import annotations

import gzip
import json
import random

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from lambda_refarch_mapreduce_spark.metrics import CostModel, MeasuredRun
from lambda_refarch_mapreduce_spark.sources.readers import (
    load_table,
    read_csv,
    read_json,
    read_text,
)
from tests.conftest import SF_SMOKE

SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("rank", IntegerType()),
        StructField("score", DoubleType()),
    ]
)


def _write_rows(path, gz: bool):
    rng = random.Random(7)
    opener = gzip.open if gz else open
    with opener(path, "wt") as f:
        for i in range(1000):
            f.write(f"item{i},{rng.randint(1, 100)},{rng.uniform(0, 1):.4f}\n")


def test_gzip_csv_transparent(spark, tmp_path):
    """Codec inference by suffix: .csv.gz reads identically to .csv
    (the reference only had this in the Node mapper; Python lacked it,
    SURVEY.md O4)."""
    plain = str(tmp_path / "data.csv")
    gzipped = str(tmp_path / "data.csv.gz")
    _write_rows(plain, gz=False)
    _write_rows(gzipped, gz=True)
    a = read_csv(spark, plain, SCHEMA).collect()
    b = read_csv(spark, gzipped, SCHEMA).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 1000


def test_json_lines_source(spark, tmp_path):
    path = str(tmp_path / "data.jsonl")
    with open(path, "w") as f:
        for i in range(100):
            f.write(json.dumps({"name": f"n{i}", "rank": i, "score": i / 10}) + "\n")
    df = read_json(spark, path, SCHEMA)
    assert df.count() == 100
    assert df.filter(F.col("rank") >= 50).count() == 50


def test_text_source_line_splitting(spark, tmp_path):
    """Raw line source (reference O5: split('\\n') with trailing-empty
    drop, mapper.py:47 — Spark's text reader has the same contract for
    newline-terminated files)."""
    path = str(tmp_path / "lines.txt")
    with open(path, "w") as f:
        f.write("a\nb\nc\n")  # newline-terminated: 3 lines, not 4
    assert read_text(spark, path).count() == 3


def test_measured_run_cost_report(spark):
    """Cost/stats report (reference driver.py:216-279): shape and
    monotonicity — longer work costs more dollars."""
    with MeasuredRun(spark, CostModel(usd_per_core_hour=0.05)) as m:
        spark.range(1_000_000).agg(F.sum("id")).collect()
    rep = m.stats.report()
    assert rep["wall_secs"] > 0
    assert rep["cost_usd"] > 0
    assert rep["n_jobs"] >= 1
    # the test session runs with spark.ui.enabled=false → byte counters
    # cannot be measured, so the report must OMIT them rather than emit
    # zeros that read as "measured zero bytes"
    if not m.stats.bytes_measured:
        assert "bytes_read" not in rep
        assert "shuffle_bytes" not in rep
        assert "bytes_written" not in rep


def test_write_with_manifest_roundtrip(spark, tmp_path):
    """O12 analog: sink writes data + _manifest.json with exact row
    count and checksum metrics accumulated during the write."""
    from lambda_refarch_mapreduce_spark.sources.sinks import (
        read_manifest,
        write_with_manifest,
    )

    df = load_table(spark, SF_SMOKE, "orders")
    out = str(tmp_path / "orders_out")
    manifest = write_with_manifest(
        df,
        out,
        extra_metrics={"total_price": F.round(F.sum("o_totalprice"), 2)},
    )
    n = df.count()
    assert manifest["rows_written"] == n
    assert manifest["bytes_written"] > 0
    assert read_manifest(out)["rows_written"] == n
    back = spark.read.parquet(out)
    assert back.count() == n
    assert round(
        back.agg(F.sum("o_totalprice")).collect()[0][0], 2
    ) == manifest["total_price"]


def test_observe_metrics_inline(spark):
    from lambda_refarch_mapreduce_spark.metrics import observe

    df = load_table(spark, SF_SMOKE, "events")
    observed, obs = observe(
        df, rows=F.count(F.lit(1)), max_value=F.max("value")
    )
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["rows"] == df.count()
    assert got["max_value"] == df.agg(F.max("value")).collect()[0][0]


def test_orc_roundtrip_with_manifest(spark, tmp_path):
    """ORC sink+source: write via the manifest sink (fmt-generic O12
    path), read back with read_orc — schema and values preserved."""
    from lambda_refarch_mapreduce_spark.sources.readers import read_orc
    from lambda_refarch_mapreduce_spark.sources.sinks import write_with_manifest

    df = load_table(spark, SF_SMOKE, "nation")
    out = str(tmp_path / "nation_orc")
    manifest = write_with_manifest(df, out, fmt="orc")
    back = read_orc(spark, out)
    assert manifest["rows_written"] == df.count()
    assert back.schema == df.schema
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in df.collect()
    )


@pytest.mark.skip(
    reason="spark-avro jar unavailable offline — the Avro DataSource is "
    "external to Spark core (org.apache.spark:spark-avro). If the jar "
    "appears on the classpath, unskip: the roundtrip below is the test."
)
def test_avro_roundtrip(spark, tmp_path):
    """Tracked gap (COVERAGE.md §2.3): Avro is the one mainstream
    format absent. Write+read nation as Avro and compare contents."""
    df = load_table(spark, SF_SMOKE, "nation")
    out = str(tmp_path / "nation_avro")
    df.write.format("avro").save(out)
    back = spark.read.format("avro").load(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_deflate_text_transparent(spark, tmp_path):
    """.deflate suffix (Hadoop DeflateCodec = zlib) reads as lines,
    same contract as .gz — the reference README lists deflate among its
    dataset encodings but never implemented it."""
    import zlib

    lines = [f"line{i}" for i in range(100)]
    path = str(tmp_path / "data.txt.deflate")
    with open(path, "wb") as f:
        f.write(zlib.compress(("\n".join(lines) + "\n").encode()))
    got = [r.value for r in read_text(spark, path).collect()]
    assert sorted(got) == sorted(lines)


def test_sequencefile_roundtrip(spark, tmp_path):
    """SequenceFile (Text, Text) → 2-column DataFrame; the one RDD
    seam in the engine (no DataSource V2 for SequenceFile)."""
    from lambda_refarch_mapreduce_spark.sources.readers import read_sequencefile

    path = str(tmp_path / "seq")
    pairs = [(f"k{i}", f"v{i}") for i in range(50)]
    spark.sparkContext.parallelize(pairs, 4).saveAsSequenceFile(path)
    df = read_sequencefile(spark, path)
    assert df.columns == ["key", "value"]
    assert sorted((r.key, r.value) for r in df.collect()) == sorted(pairs)
    # downstream is ordinary Catalyst: filter works
    assert df.filter(F.col("key") == "k7").count() == 1


def test_write_shuffled_shards_deterministic(spark, tmp_path):
    """Shuffle-and-shard: fixed shard count, within-shard ordering by
    the portable key, byte-identical rerun with the same seed."""
    from lambda_refarch_mapreduce_spark.sources.sinks import (
        shuffle_key,
        write_shuffled_shards,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    out1 = str(tmp_path / "shards1")
    out2 = str(tmp_path / "shards2")
    write_shuffled_shards(docs, out1, "doc_id", n_shards=8)
    write_shuffled_shards(docs, out2, "doc_id", n_shards=8)

    back = spark.read.parquet(out1)
    assert back.count() == docs.count()
    assert back.select("shard").distinct().count() == 8
    # within a shard, rows are ordered by the (persisted) shuffle key
    keys = [r.sort_key for r in back.filter(F.col("shard") == 3).collect()]
    assert len(keys) > 1 and keys == sorted(keys)
    # and the key matches the portable definition
    recomputed = (
        back.filter(F.col("shard") == 3)
        .withColumn("k2", shuffle_key(F.col("doc_id")))
        .filter(F.col("sort_key") != F.col("k2"))
        .count()
    )
    assert recomputed == 0
    # deterministic rerun: same (shard, doc_id) assignment
    a = {(r.shard, r.doc_id) for r in back.select("shard", "doc_id").collect()}
    b = {
        (r.shard, r.doc_id)
        for r in spark.read.parquet(out2).select("shard", "doc_id").collect()
    }
    assert a == b


def test_python_datasource_synthetic_docs(spark):
    """Spark-4 Python DataSource: deterministic across runs AND
    partition counts; planted dups land where promised; composes with
    the dedup operators."""
    from lambda_refarch_mapreduce_spark.operators import dedup
    from lambda_refarch_mapreduce_spark.sources.pyds import (
        register_synthetic_docs,
        synth_doc,
    )

    register_synthetic_docs(spark)

    def load(parts):
        return (
            spark.read.format("synthetic_docs")
            .option("n_docs", "200")
            .option("n_partitions", str(parts))
            .option("tokens_per_doc", "20")
            .option("dup_every", "50")
            .load()
        )

    df = load(4)
    assert df.count() == 200
    assert df.rdd.getNumPartitions() == 4
    rows = {r.doc_id: r.text for r in df.collect()}
    # partition-count invariance
    assert {r.doc_id: r.text for r in load(7).collect()} == rows
    # python-side generator agrees with what the executors produced
    assert rows[3] == synth_doc(0, 3, 20, 50)
    # planted dups: 50==0? ids 50,100,150 replay the previous multiple
    assert rows[100] == rows[50] == rows[0]
    groups = dedup.exact_duplicates(df, "doc_id", "text").collect()
    dup_groups = [g for g in groups if g.n_copies > 1]
    assert len(dup_groups) == 1 and dup_groups[0].n_copies == 4  # ids 0,50,100,150
    assert dup_groups[0].keep_id == 0


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution across parquet shards: a column added later
    must surface (null-padded for old shards) under mergeSchema — the
    long-lived-dataset reality at 100 TB where shards span schema
    versions."""
    old = spark.createDataFrame([(1, "a")], "id bigint, name string")
    new = spark.createDataFrame(
        [(2, "b", 0.9)], "id bigint, name string, score double"
    )
    old.write.parquet(str(tmp_path / "p"), mode="append")
    new.write.parquet(str(tmp_path / "p"), mode="append")
    df = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "p"))
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: r for r in df.collect()}
    assert rows[1].score is None and rows[2].score == 0.9


def test_python_datasource_stream_writer_manifest_commit(spark, tmp_path):
    """Custom streaming SINK (Spark-4 DataSourceStreamWriter,
    sources/pyds.py jsonl_manifest): drain an events stream into the
    sink, then read back ONLY manifest-committed rows — they must
    equal the batch input exactly, and every staged part on disk must
    be accounted for by a manifest (no orphaned uncommitted parts
    after a clean drain)."""
    import glob
    import json
    import os

    from pyspark.sql import functions as F

    from lambda_refarch_mapreduce_spark.sources.pyds import (
        read_committed_jsonl,
        register_jsonl_manifest_sink,
    )

    register_jsonl_manifest_sink(spark)
    src = str(tmp_path / "src")
    load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type"
    ).repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    sink = str(tmp_path / "jsonl_sink")
    q = (
        stream.writeStream.format("jsonl_manifest")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.event_id, r.user_id, r.event_type)
        for r in read_committed_jsonl(spark, sink)
        .select(
            F.col("event_id").cast("long"),
            F.col("user_id").cast("long"),
            "event_type",
        )
        .collect()
    }
    want = {
        (r.event_id, r.user_id, r.event_type)
        for r in spark.read.parquet(src).collect()
    }
    assert got == want and len(got) > 0
    committed = set()
    for mf in glob.glob(os.path.join(sink, "_commits", "batch-*.json")):
        committed |= {p["path"] for p in json.load(open(mf))["parts"]}
    staged = set(glob.glob(os.path.join(sink, "_staging", "*.jsonl")))
    # every non-empty staged part is committed (empty tasks stage a
    # zero-row file the manifest omits)
    for p in staged - committed:
        assert os.path.getsize(p) == 0, f"orphaned non-empty part {p}"


def test_json_corrupt_record_quarantine(spark, tmp_path):
    """read_json(corrupt_col=...): malformed JSONL lines survive as
    quarantine rows (raw line captured, data fields NULL) instead of
    vanishing — the JSON twin of the CSV drop-and-count contract."""
    p = str(tmp_path / "docs.jsonl")
    with open(p, "w") as fh:
        fh.write('{"id": 1, "v": "a"}\n')
        fh.write("{broken json!!\n")
        fh.write('{"id": 3, "v": "c"}\n')
    from lambda_refarch_mapreduce_spark.sources.readers import read_json

    df = read_json(
        spark, p,
        schema="id bigint, v string, _bad string",
        corrupt_col="_bad",
    ).cache()
    good = {(r.id, r.v) for r in df.filter(F.col("_bad").isNull()).collect()}
    bad = [r._bad for r in df.filter(F.col("_bad").isNotNull()).collect()]
    assert good == {(1, "a"), (3, "c")}
    assert bad == ["{broken json!!"]
    import pytest

    with pytest.raises(ValueError, match="requires an explicit schema"):
        read_json(spark, p, corrupt_col="_bad")


def test_read_committed_jsonl_empty_schema_agrees(spark, tmp_path):
    """Regression (ADVICE r5): with zero committed batches the reader
    used to return a placeholder `dummy string` frame whose schema
    differed from the inferred non-empty case, so downstream column
    selection broke only when the sink was empty. With a caller
    schema, the empty read must carry exactly that schema (and
    selecting sink columns must analyze); without one, it must be a
    zero-column empty frame, never a phantom `dummy` column."""
    from lambda_refarch_mapreduce_spark.sources.pyds import (
        read_committed_jsonl,
    )

    empty_sink = str(tmp_path / "never_written")
    ddl = "event_id long, user_id long, event_type string"
    df = read_committed_jsonl(spark, empty_sink, schema=ddl)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "event_id",
        "user_id",
        "event_type",
    ]
    df.select("event_id", "event_type")  # must analyze in the empty case
    bare = read_committed_jsonl(spark, empty_sink)
    assert bare.count() == 0 and bare.schema.fields == []
