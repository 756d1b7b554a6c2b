"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a deterministic synthetic-document generator.

The reference hard-wires its input surface to S3 objects enumerated by
the driver (driver.py's bucket listing); Spark's pluggable DataSource
is the idiomatic replacement for "teach the engine a new input kind".
This one generates a synthetic corpus — the scale-testing input that
needs NO storage: a 100 TB corpus is 100 TB of generator output, not
100 TB of parquet, and every executor produces exactly its own slice.

Determinism contract: doc `i` is a pure function of (seed, i) via the
repo's portable md5-derived hash family, so the same options always
yield the same corpus — across runs, partition counts and engines —
and planted duplicates (``dup_every``) land at fixed ids. That makes
the source usable under the dedup/similarity test oracles, not just
for smoke load.

Registration is explicit (`register_synthetic_docs(spark)`) because
Python data sources are session-scoped.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_VOCAB = (
    "key agg row scan slow fast table value part hash merge batch query "
    "spark data shard sort join index block"
).split()


def _h(seed: int, *parts: int) -> int:
    """Portable deterministic 60-bit hash of (seed, parts)."""
    key = ":".join(str(p) for p in (seed, *parts))
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def synth_doc(seed: int, doc_id: int, n_tokens: int, dup_every: int) -> str:
    """Document text for one id. Ids at multiples of ``dup_every``
    (>0) replay the text of the previous multiple — planted exact
    duplicates at known positions."""
    if dup_every > 0 and doc_id % dup_every == 0 and doc_id >= dup_every:
        return synth_doc(seed, doc_id - dup_every, n_tokens, dup_every)
    return " ".join(
        _VOCAB[_h(seed, doc_id, j) % len(_VOCAB)] for j in range(n_tokens)
    )


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.tokens_per_doc = int(options.get("tokens_per_doc", 50))
        self.seed = int(options.get("seed", 0))
        self.dup_every = int(options.get("dup_every", 0))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        # contiguous id slices: partition p owns [lo, hi)
        p = partition.value
        per = -(-self.n_docs // self.n_partitions)  # ceil
        lo, hi = p * per, min((p + 1) * per, self.n_docs)
        for i in range(lo, hi):
            yield (
                i,
                synth_doc(self.seed, i, self.tokens_per_doc, self.dup_every),
                _VOCAB[_h(self.seed, i) % 5],
            )


class _SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming variant: an unbounded corpus arriving
    ``docs_per_batch`` ids at a time. Offsets are just the next doc id
    ({"next": N}) — replayable by construction, since doc i is a pure
    function of (seed, i): a restarted query re-reads EXACTLY the same
    documents for the same offset range, which is the property
    Structured Streaming's exactly-once contract needs from a source.
    """

    def __init__(self, options: dict) -> None:
        self.docs_per_batch = int(options.get("docs_per_batch", 100))
        self.tokens_per_doc = int(options.get("tokens_per_doc", 50))
        self.seed = int(options.get("seed", 0))
        self.dup_every = int(options.get("dup_every", 0))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        # a LIST, not a generator: the prefetch cache copy.copy()s the
        # returned iterator, and generators aren't copyable
        return [
            (
                i,
                synth_doc(self.seed, i, self.tokens_per_doc, self.dup_every),
                _VOCAB[_h(self.seed, i) % 5],
            )
            for i in range(lo, hi)
        ]

    def read(self, start: dict):
        end = {"next": start["next"] + self.docs_per_batch}
        return iter(self._rows(start["next"], end["next"])), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic replay for recovery — same rows, no state
        return iter(self._rows(start["next"], end["next"]))


class SyntheticDocsDataSource(DataSource):
    """format("synthetic_docs") — options: n_docs, n_partitions,
    tokens_per_doc, seed, dup_every (0 = no planted dups). Batch via
    reader(); streaming via simpleStreamReader() (docs_per_batch ids
    per micro-batch, replayable offsets)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, source string"

    def reader(self, schema) -> _SyntheticDocsReader:
        return _SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema) -> _SyntheticDocsStreamReader:
        return _SyntheticDocsStreamReader(self.options)


def register_synthetic_docs(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)


# ---------------------------------------------------------------------------
# Custom streaming SINK (DataSourceStreamWriter): manifest-committed JSONL
# ---------------------------------------------------------------------------
# The write-side twin of the stream reader above, completing the Spark-4
# Python DataSource surface (batch read / stream read / stream write).
# Protocol mirrors the repo's commit-log convention (streaming/corpus.py):
# executors stage one JSONL part per task under _staging/, the DRIVER
# commits the micro-batch by writing one manifest file LAST (write-temp +
# atomic rename), and readers consult only manifests — a crashed batch's
# staged parts are invisible, and commit() re-invoked for a replayed
# batch id simply overwrites the same manifest (idempotent). Local-fs
# oriented (the test surface); on an object store the manifest rename
# becomes a conditional put, everything else is safe as-is.


class _JsonlPartMeta(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int) -> None:
        self.path = path
        self.n_rows = n_rows


class _JsonlManifestStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict) -> None:
        if "path" not in options:
            raise ValueError("jsonl_manifest sink requires option 'path'")
        self.path = options["path"]

    def write(self, iterator):
        import json
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        part = os.path.join(staging, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(part, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _JsonlPartMeta(part, n)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        commits = os.path.join(self.path, "_commits")
        os.makedirs(commits, exist_ok=True)
        manifest = {
            "batch_id": batchId,
            "parts": [
                {"path": m.path, "rows": m.n_rows}
                for m in messages
                if m is not None and m.n_rows > 0
            ],
        }
        tmp = os.path.join(commits, f".batch-{batchId}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(commits, f"batch-{batchId}.json"))

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(m.path)
                except OSError:
                    pass


class JsonlManifestSink(DataSource):
    """writeStream.format("jsonl_manifest").option("path", dir)"""

    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def streamWriter(self, schema, overwrite: bool) -> _JsonlManifestStreamWriter:
        return _JsonlManifestStreamWriter(self.options)


def register_jsonl_manifest_sink(spark) -> None:
    spark.dataSource.register(JsonlManifestSink)


def read_committed_jsonl(spark, path: str, schema=None):
    """Read back ONLY manifest-committed rows of a jsonl_manifest sink
    (staged parts from uncommitted/aborted batches are invisible).

    Pass ``schema`` (DDL string or StructType) so the empty and
    non-empty cases agree: without it, zero committed batches used to
    return a placeholder single-column frame whose schema differed
    from the inferred non-empty one, breaking downstream column
    selection only in the empty case (ADVICE r5). With no schema and
    no committed parts, an empty zero-column frame is returned."""
    import glob
    import json
    import os

    parts: list[str] = []
    for mf in sorted(glob.glob(os.path.join(path, "_commits", "batch-*.json"))):
        with open(mf) as fh:
            parts.extend(p["path"] for p in json.load(fh)["parts"])
    if not parts:
        if schema is not None:
            return spark.createDataFrame([], schema)
        from pyspark.sql.types import StructType

        return spark.createDataFrame([], StructType([]))
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(parts)
