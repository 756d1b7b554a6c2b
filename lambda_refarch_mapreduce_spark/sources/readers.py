"""Sources (SURVEY.md §2.3 — reference operators O1..O6).

The reference's entire source stack is: list S3 objects under a prefix
(driver.py:92-94), GET each whole object (mapper.py:43-45), gunzip by
suffix (Node mapper.js:71-79), split lines (mapper.py:47), split commas
positionally (mapper.py:50), silently drop malformed rows but count all
lines (mapper.py:48-57).

Spark subsumes O1-O5 in its DataSource scan (path globs, codec
inference, line splitting, split planning); what this module adds is the
schema'd reader surface plus a faithful *drop-and-count* malformed-row
policy: the reference prints-and-drops bad rows while still counting
every raw line (mapper.py:48 increments before the try). We reproduce
that observably with PERMISSIVE + a corrupt-record column + an
``observe`` metric, instead of silently losing the information.

All readers return plain DataFrames — everything downstream is ordinary
Catalyst territory (predicate pushdown, column pruning reach the scan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# The driver-generated test tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

CORRUPT_COL = "_corrupt_record"


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan. Filter/column pushdown verified in tests via
    ``PushedFilters``/``ReadSchema`` in the formatted plan."""
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown properties as parquet (both
    go through the vectorized reader with predicate pushdown); offered
    because warehouse corpora are commonly ORC-resident."""
    return spark.read.orc(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    header: bool = False,
    drop_malformed: bool = True,
    required: list[str] | None = None,
    sep: str = ",",
) -> DataFrame:
    """Schema'd CSV reader matching the reference's parse semantics.

    - positional comma split (mapper.py:50) → explicit ``schema`` with
      named, typed columns; no inference in the data path (inference
      means an extra full scan at 100TB).
    - malformed rows dropped (mapper.py:48-57): DROPMALFORMED discards
      rows with parse failures AND rows with too few fields — the same
      set the reference's ``data[3]``/``float()`` try/except would
      drop (a short row raises IndexError, a bad number ValueError).
      PERMISSIVE+corrupt-column would *keep* short rows null-padded,
      which the reference does not. With ``drop_malformed=False`` the
      PERMISSIVE view (corrupt column included) is returned for
      inspection/counting — the Spark analog of the reference's
      S3-metadata ``linecount`` side channel (mapper.py:65-72) is
      ``raw_line_count`` + this view.
    - gzip/deflate handled transparently by codec inference (O4).
    """
    if not drop_malformed:
        full_schema = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
        )
        return spark.read.csv(
            path,
            schema=full_schema,
            header=header,
            sep=sep,
            mode="PERMISSIVE",
            columnNameOfCorruptRecord=CORRUPT_COL,
            enforceSchema=True,
        )
    df = spark.read.csv(
        path,
        schema=schema,
        header=header,
        sep=sep,
        mode="DROPMALFORMED",
        enforceSchema=True,
    )
    # DROPMALFORMED drops type-parse failures but *pads* short rows
    # with nulls; the reference's positional access (data[3],
    # mapper.py:54) would IndexError-drop those instead. ``required``
    # declares the columns the job consumes strictly — rows missing
    # any of them are dropped, restoring the reference semantics.
    if required:
        for c in required:
            df = df.filter(F.col(c).isNotNull())
    return df


def raw_line_count(spark: SparkSession, path: str) -> int:
    """Total raw lines including malformed ones — the reference counts
    every line before attempting the parse (mapper.py:48)."""
    return spark.read.text(path).count()


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    corrupt_col: str | None = None,
) -> DataFrame:
    """Schema'd JSONL reader. With ``corrupt_col`` set, malformed lines
    survive as rows whose other fields are NULL and whose
    ``corrupt_col`` carries the raw line (Spark PERMISSIVE mode) — the
    JSON twin of read_csv's drop-and-count malformed contract, letting
    pipelines quarantine bad records instead of silently losing them.
    The corrupt column must be declared in ``schema`` (Spark requires
    it present to populate it)."""
    reader = spark.read
    if corrupt_col is not None:
        if schema is None:
            raise ValueError("corrupt_col requires an explicit schema")
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Raw line source (reference O5 without the CSV parse).

    Codec inference by suffix is Hadoop-side and transparent: .gz,
    .deflate, .bz2 lines read identically to plain text (reference O4,
    README.md:131's gzip/deflate encodings — the reference only ever
    implemented gzip, and only in the Node mapper)."""
    return spark.read.text(path)


def read_sequencefile(
    spark: SparkSession,
    path: str,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Hadoop SequenceFile of (Text, Text) records as a 2-column
    DataFrame (reference README.md:131 lists SequenceFile among its
    dataset encodings; the reference never implemented a reader).

    The one sanctioned RDD seam in the engine: SequenceFile is an
    RDD-era container with no DataSource V2 implementation in Spark
    core, so the scan goes through ``sequenceFile`` and immediately
    re-enters DataFrame land — split planning and codec handling are
    Hadoop's, downstream pruning/pushdown are Catalyst's."""
    rdd = spark.sparkContext.sequenceFile(
        path, "org.apache.hadoop.io.Text", "org.apache.hadoop.io.Text"
    )
    schema = StructType(
        [StructField(key_col, StringType()), StructField(value_col, StringType())]
    )
    return spark.createDataFrame(rdd, schema)


# Columns written as parquet TIMESTAMP(NANOS) — Spark has no nanosecond
# timestamp type, so these are read as raw nanos (legacy.parquet.
# nanosAsLong) and truncated to microseconds, matching how DuckDB (and
# any microsecond-resolution engine) reads the same files.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated table from a scale-factor directory."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # runtime (non-static) SQL conf: safe to set even on a session the
    # harness created for us
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    dtypes = dict(df.dtypes)
    for col in _NANOS_TS_COLS.get(name, ()):
        if dtypes.get(col) == "bigint":
            # integer div (not float) — ns epoch values overflow the
            # 53-bit double mantissa
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
        elif dtypes.get(col) == "timestamp_ntz":
            # fixture variant with TIMESTAMP(MICROS, adjusted=false):
            # normalize to a UTC instant (session tz is pinned UTC, so
            # wall-clock values are unchanged). Streaming watermarks
            # require TIMESTAMP, not TIMESTAMP_NTZ.
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> list[str]:
    """Register every test table as a temp view so raw ``spark.sql``
    works against the same data the DataFrame API sees — the SQL entry
    point of the engine (the reference has none; queries are code,
    README.md:63-65). Returns the view names."""
    names = []
    for t in TABLES:
        name = f"{t}{suffix}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names
