"""PySpark-native analytics engine with the capabilities of
awslabs/lambda-refarch-mapreduce, rebuilt Spark-first.

The reference (/root/reference) is a serverless MapReduce framework:
driver → Lambda mappers (scan + partial agg) → S3-event-driven recursive
reducer tree (merge agg). See SURVEY.md. Here that whole control plane
collapses into Spark's DAG scheduler + hash shuffle; what we expose is:

- ``session``    — SparkSession factory with 100TB-safe defaults (M0)
- ``sources``    — schema'd CSV/JSON/Parquet/text readers with the
                   reference's drop-and-count malformed-row policy
- ``plans``      — declarative JobSpec (the reference's "edit the
                   mapper zip" UX, made declarative)
- ``operators``  — relational + LLM-data-pipeline operator library
- ``functions``  — scalar function catalog (portable, oracle-checked)
- ``streaming``  — Structured Streaming analog of the reference's
                   S3-event incremental-reduce pattern
- ``metrics``    — job stats + cost model (reference driver.py:216-279)
"""

__version__ = "0.1.0"

from lambda_refarch_mapreduce_spark.session import cluster_conf, get_spark  # noqa: F401
from lambda_refarch_mapreduce_spark.partitioning import (  # noqa: F401
    ensure_parallelism,
    salted_agg,
)
from lambda_refarch_mapreduce_spark.plans.jobspec import (  # noqa: F401
    JobSpec,
    build,
    run_jobspec,
)
from lambda_refarch_mapreduce_spark.operators import (  # noqa: F401
    dedup,
    multimodal,
    relational,
    similarity,
    text,
)
from lambda_refarch_mapreduce_spark.operators.relational import (  # noqa: F401
    pin_scope,
)
from lambda_refarch_mapreduce_spark.functions.scalar import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
    substr_key,
    tokenize,
    word_ngrams,
)
from lambda_refarch_mapreduce_spark.sources.readers import (  # noqa: F401
    TABLES,
    load_table,
    read_csv,
    read_json,
    read_parquet,
    read_text,
    register_views,
)
from lambda_refarch_mapreduce_spark.sources.sinks import (  # noqa: F401
    read_manifest,
    write_bucketed,
    write_with_manifest,
)
from lambda_refarch_mapreduce_spark.streaming.events import (  # noqa: F401
    incremental_sum,
    read_event_stream,
    stream_to_parquet,
    windowed_agg,
)
