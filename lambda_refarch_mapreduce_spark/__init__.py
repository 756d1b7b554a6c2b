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

from lambda_refarch_mapreduce_spark.session import get_spark  # noqa: F401
