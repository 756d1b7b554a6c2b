"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

All query definitions live in lambda_refarch_mapreduce_spark.plans.
catalog / catalog_llm — each entry is a (Spark program, DuckDB SQL)
pair registered in one place so tests, bench and this contract stay in
sync.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def _registry():
    # import here so a broken optional module never breaks the contract
    from lambda_refarch_mapreduce_spark.plans import (  # noqa: F401
        catalog,
        catalog_analytics,
        catalog_llm,
    )

    # Priority-ordered: the driver's correctness gate samples a prefix of
    # this dict, so entries without a round-1 driver row come first (see
    # catalog.DRIVER_WINDOW_FIRST).
    return catalog.ordered_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (AMPLab 2a shape — the reference's one shipped
    query, README.md:146) on /root/testdata/sf0.001."""
    reg = _registry()
    return reg["substr_groupby_sum"].spark(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: qd.oracle for name, qd in _registry().items() if qd.oracle is not None
    }
