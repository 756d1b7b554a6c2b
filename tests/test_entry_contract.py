"""Driver-contract invariants for __spark_entry__.py: the exact
surface the round driver consumes (entry smoke, queries/oracle_sql key
consistency, stable schema)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # rows-only entries are the documented exceptions, never the norm
    rows_only = set(qs) - set(oracles)
    assert len(rows_only) <= max(3, len(qs) // 10), sorted(rows_only)


def test_entry_runs_and_has_stable_schema(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert [f.name for f in df.schema.fields] == ["src", "sum_rev"]


def test_every_query_is_callable_with_sf_dir(spark):
    qs = entrymod.queries()
    assert len(qs) >= 70
    # spot-build (no execution) a sample across both catalogs: the
    # callables must produce analyzable plans, not raise at build time
    for name in ("scan_filter_project", "dedup_minhash_lsh", "similarity_ivf_topk"):
        df = qs[name](spark, "/root/testdata/sf0.001")
        _ = df.schema  # forces analysis
