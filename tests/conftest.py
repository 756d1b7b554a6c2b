"""Shared fixtures: one SparkSession per test session, a DuckDB
connection with the testdata views, and the oracle-comparison helper
mirroring the driver's gate (rowcount + columns + canonical multiset).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lambda_refarch_mapreduce_spark import get_spark  # noqa: E402
from lambda_refarch_mapreduce_spark.sources.readers import TABLES  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("engine-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_CORRECT}/{t}.parquet'"
        )
    yield con
    con.close()


def formatted_plan(df) -> str:
    """The formatted physical plan via the PUBLIC explain API (ADVICE
    r13: the private ``_jvm.PythonSQLUtils.explainString``/``_jdf``
    hooks shift across PySpark versions/connect mode; capturing
    ``df.explain(mode="formatted")``'s stdout is the one supported
    spelling, centralized here so a version bump needs one fix)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def assert_matches_oracle(sdf, duck, sql: str):
    """Driver-gate replica: Spark DataFrame vs DuckDB SQL result."""
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    ores = duck.sql(sql)
    orows = ores.fetchall()
    ocols = [d[0] for d in ores.description]
    assert sorted(scols) == sorted(ocols), f"columns {scols} vs {ocols}"
    assert len(srows) == len(orows), f"rowcount {len(srows)} vs {len(orows)}"
    cs, co = canon(srows, scols), canon(orows, ocols)
    mismatches = [(a, b) for a, b in zip(cs, co) if a != b][:5]
    assert cs == co, f"value mismatch, first diffs: {mismatches}"


# ---------------------------------------------------------------------------
# Fast test tier (r14, VERDICT r13 next-round #3). The driver's
# verification window could no longer fit the full suite (~73 min at
# r13 close; VERIFY truncated at ~64% with zero failures). Tests whose
# measured wall exceeded ~10 s in the r14 durations record
# (/tmp-captured `--durations=60` run, committed in OPTIMIZATION_r14.md)
# are marked `slow` here by NAME — one auditable list instead of 60
# scattered decorators — on top of the module-level marks on the
# oracle-replica and hypothesis suites. Every slow test still runs at
# round close via `-m ""` (the full-suite record), and the heaviest
# entries are equivalence/bruteforce sweeps whose subject matter the
# standing oracle gates (sf0.01 full, sf0.1 full, SKEW, SF1 spot)
# exercise through their own channels each round.
# ---------------------------------------------------------------------------
SLOW_TESTS = {
    "test_ann_forget_vectors_deletion_propagation",
    "test_ann_retrain_swap_search_equivalence",
    "test_broadcast_codebook_strategy_no_literal_blowup",
    "test_cliffs_delta_matches_bruteforce_and_mw",
    "test_cochran_q_matches_reference_and_mcnemar",
    "test_cochran_q_property_matches_bruteforce",
    "test_collapse_exact_pair_parity",
    "test_dedup_operators_on_empty_and_short_docs",
    "test_every_entry_output_schema_is_driver_canonicalizable",
    "test_friedman_matches_references_and_degenerates",
    "test_friedman_property_matches_bruteforce",
    "test_fuzzy_self_join_equals_bruteforce",
    "test_g_test_matches_reference_and_mi_bridge",
    "test_g_test_property_matches_bruteforce_and_mi",
    "test_gehan_wilcoxon_matches_bruteforce_and_crossing",
    "test_geo_radius_join_equals_bruteforce",
    "test_geo_two_table_radius_join_equals_bruteforce",
    "test_ingest_dedup_stream_drops_cross_batch_dups",
    "test_ingest_dedup_stream_partial_attempt_overwritten",
    "test_ingest_dedup_stream_replay_is_idempotent",
    "test_ingest_dedup_stream_restart_no_reappend",
    "test_isotonic_fit_matches_pava_reference",
    "test_isotonic_property_pava_equal",
    "test_jonckheere_property_matches_bruteforce",
    "test_jonckheere_terpstra_matches_bruteforce_and_mw",
    "test_ks_from_value_counts_equals_bruteforce_cdf",
    "test_kuiper_and_cvm_match_bruteforce_and_mc_criticals",
    "test_ljung_box_matches_sequential_and_degenerates",
    "test_ljung_box_property_matches_bruteforce",
    "test_mmr_rerank_matches_python_greedy",
    "test_monitor_readouts_serve_before_first_commit",
    "test_mood_median_property_matches_bruteforce",
    "test_new_ops_on_empty_input",
    "test_page_l_matches_reference_and_permutation_null",
    "test_page_l_property_matches_bruteforce",
    "test_pagerank_equals_reference",
    "test_percentile_sketch_gate_exact_matches_sorted_list",
    "test_rank_stat_structural_invariances",
    "test_registry_wide_no_cartesian_product",
    "test_round8_kernel_invariances",
    "test_runs_test_matches_bruteforce_and_patterns",
    "test_runs_test_property_matches_bruteforce",
    "test_seasonal_mk_property_matches_bruteforce",
    "test_stats_test_clause_round11b_modes_match_kernels",
    "test_stream_mv_maintenance_matches_full_recompute",
    "test_streaming_ab_monitor_matches_batch_entry",
    "test_streaming_ann_index_matches_batch_ivfadc",
    "test_streaming_bloom_merge_and_no_false_negatives",
    "test_streaming_countmin_merge_equals_batch_sketch",
    "test_streaming_kgroup_epoch_guard_raises_on_fresh_checkpoint",
    "test_streaming_kgroup_monitor_matches_batch_kernels",
    "test_streaming_sketch_epoch_guard_and_restart_readouts",
    "test_streaming_sprt_epoch_guard_and_restart_readouts",
    "test_streaming_sprt_monitor_matches_batch_entry",
    "test_streaming_survival_epoch_guard_raises_on_fresh_checkpoint",
    "test_streaming_survival_monitor_matches_batch_kernels",
    "test_table_diff_and_mmr_edge_guards",
    "test_triangle_stats_equals_bruteforce",
    "test_watermark_drops_late_rows_after_eviction",
    "test_wilcoxon_signed_rank_property_matches_bruteforce",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
