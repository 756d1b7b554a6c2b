"""The primary correctness gate: every catalog query with an oracle
must hash-match DuckDB at sf0.01 — the same comparison the round
driver performs (SURVEY.md §5 differential/oracle strategy)."""

from __future__ import annotations

import pytest

from lambda_refarch_mapreduce_spark.plans import catalog, catalog_analytics, catalog_llm  # noqa: F401
from tests.conftest import SF_CORRECT, assert_matches_oracle

CASES = sorted(catalog.REGISTRY)


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(spark, duck, name):
    qd = catalog.REGISTRY[name]
    sdf = qd.spark(spark, SF_CORRECT)
    if qd.oracle is None:
        assert sdf.count() >= 0  # rows-only check
    else:
        assert_matches_oracle(sdf, duck, qd.oracle)

# r14 fast-tier: this module IS the oracle gate replica — the round
# gates run the same comparison via tools/check_oracle.py (sf0.01 full
# + GATE_SF01 at sf0.1), so the default (driver-window) pytest run
# skips it; `-m ""` restores it for the round-close full record.
pytestmark = pytest.mark.slow
