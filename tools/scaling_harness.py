"""The ONE parameterized scaling harness (VERDICT r12 next-round #5).

Twelve rounds accreted 13 one-off ``tools/scaling_*.py`` scripts —
2,767 lines of copy-adapted argument parsing, fresh-JVM session setup,
MeasuredRun wrapping, replica-parquet builders and JSON-line output
around ~60 actual measurement variants. This module owns the shared
machinery once; the measurement variants live as registered CASES in
``tools/scaling_cases.py`` (one config entry per case — new rounds add
an entry, not a file). The per-round RESULT tables remain in
SCALING.md, which is the record; these cases exist so any row in that
record can be re-run.

Usage:
    python tools/scaling_harness.py --list
    python tools/scaling_harness.py CASE [case args...]

Conventions every case inherits (the lessons that used to be re-copied
into each script's docstring):
- ONE variant per process where the case is keyed (fresh JVM, UI on)
  so AQE exchange reuse and warm caches can't flatter later variants
  (the round-6 MeasuredRun lesson).
- Outputs are COLLECTED in full by default, not counted — a count()
  lets Catalyst prune the value columns and with them the computation
  itself (the round-9 attribution lesson). Cases that deliberately
  count (row-count IS the output, e.g. pair joins) say so.
- Replica inputs are WRITTEN ONCE as parquet and read back — plans
  estimated from parquet stats, not LocalRelation (in-memory frames
  defeat join-size estimation).
- The UI stays on so MeasuredRun reads per-stage shuffle bytes over
  REST: bytes are the cross-run adjudicator, walls drift with box
  load.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# case name -> (fn, extra_conf, help line). Populated by @case in
# tools/scaling_cases.py.
CASES: dict[str, tuple] = {}


def case(name: str, extra_conf: dict | None = None):
    """Register a measurement case: ``fn(spark, args: list[str]) ->
    dict | None``. The returned dict is printed as one JSON line
    (cases that print incrementally return None). ``extra_conf`` is
    applied at session build — per-case, pre-JVM, so regime pins
    (e.g. broadcast off for SMJ-curve cases) hold for the whole
    process."""

    def deco(fn):
        first = (fn.__doc__ or "").strip().splitlines()
        CASES[name] = (fn, extra_conf or {}, first[0] if first else "")
        return fn

    return deco


# ---------------------------------------------------------------------------
# Shared measurement
# ---------------------------------------------------------------------------

LAST_PLAN = ""


def measure(spark, df, mode: str = "collect") -> dict:
    """MeasuredRun wrapper: wall seconds, output rows, shuffle MB and
    stage count (when the UI REST reads land). Modes:

    - "collect" (default): collect the full result — every value
      column stays load-bearing.
    - "count": df.count() — only for cases where the row COUNT is the
      output and the value columns are the join keys themselves.
    - "count_self": count through the df's OWN QueryExecution so the
      AQE-final executed plan (skew=true markers) is observable in
      LAST_PLAN afterwards; df.count() would spawn a fresh execution.
    - "noop": write to the noop sink — full execution, no driver
      materialization (for outputs too wide/large to collect).
    """
    global LAST_PLAN
    from lambda_refarch_mapreduce_spark.metrics import MeasuredRun

    if mode == "count_self":
        counted = df.agg(F.count(F.lit(1)).alias("n"))
        with MeasuredRun(spark) as m:
            n = counted.collect()[0]["n"]
        LAST_PLAN = counted._jdf.queryExecution().executedPlan().toString()
    elif mode == "count":
        with MeasuredRun(spark) as m:
            n = df.count()
    elif mode == "noop":
        with MeasuredRun(spark) as m:
            df.write.format("noop").mode("overwrite").save()
        n = None
    else:
        with MeasuredRun(spark) as m:
            rows = df.collect()
        n = len(rows)
        LAST_PLAN = df._jdf.queryExecution().executedPlan().toString()
    out = {"wall_s": round(m.stats.wall_secs, 2), "out_rows": n}
    if m.stats.bytes_measured:
        out["shuffle_mb"] = round(m.stats.shuffle_bytes / 1e6, 2)
        out["n_stages"] = m.stats.extra.get("n_stages")
    return out


# ---------------------------------------------------------------------------
# Shared input builders
# ---------------------------------------------------------------------------


def write_once(df, path: str):
    """Materialize a replica input exactly once; return the path."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df.repartition(32).write.mode("overwrite").parquet(path)
    return path


def union_replicas(base, replicas: int, shift):
    """The replica-union loop every script re-implemented: ``shift(df,
    r)`` returns replica r's frame (shifted keys / salted tokens /
    identity for pure row growth)."""
    big = shift(base, 0)
    for r in range(1, replicas):
        big = big.unionByName(shift(base, r))
    return big


def replicated_parquet(spark, path: str, base, replicas: int, shift):
    """union_replicas + write_once + read-back."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_once(union_replicas(base, replicas, shift), path)
    return spark.read.parquet(path)


def load(spark, table: str):
    from lambda_refarch_mapreduce_spark import load_table

    return load_table(spark, SF_DIR, table)


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def main() -> None:
    # run as a script this file is __main__, but scaling_cases
    # registers into the ``tools.scaling_harness`` module instance —
    # read the registry from there, not from this namespace
    import tools.scaling_cases  # noqa: F401  (registers CASES)
    from tools import scaling_harness as H

    cases = H.CASES
    argv = sys.argv[1:]
    if not argv or argv[0] in ("--list", "-l"):
        for name, (_, conf, doc) in sorted(cases.items()):
            pin = " [conf-pinned]" if conf else ""
            print(f"{name:16s}{pin} {doc}")
        return
    name, args = argv[0], argv[1:]
    if name not in cases:
        raise SystemExit(
            f"unknown case {name!r}; run --list (cases live in "
            "tools/scaling_cases.py)"
        )
    fn, extra_conf, _ = cases[name]
    from lambda_refarch_mapreduce_spark import get_spark

    conf = {"spark.ui.enabled": "true", **extra_conf}
    spark = get_spark(f"scaling-{name}", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    row = fn(spark, args)
    if row is not None:
        print(json.dumps(row, sort_keys=True))


if __name__ == "__main__":
    main()
