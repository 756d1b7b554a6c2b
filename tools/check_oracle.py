"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over
the same sf dir, compares row count, column names and an order-
insensitive value multiset (columns sorted by name, rows sorted,
floats rounded to 9 significant-ish decimals before hashing).

Usage: python tools/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

--json writes a machine-readable per-entry record in the driver's
CORRECTNESS shape ({name: {rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err}}) — the standing round-closing artifact
for the full sf0.1 gate (GATE_SF01_r{N}.json, VERDICT r12 next-round
#1: that gate caught the only two real wrong answers in six rounds,
both invisible at sf0.01 by construction, and deserves a record a
judge can diff).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import duckdb

# repo root from this file, not a hardcoded checkout path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon_cell(v):
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
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    record: dict[str, dict] = {}

    import __spark_entry__ as mod
    from lambda_refarch_mapreduce_spark import get_spark
    from lambda_refarch_mapreduce_spark.operators.relational import pin_scope

    spark = get_spark()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        # driver sf dirs hold single parquet FILES; generated tiers
        # (tools/make_sf1.py) hold Spark-written DIRECTORIES — glob
        # the part files in that case
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    qs = mod.queries()
    oracles = mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            # scope the two-phase kernels' materialization pins to this
            # entry: a 315-entry gate run would otherwise accumulate one
            # CacheManager entry per prefix_sums/global_rank invocation
            with pin_scope():
                sdf = fn(spark, sf_dir)
                srows = sdf.collect()
                scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            record[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"spark error: {type(e).__name__}: {e}",
            }
            n_fail += 1
            continue
        spark_secs = time.monotonic() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({spark_secs:.1f}s)")
            record[name] = {
                "rows_match": None,
                "schema_match": None,
                "hash_match": None,
                "spark_rows": len(srows),
                "oracle_rows": None,
                "err": None,
            }
            continue
        t1 = time.monotonic()
        try:
            ores = con.sql(oracles[name])
            orows = ores.fetchall()
            ocols = [d[0] for d in ores.description]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            record[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": len(srows),
                "oracle_rows": None,
                "err": f"duckdb error: {type(e).__name__}: {e}",
            }
            n_fail += 1
            continue
        problems = []
        rows_match = len(srows) == len(orows)
        schema_match = sorted(scols) == sorted(ocols)
        hash_match = False
        if not rows_match:
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if not schema_match:
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(ocols)}")
        if not problems:
            cs = canon([tuple(r) for r in srows], scols)
            co = canon(orows, ocols)
            hash_match = cs == co
            if not hash_match:
                diff = [
                    (a, b) for a, b in zip(cs, co) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diff}")
        record[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "err": "; ".join(problems) or None,
        }
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            # oracle time covers duckdb + the canon hashing — slow
            # oracles dominated untimed gate wall before this was
            # printed (geo_nearest's O(n^2) <> join hid ~45 min)
            oracle_secs = time.monotonic() - t1
            print(
                f"PASS {name}: {len(srows)} rows "
                f"({spark_secs:.1f}s spark, {oracle_secs:.1f}s oracle)"
            )
            n_pass += 1
    if json_out:
        with open(json_out, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(record)} entries)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
