"""tools/bench_diff.py: the cross-round adjudicator's parsing and
classification logic — including the salvage path that recovers
shuffle-byte pairs from a truncated driver artifact (the
BENCH_r09.json shape), which the round-10 adjudication depends on."""

from __future__ import annotations

import io
import json
import os
import subprocess
import sys

TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "bench_diff.py",
)


def _run(*argv):
    return subprocess.run(
        [sys.executable, TOOL, *argv], capture_output=True, text=True
    )


def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


def test_classification_and_flag_forms(tmp_path):
    old = {
        "queries": {"q_a": 1.0, "q_b": 2.0, "q_c": 1.0, "q_gone": 1.0},
        "shuffle_bytes": {"q_a": 1000, "q_b": 1000000, "q_c": 500},
        "sf": "0.1",
    }
    new = {
        "queries": {"q_a": 2.0, "q_b": 2.001, "q_c": 1.0, "q_new": 0.5},
        # q_a identical bytes (drift despite +100% wall), q_b +0.05%
        # (range-jitter), q_c +10% (plan change)
        "shuffle_bytes": {"q_a": 1000, "q_b": 1000500, "q_c": 550},
        "sf": "0.1",
    }
    po, pn = _write(tmp_path, "o.json", old), _write(tmp_path, "n.json", new)
    for flags in (["--wall-flag", "500"], ["--wall-flag=500"]):
        r = _run(po, pn, *flags)
        assert r.returncode == 0, r.stderr
        out = r.stdout
        assert "1 byte-identical" in out
        assert "1 range-jitter" in out
        assert "1 plan/data changes" in out
        # plan changes are always printed even under a huge wall flag
        assert "q_c" in out and "PLAN/DATA-CHANGE" in out
        assert "removed keys: ['q_gone']" in out
        assert "added keys: ['q_new']" in out


def test_driver_wrapper_and_salvage(tmp_path):
    # a healthy driver wrapper parses via .parsed
    healthy = {
        "parsed": {
            "queries": {"q_a": 1.0},
            "shuffle_bytes": {"q_a": 1000},
        },
        "tail": "ignored",
    }
    # a truncated wrapper (parsed=null): the tail begins mid-pair —
    # the damaged first pair must NOT be salvaged, complete ones must
    tail = (
        '_x": 99, "q_a": 1000, "q_b": 77}, "stages": {"q_a": 3, '
        '"q_b": 4}, "trained": {}, "sf": "0.1"}\n'
    )
    maimed = {"n": 1, "parsed": None, "tail": tail}
    cur = {
        "queries": {"q_a": 1.5, "q_b": 0.5},
        "shuffle_bytes": {"q_a": 1000, "q_b": 80},
    }
    pm = _write(tmp_path, "m.json", maimed)
    ph = _write(tmp_path, "h.json", healthy)
    pc = _write(tmp_path, "c.json", cur)

    r = _run(pm, pc)
    assert r.returncode == 0, r.stderr
    # q_a byte-identical; q_b 77 -> 80 is a change; the truncated
    # "_x" fragment and the stages/trained pairs are not salvaged as
    # shuffle bytes
    assert "1 byte-identical" in r.stdout
    assert "1 plan/data changes" in r.stdout
    assert "_x" not in r.stdout

    r2 = _run(ph, pc)
    assert r2.returncode == 0, r2.stderr
    assert "1 byte-identical" in r2.stdout


def test_compact_summary_and_git_rev_loader(tmp_path):
    """Round-11 shapes: (a) a driver wrapper whose parsed payload is
    the COMPACT summary (top-5 + baseline walls only) still
    adjudicates on those surviving walls; (b) a `git:REV:PATH` side
    reads the committed detail file via `git show`, so cross-round
    byte adjudication needs no manual archaeology step."""
    wrapper = {
        "parsed": {
            "metric": "headline_queries_total",
            "value": 3.0,
            "n_keys": 40,
            "top": {"q_a": 2.0},
            "baseline": {"q1a_scan": 1.0},
            "sf": "0.1",
        },
        "tail": "ignored",
    }
    cur = {
        "queries": {"q_a": 2.0, "q1a_scan": 1.1},
        "shuffle_bytes": {"q_a": 10, "q1a_scan": 20},
    }
    pw = _write(tmp_path, "w.json", wrapper)
    pc = _write(tmp_path, "c.json", cur)
    r = _run(pw, pc, "--wall-flag", "5")
    assert r.returncode == 0, r.stderr
    assert "2 shared keys" in r.stdout
    assert "q1a_scan" in r.stdout  # +10% wall flagged (no bytes side)

    # rev loader against the real repo: the r10 round commit carries
    # BENCH_DETAIL.json; self-compare must be all byte-identical
    repo = os.path.dirname(TOOL)
    r2 = subprocess.run(
        [
            sys.executable,
            TOOL,
            "git:3d51180:BENCH_DETAIL.json",
            "git:3d51180:BENCH_DETAIL.json",
        ],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(repo),
    )
    assert r2.returncode == 0, r2.stderr
    assert "0 range-jitter, 0 plan/data changes" in r2.stdout


def test_bench_summary_line_contract():
    """r14 (VERDICT r13 #2): the FINAL summary line must carry the
    per-key walls (the driver's per-query/geomean/scaling comparison
    parses exactly that line — it was empty from r10-r13) AND stay
    inside the driver's ~2 kB durable stdout-tail window; plus the
    scan-floor canary must cover exactly the three BASELINE.md twins
    and fire on the r13 pollution fingerprint."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(TOOL)))
    import bench

    assert set(bench.SCAN_FLOOR) == {
        "q1a_scan", "q1b_scan_wide", "q2a_substr_agg"
    }
    assert set(bench.SCAN_FLOOR) <= set(bench.HEADLINE)

    # clean run (r14 entry record shape) does not fire; the r13 driver
    # incident (q1a 5.126 s on a byte-identical plan) does
    clean = {k: f for k, f in bench.SCAN_FLOOR.items()}
    assert not bench.check_scan_floor(clean)
    assert bench.check_scan_floor({**clean, "q1a_scan": 5.126})

    # the summary line with every headline key at a worst-plausible
    # 3-digit wall must fit the tail window with headroom
    timings = {k: 99.99 for k in bench.HEADLINE}
    summary = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "n_keys": len(timings),
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "load1": 9.99,
        "sf": "0.1",
        "load_warn": True,
        "scan_warn": True,
        "first_key_remeasured": True,
    }
    assert len(json.dumps(summary)) < 1950, len(json.dumps(summary))
