"""Mechanical cross-round bench adjudication (the VERDICT r8 #1
follow-through): compare two bench JSON lines and classify every
wall-time delta using the shuffle-byte evidence.

Rules (BENCH_NOTES round-9):
- bytes equal -> any wall delta is BOX DRIFT (the plan and data are
  identical; wall variance on this machine is up to 6x under
  co-tenant load).
- bytes within ±0.1% -> RANGE-JITTER (range-partitioned plans sample
  their partition bounds per session; compressed shuffle size moves
  at the fourth decimal).
- bytes moved more than that -> PLAN/DATA CHANGE — the delta is real
  and needs a BENCH_NOTES entry.

Usage: python tools/bench_diff.py OLD.json NEW.json [--wall-flag PCT]
Accepts either a raw bench line or a driver BENCH_r*.json wrapper
(reads .parsed). A side may also be `git:REV:PATH` (e.g.
`git:HEAD~1:BENCH_DETAIL.json`), read via `git show` — since round 10
BENCH_DETAIL.json is a single mutable file overwritten by every bench
run but committed once per round, so cross-round byte adjudication is
one command with no manual `git show` step (VERDICT r10 #2):

    python tools/bench_diff.py git:<r10-commit>:BENCH_DETAIL.json \\
        BENCH_DETAIL.json

Prints one line per key whose wall moved more than --wall-flag
percent (default 25), plus a summary.
"""

from __future__ import annotations

import json
import subprocess
import sys


def _load(path: str) -> dict:
    if path.startswith("git:"):
        # git:REV:PATH -> `git show REV:PATH` (PATH may not contain
        # ':'; REV may — split from the RIGHT)
        rev_path = path[4:]
        rev, _, rel = rev_path.rpartition(":")
        d = json.loads(
            subprocess.run(
                ["git", "show", f"{rev}:{rel}"],
                check=True,
                capture_output=True,
                text=True,
            ).stdout
        )
    else:
        with open(path) as f:
            d = json.load(f)
    if "parsed" in d and "queries" not in d:
        parsed = d["parsed"]
        if parsed is None:
            # SALVAGE: the driver keeps only a bounded TAIL of
            # bench.py's stdout; a pre-round-10 single-line payload
            # that outgrew it has parsed=null with the tail starting
            # mid-shuffle_bytes (BENCH_r09.json). Walls are gone, but
            # the surviving shuffle-byte pairs BEFORE the "stages"
            # marker are exactly the deterministic half of the
            # adjudication — recover them so the cross-round byte
            # comparison still runs as one command.
            return {"queries": {}, "shuffle_bytes": _salvage(d)}
        d = parsed
    if "queries" not in d and ("top" in d or "baseline" in d):
        # round-11+ compact summary: per-key walls live only in
        # BENCH_DETAIL.json; the summary's top-5 + baseline walls are
        # still honest per-key numbers, so adjudicate what survives
        # and point at the detail file for full coverage
        d = dict(d, queries={**d.get("baseline", {}), **d.get("top", {})})
    return d


def _salvage(wrapper: dict) -> dict:
    import re

    tail = wrapper.get("tail", "") or ""
    cut = tail.find('"stages"')
    frag = tail[:cut] if cut >= 0 else tail
    # every match is a complete pair: truncation cuts the START of
    # the line, so a damaged first pair loses its opening quote (or
    # part of its key) and simply fails the pattern
    pairs = re.findall(r'"(q[a-z0-9_]+)": (\d+)', frag)
    return {k: int(v) for k, v in pairs}


def main() -> None:
    # accept both `--wall-flag=PCT` and `--wall-flag PCT` (the bare
    # form used to crash: the positional filter kept the PCT token as
    # a file path while the split-on-'=' hit IndexError — ADVICE r9)
    argv = sys.argv[1:]
    args: list[str] = []
    flag_pct = 25.0
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--wall-flag":
            flag_pct = float(argv[i + 1])
            i += 2
        elif a.startswith("--wall-flag="):
            flag_pct = float(a.split("=", 1)[1])
            i += 1
        else:
            args.append(a)
            i += 1
    old, new = _load(args[0]), _load(args[1])
    oq, nq = old["queries"], new["queries"]
    ob = old.get("shuffle_bytes") or {}
    nb = new.get("shuffle_bytes") or {}
    # walls when both sides have them; a salvaged side (walls lost to
    # the driver tail window) still adjudicates on bytes alone
    shared = sorted((set(oq) | set(ob)) & (set(nq) | set(nb)))
    drift, jitter, changed, flagged = 0, 0, 0, []
    for k in shared:
        w0, w1 = oq.get(k, 0.0), nq.get(k, 0.0)
        b0, b1 = ob.get(k), nb.get(k)
        if b0 is None or b1 is None:
            verdict = "no-bytes"
        elif b0 == b1:
            verdict = "box-drift"
            drift += 1
        elif b0 and abs(b1 - b0) / max(b0, 1) <= 0.001:
            verdict = "range-jitter"
            jitter += 1
        else:
            verdict = "PLAN/DATA-CHANGE"
            changed += 1
        dw = (w1 - w0) / w0 * 100 if w0 else 0.0
        if abs(dw) >= flag_pct or verdict == "PLAN/DATA-CHANGE":
            flagged.append((k, w0, w1, dw, b0, b1, verdict))
    for k, w0, w1, dw, b0, b1, verdict in sorted(
        flagged, key=lambda r: -abs(r[3])
    ):
        print(
            f"{k:24s} wall {w0:7.3f} -> {w1:7.3f} ({dw:+6.1f}%)  "
            f"bytes {b0} -> {b1}  [{verdict}]"
        )
    only_old = sorted((set(oq) | set(ob)) - set(nq) - set(nb))
    # mirror only_old: a salvaged NEW side (walls lost, bytes
    # recovered) must still report byte-only keys as added (ADVICE r10)
    only_new = sorted((set(nq) | set(nb)) - set(oq) - set(ob))
    print(
        f"\n{len(shared)} shared keys: {drift} byte-identical (box "
        f"drift), {jitter} range-jitter, {changed} plan/data changes; "
        f"shared-total {sum(oq.get(k, 0.0) for k in shared):.2f} -> "
        f"{sum(nq.get(k, 0.0) for k in shared):.2f} s"
    )
    if only_old:
        print(f"removed keys: {only_old}")
    if only_new:
        print(f"added keys: {only_new}")


if __name__ == "__main__":
    main()
