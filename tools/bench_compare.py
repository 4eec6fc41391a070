"""Diff two bench records and classify the drift.

Usage: python tools/bench_compare.py BENCH_r06.json BENCH_r07.json

Accepts either the raw one-line bench.py output or the driver's
BENCH_r{N}.json wrapper ({"tail": "...last line is the JSON..."}).
For each query: delta, and — when both records carry the round-7
`spread` field — whether the two [min..max] ranges overlap (overlap =
host noise can explain it; disjoint = a real change). Environment
deltas (dataset md5, cpus, loadavg) are printed first since they
explain drift wholesale.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """Load a bench record; when handed a CONTENDED driver record
    (BENCH_r{N}.json whose parsed/tail says contended) and a gated
    first-class sibling BENCH_uncontended_r{N}.json exists next to
    it, prefer the sibling (VERDICT r13 ask #3: the round-over-round
    perf story must rest on gated records, not prose)."""
    import os
    import re
    m = re.match(r"^BENCH_r(\d+)\.json$", os.path.basename(path))
    if m:
        sib = os.path.join(os.path.dirname(path) or ".",
                           f"BENCH_uncontended_r{int(m.group(1))}.json")
        if os.path.exists(sib):
            rec = _load_raw(path)
            if rec.get("contended"):
                sib_rec = _load_raw(sib)
                if not sib_rec.get("contended"):
                    print(f"# {os.path.basename(path)} is contended; "
                          f"using gated {os.path.basename(sib)}")
                    return sib_rec
            return rec
    return _load_raw(path)


def _load_raw(path: str) -> dict:
    rec = json.load(open(path))
    if "queries" in rec:
        return rec
    # driver wrapper: prefer the pre-parsed record; the tail can be
    # TRUNCATED mid-line (observed BENCH_r12.json), so scanning for
    # the last parseable JSON line is the fallback, not the default
    if isinstance(rec.get("parsed"), dict) and "queries" in rec["parsed"]:
        return rec["parsed"]
    for line in reversed(rec.get("tail", "").strip().splitlines()):
        try:
            cand = json.loads(line)
        except ValueError:
            continue
        if isinstance(cand, dict) and "queries" in cand:
            return cand
    raise SystemExit(f"{path}: no bench record found (truncated tail, "
                     f"no parsed field)")


def main() -> int:
    a, b = load(sys.argv[1]), load(sys.argv[2])
    ea, eb = a.get("env", {}), b.get("env", {})
    da, db = a.get("dataset", {}), b.get("dataset", {})
    print(f"total: {a['value']:.3f}s -> {b['value']:.3f}s "
          f"({(b['value'] / a['value'] - 1) * 100:+.1f}%)")
    same_data = da.get("content_md5") == db.get("content_md5")
    print(f"dataset md5 {'identical' if same_data else 'DIFFERS'}; "
          f"cpus {ea.get('cpus')}->{eb.get('cpus')}; "
          f"loadavg_1m {ea.get('loadavg_1m_before', '?')}/"
          f"{ea.get('loadavg_1m_after', '?')} -> "
          f"{eb.get('loadavg_1m_before', '?')}/"
          f"{eb.get('loadavg_1m_after', '?')}")
    print()
    rows = []
    for n in sorted(set(a["queries"]) | set(b["queries"])):
        va, vb = a["queries"].get(n), b["queries"].get(n)
        if va is None or vb is None:
            rows.append((0.0, f"{n:35s} "
                         f"{'added' if va is None else 'removed'}"))
            continue
        pct = (vb / va - 1) * 100
        verdict = ""
        sa = (a.get("spread") or {}).get(n)
        sb = (b.get("spread") or {}).get(n)
        if sa and sb:
            overlap = sa[0] <= sb[-1] and sb[0] <= sa[-1]
            verdict = ("spread-overlap (noise-compatible)" if overlap
                       else "DISJOINT SPREADS (real change)")
        rows.append((abs(pct),
                     f"{n:35s} {va:7.3f} -> {vb:7.3f} ({pct:+6.1f}%) "
                     f"{verdict}"))
    for _, line in sorted(rows, reverse=True):
        print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
