"""Static tie-determinism gate (round-5 sweep, keep it closed).

A window ordered by event time alone is nondeterministic the moment two
rows share a timestamp — routine at 100 TB — so every tie-sensitive
window must order by (ts, event_id) on BOTH engines. This test greps
the query/operator sources for the hazard pattern the way the plan gate
walks plans: a new `ORDER BY ts)` / `.orderBy("ts")` fails here unless
it is an allowlisted RANGE-framed window (where ties are peers by
definition and a tiebreak would change semantics — and Spark's
rangeBetween only admits a single numeric sort key).
"""

from __future__ import annotations

import glob
import os
import re

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..",
                    "big_datatrader_spark")

# (file, regex that captures the allowed site) — RANGE-framed windows
# documented tie-safe; ties are frame peers on both engines.
ALLOWED = [
    ("queries/analytics.py",
     r'ORDER BY ts\s+RANGE BETWEEN INTERVAL 1 HOUR'),   # range_frame_hourly_avg
    ("queries/training_ops.py",
     r'max\(value\) OVER \(PARTITION BY user_id ORDER BY ts\)'),  # max_drawdown running peak (RANGE default, peers)
    ("queries/training_ops.py",
     r'Window\.partitionBy\("user_id"\)\.orderBy\("ts"\)\n    dd ='),  # max_drawdown Spark twin (default RANGE frame)
]

HAZARD = [
    re.compile(r'ORDER BY (ts|tus)\)'),
    re.compile(r'ORDER BY (ts|tus)\s*$', re.M),
    re.compile(r'\.orderBy\(\s*"(ts|tus)"\s*\)'),
]


def _sources():
    for sub in ("queries", "operators", "streaming"):
        yield from glob.glob(os.path.join(ROOT, sub, "*.py"))


def test_no_untiebroken_event_time_windows():
    offenders = []
    for path in _sources():
        rel = os.path.relpath(path, ROOT)
        src = open(path).read()
        allowed_spans = []
        for f, pat in ALLOWED:
            if rel == f:
                for m in re.finditer(pat, src):
                    allowed_spans.append((m.start(), m.end()))
        for hp in HAZARD:
            for m in hp.finditer(src):
                if any(a <= m.start() < b for a, b in allowed_spans):
                    continue
                line = src[:m.start()].count("\n") + 1
                offenders.append(f"{rel}:{line}: {m.group(0)!r}")
    assert not offenders, (
        "event-time window without (ts, event_id) tiebreak — "
        "nondeterministic under timestamp ties:\n" + "\n".join(offenders))


def test_allowlist_entries_still_exist():
    """An allowlist row whose pattern no longer matches is stale."""
    for f, pat in ALLOWED:
        src = open(os.path.join(ROOT, f)).read()
        assert re.search(pat, src), (f, pat)


def test_max_by_over_event_time_is_gone():
    """Per-group extrema keyed by a timestamp must use lexicographic
    struct min/max (max_by(ts) picks an arbitrary tied row and the two
    engines need not agree). Strictly-increasing stream counters are
    exempt (n_events)."""
    pat = re.compile(r'(max_by|min_by|arg_max|arg_min)\s*\(\s*[\w."]+\s*,'
                     r'\s*(F\.col\(\s*)?"?(ts|tus)"?\s*\)?\s*\)')
    offenders = []
    for path in _sources():
        src = open(path).read()
        for m in pat.finditer(src):
            line = src[:m.start()].count("\n") + 1
            offenders.append(
                f"{os.path.relpath(path, ROOT)}:{line}: {m.group(0)!r}")
    assert not offenders, "\n".join(offenders)
