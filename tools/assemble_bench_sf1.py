"""Assemble BENCH_sf1.json from two same-session-box bench runs
(VERDICT r5 ask #6 / r6 ask #5: a second scale point for the
2x-of-baseline gate, with per-query sf1/sf0.1 ratios so anything
super-linear in the 10x data step is visible in one read).

Usage:
    python bench.py > sf01.json
    SPARK_GRAFT_SF_DIR=.benchdata/sf1 python bench.py > sf1.json
    python tools/assemble_bench_sf1.py sf01.json sf1.json > BENCH_sf1.json

Ratios use the SAME-BOX sf0.1 run (not a historical BENCH_r0N.json) so
host drift cancels out of the ratio.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    sf01 = json.load(open(sys.argv[1]))
    sf1 = json.load(open(sys.argv[2]))
    # optional further sf1 replicates (VERDICT r11 ask #5): each is
    # summarized alongside its page-cache proxy so replicate
    # agreement/disagreement is attributable in the one record
    reps = [json.load(open(p)) for p in sys.argv[3:]]
    ratios = {
        n: round(sf1["queries"][n] / sf01["queries"][n], 2)
        for n in sf1["queries"] if sf01["queries"].get(n)
    }
    out = {
        "metric": "headline query suite wall-clock at sf1 "
                  "(10x scale-up of driver sf0.1)",
        "value": sf1["value"],
        "unit": "sec",
        # headline minus declared exact-semantics members (VERDICT r8
        # ask #5): the gate number for the plans a 100 TB user runs
        "scale_path_total": sf1.get("scale_path_total"),
        "exact_semantics_members": sf1.get("exact_semantics_members"),
        "queries": sf1["queries"],
        "spread": sf1.get("spread"),
        "sf": 1.0,
        "dataset": sf1["dataset"],
        "env": sf1["env"],
        "construction": (
            "sf1 = tools/make_sf1.py: deterministic 10x replication of "
            "the driver's sf0.1 tables with dense per-copy key offsets "
            "(join chains intact per copy), fixed dims unchanged, "
            "timestamps unchanged (10x traffic density), documents/"
            "embeddings replicated verbatim (10x exact duplication — "
            "deliberate dedup stress)"),
        "baseline_sf01": {
            "value": sf01["value"],
            "queries": sf01["queries"],
            "loadavg_1m_before": sf01["env"].get("loadavg_1m_before"),
            "loadavg_1m_after": sf01["env"].get("loadavg_1m_after"),
        },
        "ratio_sf1_over_sf01": ratios,
        "ratio_note": (
            "data is 10x; a ratio <= ~10 is at-or-below linear "
            "(fixed JVM/job overheads amortize, AQE coalesces), "
            ">> 10 flags super-linear work"),
        # page-cache proxy of THE sf1 run above (VERDICT r11 ask #5:
        # bench.py primes the cache with its fingerprint read and
        # records Cached around it, so replicate deltas attribute)
        "page_cache_kb": sf1.get("page_cache_kb"),
        "contended": sf1.get("contended"),
        "loadavg_1m_at_start": sf1.get("loadavg_1m_at_start"),
        "replicates": [{
            "value": r["value"],
            "scale_path_total": r.get("scale_path_total"),
            "queries": r["queries"],
            "page_cache_kb": r.get("page_cache_kb"),
            "contended": r.get("contended"),
            "loadavg_1m_at_start": r.get("loadavg_1m_at_start"),
            "foreign_jvms_at_start": r.get("foreign_jvms_at_start"),
        } for r in reps],
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
