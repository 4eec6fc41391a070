"""Interleaved same-session A/B plan measurement (VERDICT r14 ask #8).

The only trustworthy perf evidence on these sandboxes is old-vs-new
run INTERLEAVED in one session (A,B,A,B,...), min-of-N, because
identical plans swing +/-20-40% between samples (OPTIMIZATION_r14.md
"box noise"); suite-total diffs and cross-session absolutes are not
attributable. This tool makes that method a citable artifact instead
of prose.

Usage:
    python tools/measure_ab.py SPEC.py [-n 3] [--sf DIR] [--out F.json]
        [--check]

SPEC.py must define ``VARIANTS``: an ordered dict/list of
``(name, fn)`` with ``fn(spark, sf_dir) -> DataFrame``. Rounds run in
variant order (A,B,...,A,B,...), each sample timed over the noop sink
(guide §1.4 — computes every column, discards the write), with the
session cache cleared after every sample so no variant warms another.
A warm-up pass at sf0.001 runs first so JVM/codegen startup never
lands in round 1 (still visible in the spreads if it does).

``--check`` additionally collects each variant's rows once (before
timing) and fails unless all variants return IDENTICAL sorted rows —
an A/B whose sides compute different things is not an optimization
measurement.

Output: one JSON line (and --out file) with per-variant sorted
samples, min, and the min-ratio of every variant vs the first.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_datatrader_spark.session import get_spark  # noqa: E402

WARMUP_SF = "/root/testdata/sf0.001"


def _load_variants(path: str):
    spec = importlib.util.spec_from_file_location("ab_spec", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    variants = mod.VARIANTS
    if isinstance(variants, dict):
        variants = list(variants.items())
    return list(variants)


def main() -> int:
    args = sys.argv[1:]
    spec_path, n, sf_dir, out_path, check = None, 3, None, None, False
    i = 0
    while i < len(args):
        a = args[i]
        if a == "-n":
            n = int(args[i + 1]); i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--out":
            out_path = args[i + 1]; i += 2
        elif a == "--check":
            check = True; i += 1
        else:
            spec_path = a; i += 1
    if spec_path is None:
        print(__doc__, file=sys.stderr)
        return 2
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR",
                                      "/root/testdata/sf0.1")
    variants = _load_variants(spec_path)
    spark = get_spark("measure-ab")
    load0 = round(os.getloadavg()[0], 2)

    # warm-up: every variant once at the smallest sf
    for name, fn in variants:
        fn(spark, WARMUP_SF).write.format("noop").mode(
            "overwrite").save()
        spark.catalog.clearCache()

    if check:
        rows0 = None
        for name, fn in variants:
            rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
            spark.catalog.clearCache()
            if rows0 is None:
                rows0 = rows
            elif rows != rows0:
                print(json.dumps({"error": "variant results differ",
                                  "variant": name,
                                  "n_rows": [len(rows0), len(rows)]}))
                return 1

    samples: dict[str, list[float]] = {name: [] for name, _ in variants}
    for _ in range(n):
        for name, fn in variants:
            spark.sparkContext.setJobDescription(f"ab:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            samples[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()

    base = variants[0][0]
    rec = {
        "spec": os.path.basename(spec_path),
        "sf_dir": sf_dir,
        "n": n,
        "interleaved": True,
        "checked_identical": check,
        "loadavg_1m_at_start": load0,
        "loadavg_1m_at_end": round(os.getloadavg()[0], 2),
        "samples": {k: sorted(v) for k, v in samples.items()},
        "min": {k: min(v) for k, v in samples.items()},
        "min_ratio_vs_first": {
            k: round(min(v) / min(samples[base]), 3)
            for k, v in samples.items()},
    }
    line = json.dumps(rec)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
