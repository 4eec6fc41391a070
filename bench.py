"""Benchmark harness (driver contract + reference X5, main.py:590-619).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timed region: full query wall-clock (plan build -> action complete),
stated explicitly because the reference timed only its share computation
(main.py:472-475; SURVEY.md §6). Each query's action is a count-ish
materialization of the full result (collect on small results).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_datatrader_spark.queries import load_registry  # noqa: E402
from big_datatrader_spark.session import get_spark  # noqa: E402


def dataset_fingerprint(sf_dir: str) -> dict:
    """Identify the exact input data the timings were taken against
    (VERDICT r4: a +27% drift on scan-heavy queries could not be
    attributed to regenerated testdata vs box state because BENCH
    recorded neither). Per table: footer row count (no data read) and
    on-disk bytes; plus one md5 over every parquet file's bytes so two
    BENCH records are comparable with a single diff."""
    import pyarrow.parquet as pq

    tables: dict[str, dict] = {}
    digest = hashlib.md5()
    for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        files = ([path] if os.path.isfile(path) else
                 sorted(glob.glob(os.path.join(path, "*.parquet"))))
        rows = n_bytes = 0
        for f in files:
            rows += pq.ParquetFile(f).metadata.num_rows
            n_bytes += os.path.getsize(f)
            with open(f, "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    digest.update(chunk)
        name = os.path.basename(path).replace(".parquet", "")
        tables[name] = {"rows": rows, "bytes": n_bytes}
    return {"tables": tables, "content_md5": digest.hexdigest()}


# External contention gate (VERDICT r10 ask #3): a recording that
# STARTS above this 1-min loadavg is flagged contended — BENCH_r10's
# +29% suite drift was recorded at 4.32 and dissolved into "host
# drift" because nothing in the record said so. Measured at process
# entry, before any Spark work, so the number is external load, not
# our own executors (which push a 32-core box past 10 during sf1).
LOADAVG_CONTENTION_THRESHOLD = 2.5


def _meminfo_cached_kb() -> int | None:
    """Page-cache proxy (VERDICT r11 ask #5): two equally-idle sf1
    replicates differed 9.6% total / 58% on hits with page-cache state
    the named-but-unmeasured suspect. Recorded at start, after the
    priming read, and after the suite, so replicate disagreement is
    attributable to cache state instead of remaining 'host drift'."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("Cached:"):
                    return int(line.split()[1])
    except OSError:
        return None
    return None


def _foreign_jvms() -> int:
    """JVMs already running when bench starts (ours doesn't exist yet
    — get_spark is called after this). Round-12 incident: a bench run
    recorded 65.0s with hits at 15.2s on a loadavg-0.62 box; the
    culprit was an orphaned executor JVM from a killed prior run,
    invisible to the loadavg-at-start gate because its load had
    decayed while its threads still woke for work. One foreign JVM at
    start now flags the record contended regardless of loadavg."""
    import glob as _glob

    n = 0
    for p in _glob.glob("/proc/[0-9]*/comm"):
        try:
            with open(p) as fh:
                if fh.read().strip() == "java":
                    n += 1
        except OSError:
            pass
    return n


def main():
    load_at_start = os.getloadavg()[0]
    foreign_jvms = _foreign_jvms()
    cached_at_start = _meminfo_cached_kb()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    reg = load_registry()
    names = sorted(n for n, q in reg.items() if q.bench)

    # dataset fingerprint FIRST (it reads every parquet byte for the
    # md5), so it doubles as a DETERMINISTIC page-cache priming pass:
    # every replicate enters the timed region with the inputs warm by
    # construction instead of inheriting whatever the previous process
    # left resident (VERDICT r11 ask #5 — the fixed pre-suite priming
    # read, for free, since the fingerprint already existed)
    dataset = dataset_fingerprint(sf_dir)
    cached_after_prime = _meminfo_cached_kb()

    spark = get_spark("bdt-bench")

    # one warm-up pass on the smallest SF so JVM/codegen/Python-worker
    # startup doesn't pollute per-query numbers. A query that errors is
    # recorded and skipped rather than erasing the whole record: the
    # round's bench evidence must survive a single regression.
    errors: dict[str, str] = {}
    for n in names:
        try:
            reg[n].spark_fn(spark, "/root/testdata/sf0.001"
                            ).write.format("noop").mode(
                                "overwrite").save()
        except Exception as ex:  # noqa: BLE001
            errors[n] = repr(ex)[:300]

    # best-of-3 per query: single local runs carry multi-second GC/
    # scheduler noise (round-over-round variance on sub-second queries
    # measured at +/-40% with best-of-2); the min is the steady-state
    # cost of the plan. The full spread is recorded so a drifted round
    # is classifiable as host noise vs plan change in one diff
    # (VERDICT r6 ask #6: +7.7% with identical fingerprints was
    # unattributable because BENCH kept only the min).
    load_before = os.getloadavg()[0]
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    # 1-min loadavg at each query's first sample: self-load dominates
    # mid-suite, but a per-query spike still classifies WHICH members
    # ran through it when a round's delta needs attribution
    query_load: dict[str, float] = {}
    for n in names:
        if n in errors:
            continue
        samples = []
        query_load[n] = round(os.getloadavg()[0], 2)
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                reg[n].spark_fn(spark, sf_dir).write.format(
                    "noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            timings[n] = round(min(samples), 3)
            runs[n] = sorted(round(s, 3) for s in samples)
        except Exception as ex:  # noqa: BLE001
            errors[n] = repr(ex)[:300]
        # queries cache intermediates scoped to their own run (edge
        # lists, value-domain counts); release them so caches never
        # accumulate across the suite in this one-JVM session —
        # the 100 TB cluster discipline (VERDICT r6 ask #4)
        spark.catalog.clearCache()

    # Scale-path subtotal (VERDICT r8 ask #5): the headline keeps its
    # declared exact-semantics members (super-linear BY CONSTRUCTION,
    # each with a registered scale-safe twin), but the gate number a
    # 100 TB user cares about excludes them — report both, drop none.
    exact_members = sorted(
        n for n in timings if "exact_semantics" in reg[n].tags)
    print(json.dumps({
        "metric": "headline query suite wall-clock at sf" + sf,
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        # headline minus declared exact-semantics variants — the
        # plans one would actually run at 100 TB
        "scale_path_total": round(
            sum(v for n, v in timings.items()
                if n not in exact_members), 3),
        "exact_semantics_members": exact_members,
        "queries": timings,
        # non-empty ONLY if a query errored (it is then absent from
        # queries/value — a partial record, flagged by exit code 1)
        "errors": errors,
        # per-query sorted best-of-3 samples [min, median, max]
        "spread": runs,
        # per-query 1-min loadavg at first sample (see query_load)
        "query_loadavg_1m": query_load,
        # visibly flagged contended recording (VERDICT r10 ask #3):
        # compare rounds only between records where this is false.
        # r12: a pre-existing foreign JVM also contends (see
        # _foreign_jvms), even at idle loadavg
        "contended": (load_at_start > LOADAVG_CONTENTION_THRESHOLD
                      or foreign_jvms > 0),
        "contention_threshold_1m": LOADAVG_CONTENTION_THRESHOLD,
        "loadavg_1m_at_start": round(load_at_start, 2),
        "foreign_jvms_at_start": foreign_jvms,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "dataset": dataset,
        # page-cache proxy around the priming read and the suite
        # (VERDICT r11 ask #5): inputs are warm by construction after
        # the fingerprint pass; the deltas say how warm the box was
        # BEFORE priming and how much the suite itself displaced
        "page_cache_kb": {
            "at_start": cached_at_start,
            "after_prime": cached_after_prime,
            "after_suite": _meminfo_cached_kb(),
            "primed_by_fingerprint_read": True,
        },
        # box/runtime identity: with the dataset fingerprint this makes
        # any round-over-round drift attributable (data vs environment)
        "env": {
            "spark": spark.version,
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            "python": ".".join(map(str, sys.version_info[:3])),
            "os_cpus": os.cpu_count(),
            # 1-min load average straddling the timed region: a loaded
            # box explains a slow round; an idle one rules it out
            "loadavg_1m_before": round(load_before, 2),
            "loadavg_1m_after": round(os.getloadavg()[0], 2),
        },
    }))
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
