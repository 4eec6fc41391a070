"""Unit tests for tools/record_round.py (VERDICT r5 ask #3).

The tool classifies driver CORRECTNESS rows into green / rows-only /
RED and drives window rotation, so its no-oracle branch must be
strict: a `no_oracle` row only counts as clean rows-only evidence when
the query actually produced rows. A 0-row or None-row record — a
silently-empty rows-only query — must be RED (nonzero exit), not
rotated out of the window as evidenced.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

TOOL = Path(__file__).resolve().parents[1] / "tools" / "record_round.py"


def _run(tmp_path, record):
    p = tmp_path / "CORRECTNESS_test.json"
    p.write_text(json.dumps(record))
    return subprocess.run([sys.executable, str(TOOL), str(p), "9"],
                          capture_output=True, text=True)


def _row(**kw):
    base = {"rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None}
    base.update(kw)
    return base


def test_green_and_clean_rows_only(tmp_path):
    rec = {
        "good_green": _row(rows_match=True, schema_match=True,
                           hash_match=True, spark_rows=10,
                           oracle_rows=10),
        "good_rows_only": _row(spark_rows=8, err="no_oracle"),
    }
    r = _run(tmp_path, rec)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "'good_green'" in r.stdout
    assert "'good_rows_only'" in r.stdout
    assert "0 RED" in r.stdout


def test_zero_row_no_oracle_is_red(tmp_path):
    rec = {"empty_rows_only": _row(spark_rows=0, err="no_oracle")}
    r = _run(tmp_path, rec)
    assert r.returncode == 1, r.stdout + r.stderr
    assert "RED: empty_rows_only" in r.stdout


def test_none_row_no_oracle_is_red(tmp_path):
    # a row where spark_rows never got filled in (query died before
    # counting) must not crash the tool NOR count as rows-only
    rec = {"dead_rows_only": _row(spark_rows=None, err="no_oracle")}
    r = _run(tmp_path, rec)
    assert r.returncode == 1, r.stdout + r.stderr
    assert "RED: dead_rows_only" in r.stdout


def test_other_error_is_red(tmp_path):
    rec = {"blew_up": _row(spark_rows=12, err="spark: boom")}
    r = _run(tmp_path, rec)
    assert r.returncode == 1
    assert "RED: blew_up" in r.stdout
