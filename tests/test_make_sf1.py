"""tools/make_sf1.py integrity: the sf1 scale-up that backs
BENCH_sf1.json must be deterministic and must preserve every join
relationship per copy — otherwise the recorded ratios measure a
different workload shape than the driver's sf0.1 tables.

Runs the builder at copies=2 over sf0.001 source semantics by pointing
it at a tmp dir (the builder's SRC is fixed to sf0.1; these checks run
on its real output shape but at the smallest copy count to stay
fast)."""

from __future__ import annotations

import subprocess
import sys

import duckdb
import pytest

SRC = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def sf2_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf2"))
    r = subprocess.run(
        [sys.executable, "tools/make_sf1.py", "2", out],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    return out


def test_row_counts_scale_exactly(sf2_dir):
    con = duckdb.connect()
    fixed = {"region", "nation"}
    for t in ["region", "nation", "customer", "orders", "lineitem",
              "events", "documents", "embeddings"]:
        n_src = con.execute(
            f"SELECT count(*) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        n_out = con.execute(
            f"SELECT count(*) FROM read_parquet('{sf2_dir}/{t}.parquet')"
        ).fetchone()[0]
        assert n_out == (n_src if t in fixed else 2 * n_src), t


def test_keys_stay_unique_and_fks_resolve(sf2_dir):
    con = duckdb.connect()
    # primary keys stay unique after the offset replication
    for t, k in [("customer", "c_custkey"), ("orders", "o_orderkey"),
                 ("part", "p_partkey"), ("documents", "doc_id")]:
        n, d = con.execute(
            f"SELECT count(*), count(DISTINCT {k}) FROM "
            f"read_parquet('{sf2_dir}/{t}.parquet')").fetchone()
        assert n == d, f"{t}.{k} collides across copies"
    # every lineitem still joins to an order, and every order to a
    # customer — the chain the offsets must preserve
    dangling = con.execute(f"""
        SELECT count(*) FROM read_parquet('{sf2_dir}/lineitem.parquet') l
        LEFT JOIN read_parquet('{sf2_dir}/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL""").fetchone()[0]
    assert dangling == 0
    dangling = con.execute(f"""
        SELECT count(*) FROM read_parquet('{sf2_dir}/orders.parquet') o
        LEFT JOIN read_parquet('{sf2_dir}/customer.parquet') c
          ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL""").fetchone()[0]
    assert dangling == 0


def test_value_distributions_unchanged(sf2_dir):
    con = duckdb.connect()
    a = con.execute(
        f"SELECT ROUND(sum(l_extendedprice), 2) FROM "
        f"read_parquet('{SRC}/lineitem.parquet')").fetchone()[0]
    b = con.execute(
        f"SELECT ROUND(sum(l_extendedprice), 2) FROM "
        f"read_parquet('{sf2_dir}/lineitem.parquet')").fetchone()[0]
    assert b == pytest.approx(2 * a, rel=1e-9)


def test_builder_is_deterministic(sf2_dir, tmp_path):
    out2 = str(tmp_path / "again")
    r = subprocess.run(
        [sys.executable, "tools/make_sf1.py", "2", out2],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    con = duckdb.connect()
    for t in ["lineitem", "documents"]:
        diff = con.execute(f"""
            SELECT count(*) FROM (
              SELECT * FROM read_parquet('{sf2_dir}/{t}.parquet')
              EXCEPT ALL
              SELECT * FROM read_parquet('{out2}/{t}.parquet'))
        """).fetchone()[0]
        assert diff == 0, f"{t} differs between two builder runs"
