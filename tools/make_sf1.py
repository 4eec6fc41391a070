"""Deterministic sf1 scale-up of the driver's sf0.1 tables
(VERDICT r5 ask #6 / r6 ask #5: the 2x-of-baseline gate needs a second
scale point and SCALING.md's 10x table used a synthetic corpus, not
the driver's own tables).

The driver provides sf{0.001,0.01,0.1} only and /root/testdata is
read-only, so sf1 is constructed from sf0.1 the way TPC-H itself
scales: fact/dimension tables grow 10x with dense key offsets that
preserve every join relationship copy-internally, while the fixed
dimensions (region, nation) and all value distributions stay exactly
as generated. Concretely, copy i in 0..9 shifts each surrogate key by
i * max(key), so lineitem->orders->customer->nation chains, part/supp
joins, and event/user locality are intact in every copy. Timestamps
are unchanged (10x traffic density over the same window — the usual
shape of a scale-up, and it keeps date-range selectivities identical).
documents/embeddings replicate with shifted ids and UNCHANGED
text/vectors: sf1 therefore carries 10x exact duplication, which is a
deliberate stress point for the dedup family (SCALING.md already
measured the LSH ladder linear under 5x duplication; this records it
on the driver's own corpus).

Output: $OUT (default /root/repo/.benchdata/sf1), one parquet per
table, written by DuckDB. Deterministic: same input bytes -> same
output bytes, no RNG anywhere.

Usage: python tools/make_sf1.py [copies] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# key column -> (table that owns it). Offsets use the owner's max so
# copies stay dense and foreign keys land on the same copy's rows.
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
OWNER = {"c_custkey": ("customer", "c_custkey"),
         "s_suppkey": ("supplier", "s_suppkey"),
         "p_partkey": ("part", "p_partkey"),
         "o_orderkey": ("orders", "o_orderkey"),
         "o_custkey": ("customer", "c_custkey"),
         "l_orderkey": ("orders", "o_orderkey"),
         "l_partkey": ("part", "p_partkey"),
         "l_suppkey": ("supplier", "s_suppkey"),
         "event_id": ("events", "event_id"),
         "user_id": ("events", "user_id"),
         "doc_id": ("documents", "doc_id"),
         "vec_id": ("embeddings", "vec_id")}


def main() -> int:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/repo/.benchdata/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    spans = {}
    for col, (tbl, owner_col) in OWNER.items():
        # span = max+1: keys are 0-based, so offsetting by max alone
        # would collide each copy's key 0 with the previous copy's max
        # (caught by tests/test_make_sf1.py)
        spans[col] = con.execute(
            f"SELECT max({owner_col}) + 1 FROM "
            f"read_parquet('{SRC}/{tbl}.parquet')").fetchone()[0]

    for t in TABLES:
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if t not in KEYS:  # fixed dimensions: copy through unchanged
            sql = f"SELECT * FROM {src}"
        else:
            cols = [c[0] for c in con.execute(
                f"DESCRIBE SELECT * FROM {src}").fetchall()]
            types = {c[0]: c[1] for c in con.execute(
                f"DESCRIBE SELECT * FROM {src}").fetchall()}
            proj = ", ".join(
                f"CAST({c} + i * {spans[c]} AS {types[c]}) AS {c}"
                if c in KEYS[t] else c for c in cols)
            sql = (f"SELECT {proj} FROM {src}, "
                   f"(SELECT unnest(generate_series(0, {copies - 1})) "
                   f"AS i) ORDER BY i")
        con.execute(f"COPY ({sql}) TO '{out}/{t}.parquet' "
                    f"(FORMAT PARQUET, COMPRESSION SNAPPY)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
