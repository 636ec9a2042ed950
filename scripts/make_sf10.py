#!/usr/bin/env python3
"""Synthesize a 10x corpus from sf0.1 for the scale-up oracle sweep.

Ten key-shifted copies of every fact/entity table (referential
integrity preserved: orders.o_custkey shifts with customer.c_custkey,
lineitem's three FKs shift with their parents; dims region/nation copy
once). Payload columns are kept byte-identical — a 10x-replicated
corpus doubles as the dedup stress test (every doc/vector has 9 exact
twins), and both engines read the same files so the oracle gate is
unaffected.

Usage: python3 scripts/make_sf10.py [src_dir] [dst_dir] [copies]
"""
import os, sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def src(t):
    return f"'{SRC}/{t}.parquet'"

def shift_of(table, key):
    (mx,) = con.execute(f"SELECT max({key}) FROM {src(table)}").fetchone()
    s = 1
    while s <= mx:
        s *= 10
    return s

SHIFTS = {
    "c": shift_of("customer", "c_custkey"),
    "s": shift_of("supplier", "s_suppkey"),
    "p": shift_of("part", "p_partkey"),
    "o": shift_of("orders", "o_orderkey"),
    "e": shift_of("events", "event_id"),
    "u": shift_of("events", "user_id"),
    "d": shift_of("documents", "doc_id"),
    "v": shift_of("embeddings", "vec_id"),
}

# (table, {column: shift_key}) — every other column passes through
PLANS = [
    ("customer", {"c_custkey": "c"}),
    ("supplier", {"s_suppkey": "s"}),
    ("part", {"p_partkey": "p"}),
    ("orders", {"o_orderkey": "o", "o_custkey": "c"}),
    ("lineitem", {"l_orderkey": "o", "l_partkey": "p", "l_suppkey": "s"}),
    ("events", {"event_id": "e", "user_id": "u"}),
    ("documents", {"doc_id": "d"}),
    ("embeddings", {"vec_id": "v"}),
]

for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM {src(t)}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")

for t, shifted in PLANS:
    cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM {src(t)}").fetchall()]
    arms = []
    for i in range(N):
        sel = ", ".join(
            f"{c} + {i * SHIFTS[shifted[c]]} AS {c}" if c in shifted else c
            for c in cols)
        arms.append(f"SELECT {sel} FROM {src(t)}")
    q = " UNION ALL ".join(arms)
    con.execute(f"COPY ({q}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    (n,) = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()
    print(f"{t}: {n} rows")
