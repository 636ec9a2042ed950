#!/usr/bin/env python3
"""Local oracle-parity check: mirrors the driver's DuckDB compare.

Usage: python3 scripts/compare.py <sfDir> <verifyOutDir>

Reads each <name>/ parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over views of the sfDir
tables, and diffs (sorted rows, columns sorted by name).
"""
import json, sys, glob, os, re
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# ---- shared-CTE fast path (GRAFT_ORACLE_FAST=0 disables) -------------
# Eight oracles embed the LSH verified-pairs CTE chain and five of
# those additionally embed the recursive transitive-closure cluster
# map built from it. At the 10x corpus the closure dominates the whole
# replay (~3.7 h when re-derived per oracle). Both chains end at
# unique, generator-pinned marker strings (Dedup.minhashLshCtes /
# Dedup.clusterCtes), so we materialize `verified` and `cl` ONCE from
# the d07 oracle's own text and textually swap the shared prefix for a
# reference to the temp table. Semantics are identical by construction
# (the temp tables are produced by the very same SQL); an oracle whose
# suffix still references an intermediate CTE (sh/sig/bands/pairs:
# d04, d11, d13) is left untouched and runs full.
MARKER_A = "FROM pairs JOIN sh a ON doc_a = a.doc_id JOIN sh b ON doc_b = b.doc_id)"
MARKER_B = "FROM reach GROUP BY a)"
INNER = re.compile(r"\b(sh|sig|bands|pairs|dup|edges|reach)\b")

# set by prepare_shared: d07's exact CTE-prefix text up to each marker.
# rewrite_shared swaps a prefix ONLY when it matches d07's
# byte-for-byte after dropping the WITH [RECURSIVE] header (only the
# closure consumers say RECURSIVE; the chain text itself must be
# identical) — an oracle embedding the chain with different parameters
# but the same trailing marker must run full, not silently verify
# against d07's materialization.
PREFIX_A = PREFIX_B = None

def _norm_prefix(s):
    s = s.lstrip()
    for h in ("WITH RECURSIVE", "WITH"):
        if s.startswith(h):
            return s[len(h):].lstrip()
    return s

def prepare_shared(con, oracle):
    global PREFIX_A, PREFIX_B
    d07 = oracle.get("d07_dedup_clusters")
    if not d07 or MARKER_A not in d07 or MARKER_B not in d07:
        return False
    ia = d07.index(MARKER_A) + len(MARKER_A)
    con.execute("CREATE TEMP TABLE verified_mat AS " + d07[:ia] +
                " SELECT doc_a, doc_b, jac FROM verified")
    rest = d07[ia:]  # ", dup AS ..., cl AS (...)  SELECT ... FROM cl ..."
    ib = rest.index(MARKER_B) + len(MARKER_B)
    con.execute("CREATE TEMP TABLE cl_mat AS WITH RECURSIVE verified AS "
                "(SELECT * FROM verified_mat)" + rest[:ib] +
                " SELECT doc_id, cluster_id FROM cl")
    PREFIX_A = d07[:ia]
    PREFIX_B = d07[:ia + ib]
    return True

def rewrite_shared(sql):
    if MARKER_B in sql:
        prefix, suffix = sql.split(MARKER_B, 1)
        prefix += MARKER_B
        if (_norm_prefix(prefix) == _norm_prefix(PREFIX_B)
                and not INNER.search(suffix) and "verified" not in suffix):
            return "WITH RECURSIVE cl AS (SELECT * FROM cl_mat)" + suffix
    if MARKER_A in sql:
        prefix, suffix = sql.split(MARKER_A, 1)
        prefix += MARKER_A
        if _norm_prefix(prefix) == _norm_prefix(PREFIX_A) and not INNER.search(suffix):
            return "WITH RECURSIVE verified AS (SELECT * FROM verified_mat)" + suffix
    return sql

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp-ish columns to ns for cross-engine compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

# --- staged replay for the kNN-CTE-embedding oracles -----------------
# The graph-walk / pagerank oracles embed the 29M-candidate kNN chain
# and reference its `ranked` CTE from several downstream CTEs; at 30x
# DuckDB's working set for the MONOLITHIC query exceeds a single box
# (measured: >170 GB on s25). Same semantics, linear cost: materialize
# the heavy chain ONCE as a temp table, then run the tail against it.
# Each entry: query name -> (first CTE of the tail, staged CTEs).
# A staged CTE is a name or (name, predicate): EVERY tail reference to
# these chains filters `rank <= 3` (verified against the generators),
# so staging only those rows shrinks the retained temp table from the
# full ranked candidate set (~10^8 rows / tens of GB of spill at 30x —
# holding one while deriving the next is what filled the disk) to
# corpus x 3 rows; the tail's own filter then no-ops.
STAGED = {
    "s22_knn_pagerank": ("edges AS (", [("ranked", "rank <= 3")]),
    "s25_graph_ann": ("e AS (", [("ranked", "rank <= 3")]),
    "s28_graph_filtered": ("e AS (", [("ranked", "rank <= 3")]),
    "s27_graph_ingest": ("e AS (", [("oranked", "rank <= 3"),
                                    ("nranked", "rank <= 3")]),
    "s29_graph_pq": ("e AS (", [("ranked", "rank <= 3")]),
    "st16_stream_graph_ingest": ("e AS (", [("oranked", "rank <= 3"),
                                            ("aranked", "rank <= 3"),
                                            ("branked", "rank <= 3")]),
    # s30's tail starts after the level chains; all three ranked chains
    # are multi-referenced by the walk CTEs, so all three stage (each
    # CREATE runs the full head — 3 head passes, still linear, vs the
    # per-hop re-derivation of the monolithic form)
    "s30_graph_hier": ("gedge AS (", [("ranked", "rank <= 3"),
                                      ("l1ranked", "rank <= 3"),
                                      ("l2ranked", "rank <= 3")]),
    # d-family shared chains (3rd field keep=True): the staged tables
    # are PAIR-BOUNDED (candidate pairs / detected spans / tokenized
    # docs), tiny next to the walk family's ranked chains, so they are
    # kept for the whole replay instead of joining the eviction cycle
    # (sorted order interleaves the two families' heads — evicting
    # would re-derive each chain). d09/d20 share the
    # deletion-neighborhood levenshtein pair chain `p`; d14/d21 share
    # the positional-gram span chain `spans` (the gram self-join is
    # the d-family's single heaviest oracle step at 30x). A tail
    # marker starting with SELECT means the query has no tail CTEs —
    # the final select runs directly against the staged tables.
    "d09_fuzzy_keys": ("SELECT c_custkey, count(*) AS n_fuzzy", ["p"], True),
    "d20_er_score": ("ka AS (", ["p"], True),
    "d14_dup_spans": ("SELECT doc_a, doc_b, a_start, b_start, span_toks",
                      ["spans"], True),
    "d21_span_scrub": ("rem AS (", ["spans", "t"], True),
}

_staged_cache = {}  # evictable: (head text, cte name, pred) -> temp table
_staged_keep = {}   # kept for the whole replay (small d-family tables)
_staged_n = 0

def run_staged(con, name, sql):
    global _staged_n
    plan = STAGED.get(name)
    if not plan:
        return con.sql(sql)
    tail_cte, ctes = plan[0], plan[1]
    keep = len(plan) > 2 and plan[2]
    select_tail = tail_cte.startswith("SELECT")
    marker = ("\n       " if select_tail else ",\n       ") + tail_cte
    if marker not in sql:
        return con.sql(sql)
    head, tail = sql.split(marker, 1)  # head = "WITH <heavy ctes>"
    cache = _staged_keep if keep else _staged_cache
    # s22/s25/s28/s29 share a byte-identical head (the kNN chain), so
    # the staged table is derived ONCE and reused; EVICTABLE tables
    # from a DIFFERENT head are dropped first — at 30x a staged
    # `ranked` is tens of GB of spill, and two families alive at once
    # is what filled the disk on the first staged run
    if not keep:
        for key, tab in list(_staged_cache.items()):
            if key[0] != head:
                con.execute(f"DROP TABLE IF EXISTS {tab}")
                del _staged_cache[key]
    refs = []
    for entry in ctes:
        t, pred = entry if isinstance(entry, tuple) else (entry, None)
        where = f" WHERE {pred}" if pred else ""
        key = (head, t, pred)
        if key not in cache:
            tab = f"_staged_{t}_{_staged_n}"
            _staged_n += 1
            con.execute(f"CREATE TEMP TABLE {tab} AS {head}\n"
                        f" SELECT * FROM {t}{where}")
            cache[key] = tab
        refs.append((t, cache[key]))
    repl = ",\n       ".join(
        f"{t} AS (SELECT * FROM {tab})" for t, tab in refs)
    joiner = "\n       " if select_tail else ",\n       "
    return con.sql(f"WITH {repl}{joiner}{tail_cte}{tail}")

def main(sf_dir: str, out_dir: str, only=None) -> int:
    con = duckdb.connect()
    # cap DuckDB so big-SF oracle replays SPILL instead of OOM-dying:
    # the 30x s25 walk oracle (kNN CTE + kcenter chain + hop CTEs all
    # pinned concurrently) grew past 130 GB RSS unbounded and took a
    # SIGKILL; with a limit DuckDB pages the pinned CTEs to temp.
    con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCK_MEM', '48GB')}'")
    con.execute("SET temp_directory='.tmp'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    fast = os.environ.get("GRAFT_ORACLE_FAST", "1") != "0"
    if fast:
        fast = prepare_shared(con, oracle)
    names = sorted(oracle) if not only else [n for n in sorted(oracle)
             if any(n.startswith(o) for o in only)]
    for name in names:
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = canon(pd.concat([pd.read_parquet(fp) for fp in sorted(files)]))
        try:
            sql = rewrite_shared(oracle[name]) if fast else oracle[name]
            exp = canon(run_staged(con, name, sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} oracle={list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:2000]}")
            diff_cols = [c for c in got.columns
                         if not got[c].equals(exp[c])]
            print(f"  differing columns: {diff_cols}")
            for c in diff_cols[:3]:
                neq = got[c] != exp[c]
                idx = neq[neq].index[:5]
                print(f"  {c}: spark={got.loc[idx, c].tolist()} oracle={exp.loc[idx, c].tolist()}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    # optional 3rd+ args: only compare queries whose name starts with one
    # of the given prefixes (e.g. `q s t` to skip the heavy d-family)
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:] or None))
