#!/usr/bin/env python3
"""Independent connected-components check for q_gr_connected[_lss].

Usage: cc_check.py <verify_out_dir> <sf_dir>

DuckDB's WITH RECURSIVE replay of min-label propagation is superlinear
at sf0.1 (the walk materializes every (node, label) improvement), so
the standard oracle times out there while the engine side is linear.
This checker verifies the same contract a different way: derive the
identical co-purchase edge set (non-recursive SQL, cheap at any SF),
run union-find in plain Python (near-linear), and compare the
per-component (component = min node id, n_nodes, max_node) summary
row-for-row against BOTH connected-components engines' outputs.
Exit 0 iff both match.
"""
import sys

import duckdb
import pandas as pd

MAX_BASKET = 16


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    edges = con.execute(f"""
        WITH basket AS (
          SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          FROM read_parquet('{sf_dir}/lineitem.parquet')),
        oko AS (SELECT ok FROM basket GROUP BY ok
                HAVING count(*) <= {MAX_BASKET})
        SELECT DISTINCT x.pk AS a, y.pk AS b
        FROM basket x JOIN basket y ON x.ok = y.ok AND x.pk < y.pk
        WHERE x.ok IN (SELECT ok FROM oko)""").fetchall()
    parent = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id so the representative IS the component label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    comps = {}
    for n in parent:
        r = find(n)
        c = comps.setdefault(r, [0, r])
        c[0] += 1
        c[1] = max(c[1], n)
    expected = sorted((r, cnt, mx) for r, (cnt, mx) in comps.items())
    rc = 0
    for q in ("q_gr_connected", "q_gr_connected_lss"):
        got = pd.read_parquet(f"{out_dir}/{q}")
        got_rows = sorted(
            (int(r.component), int(r.n_nodes), int(r.max_node))
            for r in got.itertuples())
        ok = got_rows == expected
        print(f"{q}: {'pass_independent' if ok else 'FAIL'} "
              f"({len(got_rows)} components, {len(parent)} nodes, "
              f"{len(edges)} edges)")
        if not ok:
            print(f"  expected[:3]={expected[:3]} got[:3]={got_rows[:3]}")
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
