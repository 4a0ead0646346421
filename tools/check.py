#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle (oracle_sql.json) on the same parquet tables.
Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output");  n_bad += 1;  continue
        try:
            got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}");  n_bad += 1;  continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1;  continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_bad += 1;  continue
        bad_cols = []
        for c in got.columns:
            a, b = got[c], want[c]
            # The driver's compare hashes value representations, so dtype
            # divergence (e.g. DECIMAL vs DOUBLE — the r1 hash failures) is a
            # failure here even when values compare equal.
            ka, kb = a.dtype.kind, b.dtype.kind
            if ka != kb:
                bad_cols.append((c, f"dtype {a.dtype} vs {b.dtype}"))
                continue
            if ka == "O":
                ta = set(type(v).__name__ for v in a.dropna().head(50))
                tb = set(type(v).__name__ for v in b.dropna().head(50))
                if ta != tb:
                    bad_cols.append((c, f"objtype {ta} vs {tb}"))
                    continue
                if "Decimal" in ta:
                    bad_cols.append((c, "DECIMAL output column (hash hazard)"))
                    continue
            try:
                eq = (a.isna() & b.isna()) | (a == b)
                if not eq.all():
                    bad_cols.append((c, int((~eq).sum())))
            except Exception as e:
                bad_cols.append((c, f"cmp-error {e}"))
        if bad_cols:
            print(f"FAIL {name}: value mismatch {bad_cols}")
            for c, _ in bad_cols[:2]:
                mask = ~(((got[c].isna()) & (want[c].isna())) | (got[c] == want[c]))
                print("  got :", got[mask][c].head(3).to_list())
                print("  want:", want[mask][c].head(3).to_list())
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
