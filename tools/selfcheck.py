#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify.scala's
parquet dumps against the DuckDB oracle SQL (columns sorted by name, rows
sorted, floats compared with tolerance). Usage:
    python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(rows):
    return sorted(tuple(x) for x in rows)

def approx_eq(a, b):
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-6 + 1e-9 * max(abs(fa), abs(fb))
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import os
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        got_rel = con.sql(f"SELECT * FROM '{path}/*.parquet'")
        got_cols = sorted(got_rel.columns)
        got = normalize(con.sql(
            f"SELECT {', '.join(got_cols)} FROM got_rel").fetchall())
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows"
                  + ("  !! EMPTY" if not got else ""))
            if not got:
                failures += 1
            continue
        exp_rel = con.sql(oracle[name])
        exp_cols = sorted(exp_rel.columns)
        if exp_cols != got_cols:
            print(f"  [FAIL-schema] {name}: spark={got_cols} oracle={exp_cols}")
            failures += 1
            continue
        got_types = dict(zip(got_rel.columns, [str(t) for t in got_rel.types]))
        exp_types = dict(zip(exp_rel.columns, [str(t) for t in exp_rel.types]))
        tdiff = {c: (got_types[c], exp_types[c]) for c in got_types
                 if got_types[c] != exp_types[c]}
        if tdiff:
            print(f"  [WARN-types] {name}: {tdiff}")
        exp = normalize(con.sql(
            f"SELECT {', '.join(exp_cols)} FROM exp_rel").fetchall())
        if len(exp) != len(got):
            print(f"  [FAIL-rows] {name}: spark={len(got)} oracle={len(exp)}")
            failures += 1
            continue
        bad = next((i for i, (g, e) in enumerate(zip(got, exp))
                    if not all(approx_eq(a, b) for a, b in zip(g, e))), None)
        if bad is not None:
            print(f"  [FAIL-vals] {name} @row{bad}:\n    spark={got[bad]}\n    oracle={exp[bad]}")
            failures += 1
        else:
            print(f"  [OK] {name}: {len(got)} rows")
    print(f"{'PASS' if failures == 0 else 'FAIL'} ({failures} failures)")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
