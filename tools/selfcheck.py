#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify.scala's
parquet dumps against the DuckDB oracle SQL (columns sorted by name, rows
sorted, floats compared with tolerance). Usage:
    python3 tools/selfcheck.py <sfDir> <verifyOutDir> [jsonOut]

Round 13: this is the STANDING sf0.1 gate (the round-12 partial run caught
the depth-10 BtwUnrollDepth oracle bug — an oracle constant sized on
sf0.01 silently truncating at sf0.1 — so the run must complete and leave a
committed artifact each round). Hardened accordingly: a per-query DuckDB
error records an `err` row and the run CONTINUES (the round-12 run died
mid-alphabet on ENOSPC and left q88..qbz unchecked); temp spill goes to a
dedicated directory so a full working dir can't kill the run; `jsonOut`
writes a CORRECTNESS_sf*-shaped artifact.
"""
import json, math, os, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(rows):
    return sorted(tuple(x) for x in rows)

def approx_eq(a, b):
    # BIT-STRICT since round 14: the driver's gate hashes exact values, and
    # the old 1e-6 tolerance green-lit the r13 q1c 6th-decimal flip that the
    # driver then failed. Only NaN==NaN is special-cased; any other float
    # difference — including 1 ulp — must FAIL here exactly as it fails there.
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return a == b

def main(sf_dir, out_dir, json_out=None):
    tmp = os.environ.get("SELFCHECK_TMP", "/tmp/selfcheck_duckdb_tmp")
    os.makedirs(tmp, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    failures = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        t0 = time.time()
        try:
            got_rel = con.sql(f"SELECT * FROM '{path}/*.parquet'")
            got_cols = sorted(got_rel.columns)
            got = normalize(con.sql(
                f"SELECT {', '.join(got_cols)} FROM got_rel").fetchall())
        except Exception as e:
            print(f"  [ERR-read] {name}: {e}")
            results[name] = {"status": "err", "detail": f"read: {e}"}
            failures += 1
            continue
        if name not in oracle:
            status = "no_oracle" if got else "no_oracle_EMPTY"
            print(f"  [rows-only] {name}: {len(got)} rows"
                  + ("  !! EMPTY" if not got else ""))
            results[name] = {"status": status, "rows": len(got)}
            if not got:
                failures += 1
            continue
        try:
            exp_rel = con.sql(oracle[name])
            exp_cols = sorted(exp_rel.columns)
            if exp_cols != got_cols:
                print(f"  [FAIL-schema] {name}: spark={got_cols} oracle={exp_cols}")
                results[name] = {"status": "schema_mismatch",
                                 "spark": got_cols, "oracle": exp_cols}
                failures += 1
                continue
            exp = normalize(con.sql(
                f"SELECT {', '.join(exp_cols)} FROM exp_rel").fetchall())
        except Exception as e:
            print(f"  [ERR-oracle] {name}: {e}")
            results[name] = {"status": "err", "detail": f"oracle: {e}"}
            failures += 1
            continue
        dt = round(time.time() - t0, 1)
        if len(exp) != len(got):
            print(f"  [FAIL-rows] {name}: spark={len(got)} oracle={len(exp)}")
            results[name] = {"status": "rows_mismatch",
                             "spark": len(got), "oracle": len(exp)}
            failures += 1
            continue
        bad = next((i for i, (g, e) in enumerate(zip(got, exp))
                    if not all(approx_eq(a, b) for a, b in zip(g, e))), None)
        if bad is not None:
            print(f"  [FAIL-vals] {name} @row{bad}:\n    spark={got[bad]}\n    oracle={exp[bad]}")
            results[name] = {"status": "vals_mismatch", "row": bad,
                             "spark": [str(x) for x in got[bad]],
                             "oracle": [str(x) for x in exp[bad]]}
            failures += 1
        else:
            print(f"  [OK] {name}: {len(got)} rows ({dt}s)")
            results[name] = {"status": "pass", "rows": len(got),
                             "oracle_sec": dt}
    print(f"{'PASS' if failures == 0 else 'FAIL'} ({failures} failures)")
    if json_out:
        n_pass = sum(1 for v in results.values() if v["status"] == "pass")
        n_no = sum(1 for v in results.values()
                   if v["status"].startswith("no_oracle"))
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "out_dir": out_dir,
                       "n_queries": len(results), "n_pass": n_pass,
                       "n_no_oracle": n_no, "n_fail": failures,
                       "queries": results}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
