#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Runs each oracle_sql.json query in DuckDB over the same sf dir, loads the
Spark parquet output, sorts columns by name + rows by all columns, and
compares cell-by-cell (exact for ints/strings/timestamps, tiny epsilon
reporting for floats so we can see HOW far off a mismatch is).

Usage: check.py <sfdir> <verify_out_dir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
            got = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        # driver compare shape: sort columns by name, then rows
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        # driver hash stringifies values, so an int64 vs float64 dtype skew
        # (e.g. DuckDB HUGEINT sum -> pandas float) is a REAL mismatch even
        # when values compare numerically equal (burned by corpus_filter r2)
        dt_bad = [(c, str(exp[c].dtype), str(got[c].dtype))
                  for c in exp.columns if exp[c].dtype.kind != got[c].dtype.kind]
        if dt_bad:
            print(f"FAIL {name}: dtype skew {dt_bad}")
            n_fail += 1
            continue
        exp = exp.sort_values(by=list(exp.columns), ignore_index=True)
        got = got.sort_values(by=list(got.columns), ignore_index=True)
        bad = []
        for c in exp.columns:
            ev, gv = exp[c], got[c]
            for i in range(len(ev)):
                a, b = ev.iloc[i], gv.iloc[i]
                if a is None and b is None:
                    continue
                try:
                    if isinstance(a, float) or isinstance(b, float):
                        if (isinstance(a, float) and math.isnan(a)) and (isinstance(b, float) and math.isnan(b)):
                            continue
                        if a != b:
                            bad.append((c, i, a, b, abs(a - b)))
                    elif str(a) != str(b):
                        bad.append((c, i, a, b, None))
                except Exception:
                    bad.append((c, i, a, b, None))
                if len(bad) > 3:
                    break
            if len(bad) > 3:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell mismatches, first: {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    # queries without oracle: rows-only
    import os
    for d in sorted(os.listdir(outdir)):
        p = os.path.join(outdir, d)
        if os.path.isdir(p) and d not in oracle:
            try:
                n = con.sql(f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
                print(f"ROWS {d}: {n} rows (no oracle)")
            except Exception as e:
                print(f"FAIL {d}: unreadable output: {e}")
                n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
