#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on each oracle_sql.json entry over the sf tables, loads the
Spark parquet dumps written by graft.Verify, sorts columns by name and
rows by value, and compares. Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
            want = rel.fetchall()
            wcols = [d[0] for d in rel.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got = got_rel.fetchall()
            gcols = [d[0] for d in got_rel.description]
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_bad += 1
            continue
        # sort columns by name (driver behavior), then rows by value
        worder = sorted(range(len(wcols)), key=lambda i: wcols[i])
        gorder = sorted(range(len(gcols)), key=lambda i: gcols[i])
        if sorted(wcols) != sorted(gcols):
            print(f"FAIL {name}: columns differ: spark={sorted(gcols)} oracle={sorted(wcols)}")
            n_bad += 1
            continue
        wrows = sorted(tuple(norm(r[i]) for i in worder) for r in want)
        grows = sorted(tuple(norm(r[i]) for i in gorder) for r in got)
        if wrows == grows:
            print(f"ok   {name}: {len(grows)} rows")
            n_ok += 1
        else:
            print(f"FAIL {name}: rows spark={len(grows)} oracle={len(wrows)}")
            gset, wset = set(grows), set(wrows)
            only_w = [r for r in wrows if r not in gset][:3]
            only_g = [r for r in grows if r not in wset][:3]
            for r in only_w:
                print(f"     oracle-only: {r}")
            for r in only_g:
                print(f"     spark-only:  {r}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
