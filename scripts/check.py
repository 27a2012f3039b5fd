#!/usr/bin/env python3
"""Local pre-check that mimics the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <outDir>

Reads each <outDir>/<name>/ parquet (graft.Verify output), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name, and compares values exactly.
This is builder-side tooling only (the engine itself is Scala/Spark).
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failures += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} "
                  f"vs oracle {list(exp.columns)}")
            failures += 1
            continue
        for c in got.columns:
            if str(got[c].dtype) != str(exp[c].dtype):
                print(f"  note {name}.{c}: dtype spark={got[c].dtype} "
                      f"oracle={exp[c].dtype}")
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(exp)}")
            failures += 1
            continue
        mismatch = None
        for i in range(len(got)):
            for c in got.columns:
                a, b = norm_cell(got[c].iloc[i]), norm_cell(exp[c].iloc[i])
                eq = (a == b) or (a is None and b is None) \
                    or (str(a) == str(b))
                if not eq and isinstance(a, float) and isinstance(b, float):
                    eq = abs(a - b) < 1e-12 * max(1.0, abs(a), abs(b))
                    if eq:
                        mismatch = mismatch or (
                            f"near-miss row {i} col {c}: {a!r} vs {b!r}")
                        continue
                if not eq:
                    print(f"FAIL {name}: row {i} col {c}: "
                          f"spark={a!r} oracle={b!r}")
                    failures += 1
                    mismatch = "hard"
                    break
            if mismatch == "hard":
                break
        if mismatch == "hard":
            continue
        note = f"  [{mismatch}]" if mismatch else ""
        print(f"OK   {name} ({len(got)} rows){note}")

    # queries with no oracle → rows-only check
    import os
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            n = con.sql(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
            status = "OK  " if n > 0 else "WARN"
            print(f"{status} {d} (rows-only: {n} rows)")

    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
