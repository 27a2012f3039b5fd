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
import numpy as np

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


def cells_eq(a, b):
    """Single-cell (equal?, kind) with the historical loop's semantics,
    safe for array-valued cells (a bare ``==`` on numpy arrays is
    ambiguous and would crash the checker on any LIST output column)."""
    a, b = norm_cell(a), norm_cell(b)
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        return np.array_equal(np.asarray(a), np.asarray(b)), None
    if a is None and b is None:
        return True, None
    eq = (a == b) or (str(a) == str(b))
    if not eq and isinstance(a, float) and isinstance(b, float):
        if abs(a - b) < 1e-12 * max(1.0, abs(a), abs(b)):
            return True, "near"
    return eq, None


def compare_frames(name, got, exp):
    """Positional frame compare (the driver's semantics). Returns
    (failed, note). Vectorized per-column fast path; the per-cell loop
    runs only on a mismatching column, for error reporting — at the
    100x probe scale the window outputs reach ~15M rows and a pure
    iloc loop costs hours."""
    note = None
    for c in got.columns:
        a, b = got[c], exp[c]
        try:
            if a.equals(b):
                continue
        except Exception:
            pass
        av, bv = a.to_numpy(), b.to_numpy()
        # dtype-normalized vectorized pass: columns whose pandas dtype
        # differs between the Spark parquet and the DuckDB oracle (the
        # cases the dtype-note block reports, e.g. int32 vs int64)
        # always fail Series.equals even when every value matches —
        # without this, those columns re-enter the per-cell loop at
        # ~15M-row probe scale
        try:
            if np.issubdtype(av.dtype, np.floating) and \
                    np.issubdtype(bv.dtype, np.floating):
                # near-miss tolerance ONLY when BOTH sides are floats,
                # matching cells_eq — a float-vs-int column must be
                # value-exact, not 1e-12-close
                af = av.astype(np.float64)
                bf = bv.astype(np.float64)
                both_nan = np.isnan(af) & np.isnan(bf)
                if np.all(both_nan | np.isclose(af, bf, rtol=1e-12,
                                                atol=0.0, equal_nan=True)):
                    if not np.array_equal(af, bf, equal_nan=True) \
                            and note is None:
                        note = f"near-miss (vectorized) col {c}"
                    continue
            # value-level equality with numpy's own promotion to the
            # common WIDER type — never a one-sided astype, which wraps
            # on narrowing / signed-unsigned casts and would false-pass
            # values differing by exactly 2**32 or a sign flip
            elif np.array_equal(av, bv):
                continue
        except (TypeError, ValueError):
            pass  # object/list columns: fall through to the cell loop
        # slow path: find the first real divergence (or prove near-miss)
        for i in range(len(av)):
            eq, kind = cells_eq(av[i], bv[i])
            if kind == "near" and note is None:
                note = f"near-miss row {i} col {c}: {av[i]!r} vs {bv[i]!r}"
            if not eq:
                print(f"FAIL {name}: row {i} col {c}: "
                      f"spark={av[i]!r} oracle={bv[i]!r}")
                # diagnose tie-order-only divergences: identical result
                # SETS in different row order mean the oracle's ORDER BY
                # is not a total order — a different bug than a value
                # mismatch, so say so
                try:
                    cols = list(got.columns)
                    gs = got.sort_values(cols).reset_index(drop=True)
                    es = exp.sort_values(cols).reset_index(drop=True)
                    if gs.equals(es):
                        print(f"     ({name}: result SETS are identical — "
                              "row-order-only divergence; the oracle's "
                              "ORDER BY is not a total order)")
                except Exception:
                    pass
                return True, note
    return False, note


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        # per-table: a partial corpus (scale_probe doc/rel families) has
        # only some tables; queries touching a missing one fail loudly
        # at their own row instead of killing the whole check at startup
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception as e:
            print(f"note: table {t} unavailable ({e})")
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
        failed, note_txt = compare_frames(name, got, exp)
        if failed:
            failures += 1
            continue
        note = f"  [{note_txt}]" if note_txt else ""
        print(f"OK   {name} ({len(got)} rows){note}")

    # queries with no oracle → rows-only check (guarded: an empty or
    # half-written query dir must report, not crash the whole summary)
    import os
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            try:
                n = con.sql(
                    f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
            except Exception as e:
                print(f"WARN {d} (rows-only: unreadable — {e})")
                continue
            status = "OK  " if n > 0 else "WARN"
            print(f"{status} {d} (rows-only: {n} rows)")

    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
