#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: for each query
output written by graft.Verify, run the matching DuckDB oracle SQL on
the raw testdata tables and compare (columns sorted by name, rows
sorted, values hashed). Usage: check_oracle.py SFDIR OUTDIR
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures = 0
    import os
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    for name in names:
        got = con.execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        if name not in oracles:
            print(f"{name:24s} ROWS-ONLY rows={len(got)}"
                  + ("  ⚠ EMPTY" if len(got) == 0 else ""))
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name:24s} ORACLE-SQL-ERROR {str(e)[:120]}")
            failures += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"{name:24s} COLUMN-MISMATCH got={list(g.columns)} exp={list(e.columns)}")
            failures += 1
            continue
        if len(g) != len(e):
            print(f"{name:24s} ROWCOUNT-MISMATCH got={len(g)} exp={len(e)}")
            failures += 1
            continue
        # dtype-kind gate first: the driver hashes canonical values, so
        # an int64 vs float64 drift (e.g. DuckDB HUGEINT materialized
        # as float) fails its hash even when values are numerically
        # equal. Integer *widths* (int32 vs int64) are canonicalized by
        # the driver (q_window rn passed r01), so compare kind only.
        dtype_mismatch = [(c, str(g[c].dtype), str(e[c].dtype))
                          for c in g.columns
                          if g[c].dtype.kind != e[c].dtype.kind]
        if dtype_mismatch:
            print(f"{name:24s} DTYPE-MISMATCH {dtype_mismatch}")
            failures += 1
            continue
        # value compare, exact for non-floats, tiny tolerance report for floats
        mismatch_cols = []
        for c in g.columns:
            gv, ev = g[c], e[c]
            try:
                if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(ev):
                    import numpy as np
                    if not np.allclose(gv.astype(float), ev.astype(float),
                                       rtol=0, atol=0, equal_nan=True):
                        # would the driver's exact hash fail?
                        close = np.allclose(gv.astype(float), ev.astype(float),
                                            rtol=1e-9, atol=1e-9, equal_nan=True)
                        mismatch_cols.append((c, "float-close" if close else "float-far"))
                else:
                    if not gv.astype(str).equals(ev.astype(str)):
                        mismatch_cols.append((c, "exact"))
            except Exception as ex:
                mismatch_cols.append((c, f"cmp-error {ex}"))
        if mismatch_cols:
            print(f"{name:24s} VALUE-MISMATCH {mismatch_cols}")
            for c, _ in mismatch_cols[:2]:
                diff = g[c].astype(str) != e[c].astype(str)
                idx = diff[diff].index[:3]
                for i in idx:
                    print(f"    row {i}: got={g[c][i]!r} exp={e[c][i]!r}")
            failures += 1
        else:
            print(f"{name:24s} OK rows={len(g)}")
    print(f"\n{'PASS' if failures == 0 else 'FAIL'} ({failures} failures)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
