#!/usr/bin/env python3
"""check_oracle with a per-query wall budget: quadratic DuckDB
oracles that can't finish in `budget` seconds at this SF are reported
SLOW-SKIP instead of hanging the sweep. Used for cross-SF sweeps at
sf0.1, where a handful of intentionally-quadratic DuckDB verifier
spellings (recursive-CTE components, all-pairs shingle joins) are
minutes-slow in the oracle engine even though the Spark side is fine.
Usage: check_oracle_budget.py SFDIR OUTDIR BUDGET_SECONDS [query...]
(extra args restrict the sweep to the named queries)
"""
import json
import multiprocessing as mp
import os
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def one(args):
    sfdir, outdir, name, sql = args
    import duckdb
    import numpy as np
    import pandas as pd
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
    if sql is None:
        return (name, f"ROWS-ONLY rows={len(got)}"
                + (" EMPTY!" if len(got) == 0 else ""))
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        return (name, f"ORACLE-SQL-ERROR {str(e)[:100]}")

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns), ignore_index=True)

    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        return (name, "COLUMN-MISMATCH")
    if len(g) != len(e):
        return (name, f"ROWCOUNT-MISMATCH got={len(g)} exp={len(e)}")
    for c in g.columns:
        gv, ev = g[c], e[c]
        try:
            if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(ev):
                if not np.allclose(gv.astype(float), ev.astype(float),
                                   rtol=0, atol=0, equal_nan=True):
                    return (name, f"VALUE-MISMATCH col={c}")
            else:
                if not gv.astype(str).equals(ev.astype(str)):
                    return (name, f"VALUE-MISMATCH col={c}")
        except Exception as ex:
            return (name, f"CMP-ERROR col={c} {ex}")
    return (name, "OK")


def main(sfdir, outdir, budget, only=()):
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d))
                   and (not only or d in only))
    bad = 0
    ok = 0
    slow = []
    for name in names:
        p = mp.Pool(1)
        r = p.map_async(one, [(sfdir, outdir, name, oracles.get(name))])
        try:
            [(n, msg)] = r.get(timeout=budget)
        except mp.TimeoutError:
            p.terminate()
            p.join()
            slow.append(name)
            continue
        p.terminate()
        p.join()
        if msg == "OK" or msg.startswith("ROWS-ONLY"):
            ok += 1
        else:
            bad += 1
            print(f"{n:26s} {msg}", flush=True)
    print(f"OK {ok}; SLOW-SKIP ({len(slow)}): {','.join(slow)}")
    print("PASS" if bad == 0 else f"FAIL ({bad})")
    return bad


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2], int(sys.argv[3]),
                       tuple(sys.argv[4:])) else 0)
