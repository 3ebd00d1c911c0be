#!/usr/bin/env python3
"""Unbudgeted deep-check: run the named queries' DuckDB oracles to
COMPLETION (hours if needed) and record per-query wall + verdict, so
the cross-SF gate's SLOW-SKIPs get decided instead of staying
unknown (round-12 verdict item 2). Same comparator as the driver's
gate (imported from check_oracle.py — one implementation).
Usage: deep_check.py SFDIR OUTDIR RESULT_JSON query [query...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_oracle


def main(sfdir, outdir, result_path, names):
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)
    if not names:
        print("deep_check: no query names given", file=sys.stderr)
        return 1
    results = {}
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            print(f"deep_check: no oracle SQL for {name!r} in "
                  f"{outdir}/oracle_sql.json", file=sys.stderr)
            return 1
        t0 = time.time()
        con = None
        try:
            con = check_oracle.connect(sfdir)
            status, msg = check_oracle.compare_query(con, outdir, name, sql)
        except Exception as e:
            status, msg = "FAIL", f"WORKER-ERROR {str(e)[:200]}"
        finally:
            if con is not None:
                con.close()
        wall = round(time.time() - t0, 1)
        results[name] = {"status": status, "oracle_wall_sec": wall,
                         "detail": msg}
        print(f"{name:26s} {status:9s} {wall:9.1f}s  {msg}", flush=True)
        # write incrementally: a killed run still records what finished
        with open(result_path, "w") as f:
            json.dump(results, f, indent=1)
    return 0 if all(r["status"] in ("OK", "ROWS-ONLY")
                    for r in results.values()) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4:]))
