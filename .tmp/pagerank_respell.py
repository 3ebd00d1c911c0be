#!/usr/bin/env python3
"""Prove the MATERIALIZED-pinned q_pagerank oracle is hash-identical
to the committed spelling and time both. Usage: pagerank_respell.py
SFDIR [which: both|new|old]"""
import duckdb, time, os, sys, hashlib

sf = sys.argv[1]
which = sys.argv[2] if len(sys.argv) > 2 else "both"
con = duckdb.connect()
for t in ("orders", "lineitem"):
    p = f"{sf}/{t}.parquet"
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
con.execute("CREATE MACRO r(x, n) AS round(x, n)")

ITER = """r{i} AS {m}(SELECT nodes.node,
    (1 - 0.85) / nn.n + 0.85 * coalesce(c.s, 0) AS rank
  FROM nodes CROSS JOIN nn LEFT JOIN (
    SELECT e.dst AS node, sum(r{p}.rank / deg.d) AS s
    FROM e JOIN deg ON e.src = deg.src JOIN r{p} ON e.src = r{p}.node
    GROUP BY e.dst) c ON nodes.node = c.node)"""

def q(mat):
    m = "MATERIALIZED " if mat else ""
    its = ",\n".join(ITER.format(i=i, p=i - 1, m=m) for i in range(1, 6))
    return f"""WITH e0 AS {m}(
  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), e AS {m}(
  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
), nodes AS {m}(SELECT DISTINCT src AS node FROM e),
nn AS {m}(SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
deg AS {m}(SELECT src, CAST(count(*) AS DOUBLE) AS d
        FROM e GROUP BY src),
r0 AS {m}(SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank
       FROM nodes, nn),
{its}
SELECT node, r(rank * nn.n, 6) AS rank_n
FROM r5, nn ORDER BY node"""

def run(name, sql):
    t0 = time.time()
    rows = con.execute(sql).fetchall()
    dt = time.time() - t0
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    print(f"{name}: {len(rows)} rows, {dt:.1f}s, hash {h}", flush=True)
    return h

if which in ("both", "new"):
    hn = run("NEW(mat)", q(True))
if which in ("both", "old"):
    ho = run("OLD", q(False))
if which == "both":
    print("MATCH" if hn == ho else "MISMATCH")
