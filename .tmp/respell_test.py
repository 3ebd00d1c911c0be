#!/usr/bin/env python3
"""Prove the prefix-filtered respell of dedup_ngram_verified is
hash-identical to the committed all-pairs bitstring oracle at a given
SF, and time both. Usage: respell_test.py SFDIR [which]"""
import duckdb, time, os, sys

sf = sys.argv[1]
which = sys.argv[2] if len(sys.argv) > 2 else "both"
con = duckdb.connect()
p = f"{sf}/documents.parquet"
src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet({src})")
con.execute("CREATE MACRO r(x, n) AS round(x, n)")

COMMON = r"""WITH d AS MATERIALIZED (
  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
    '[[:punct:]]', ' ', 'g'), '\s+', ' ', 'g')) AS t
  FROM documents
), sh AS MATERIALIZED (
  SELECT doc_id, list_distinct(
    [substr(t, g, 5) for g in range(1, greatest(length(t) - 3, 2))]) AS shingles
  FROM d
), ex AS MATERIALIZED (SELECT doc_id, unnest(shingles) AS sh FROM sh
), idx AS MATERIALIZED (
  SELECT sh, CAST(row_number() OVER (ORDER BY sh) - 1 AS INTEGER) AS i
  FROM (SELECT DISTINCT sh FROM ex)
), bs AS MATERIALIZED (
  SELECT e.doc_id, CAST(count(*) AS BIGINT) AS nsh,
    bitstring_agg(x.i, 0, 65535) AS b
  FROM ex e JOIN idx x USING (sh) GROUP BY e.doc_id)"""

OLD = COMMON + r"""
SELECT id_a, id_b, r(jaccard, 4) AS jaccard FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
    CAST(bit_count(a.b & b.b) AS DOUBLE) /
      (a.nsh + b.nsh - bit_count(a.b & b.b)) AS jaccard
  FROM bs a JOIN bs b ON a.doc_id < b.doc_id
  WHERE a.nsh >= 0.8 * b.nsh AND b.nsh >= 0.8 * a.nsh)
WHERE jaccard >= 0.8 ORDER BY id_a, id_b"""

# prefix filter (AllPairs/PPJoin): order shingles ascending by
# (global df, sh); alpha = ceil(0.8*nsh) in integer form; a J>=0.8
# pair must share a shingle within both docs' first nsh-alpha+1
NEW = COMMON + r""",
df AS MATERIALIZED (SELECT sh, count(*) AS dfc FROM ex GROUP BY sh),
pref AS MATERIALIZED (
  SELECT doc_id, sh FROM (
    SELECT e.doc_id, e.sh,
      row_number() OVER (PARTITION BY e.doc_id ORDER BY f.dfc, e.sh) AS rn,
      count(*) OVER (PARTITION BY e.doc_id) AS nsh
    FROM ex e JOIN df f USING (sh))
  WHERE rn <= nsh - (4 * nsh + 4) // 5 + 1
), cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM pref a JOIN pref b ON a.sh = b.sh AND a.doc_id < b.doc_id)
SELECT id_a, id_b, r(jaccard, 4) AS jaccard FROM (
  SELECT c.id_a, c.id_b,
    CAST(bit_count(a.b & b.b) AS DOUBLE) /
      (a.nsh + b.nsh - bit_count(a.b & b.b)) AS jaccard
  FROM cand c JOIN bs a ON a.doc_id = c.id_a
              JOIN bs b ON b.doc_id = c.id_b
  WHERE a.nsh >= 0.8 * b.nsh AND b.nsh >= 0.8 * a.nsh)
WHERE jaccard >= 0.8 ORDER BY id_a, id_b"""

def run(name, q):
    t0 = time.time()
    rows = con.execute(q).fetchall()
    dt = time.time() - t0
    import hashlib
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    print(f"{name}: {len(rows)} rows, {dt:.1f}s, hash {h}", flush=True)
    return h

if which in ("both", "new"):
    hn = run("NEW", NEW)
if which in ("both", "old"):
    ho = run("OLD", OLD)
if which == "both":
    print("MATCH" if hn == ho else "MISMATCH")
