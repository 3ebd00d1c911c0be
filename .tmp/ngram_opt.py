import duckdb, time, os, sys, hashlib
sf = sys.argv[1]; which = sys.argv[2] if len(sys.argv)>2 else "both"
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
), ub AS MATERIALIZED (SELECT max(i) AS u FROM idx
), bs AS MATERIALIZED (
  SELECT e.doc_id, CAST(count(*) AS BIGINT) AS nsh,
    bitstring_agg(x.i) AS b
  FROM ex e JOIN idx x USING (sh) GROUP BY e.doc_id)"""
NEW = COMMON + r"""
SELECT id_a, id_b, r(jaccard, 4) AS jaccard FROM (
  SELECT id_a, id_b,
    CAST(inter AS DOUBLE) / (nsh_a + nsh_b - inter) AS jaccard
  FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.nsh AS nsh_a,
      b.nsh AS nsh_b, bit_count(a.b & b.b) AS inter
    FROM bs a JOIN bs b ON a.doc_id < b.doc_id
    WHERE a.nsh >= 0.8 * b.nsh AND b.nsh >= 0.8 * a.nsh))
WHERE jaccard >= 0.8 ORDER BY id_a, id_b"""
def run(name, q):
    t0=time.time(); rows=con.execute(q).fetchall(); dt=time.time()-t0
    h=hashlib.md5(repr(rows).encode()).hexdigest()
    print(f"{name}: {len(rows)} rows, {dt:.1f}s, hash {h}", flush=True)
run("NEWOPT", NEW)
