import duckdb, time, os, sys
sf = sys.argv[1]
con = duckdb.connect()
p = f"{sf}/documents.parquet"
src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet({src})")
def t(name, q):
    t0=time.time(); r=con.execute(q).fetchall(); print(f"{name}: {r[0]}  {time.time()-t0:.1f}s", flush=True)
con.execute(r"""CREATE TABLE ex AS
  WITH d AS (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
      '[[:punct:]]', ' ', 'g'), '\s+', ' ', 'g')) AS t FROM documents),
  sh AS (SELECT doc_id, list_distinct(
      [substr(t, g, 5) for g in range(1, greatest(length(t) - 3, 2))]) AS shingles FROM d)
  SELECT doc_id, unnest(shingles) AS sh FROM sh""")
t("ex rows", "SELECT count(*) FROM ex")
t("docs", "SELECT count(DISTINCT doc_id) FROM ex")
con.execute("""CREATE TABLE df AS SELECT sh, count(*) AS dfc FROM ex GROUP BY sh""")
t("distinct shingles", "SELECT count(*) FROM df")
t0=time.time()
con.execute("""CREATE TABLE pref AS
  SELECT doc_id, sh FROM (
    SELECT e.doc_id, e.sh,
      row_number() OVER (PARTITION BY e.doc_id ORDER BY f.dfc, e.sh) AS rn,
      count(*) OVER (PARTITION BY e.doc_id) AS nsh
    FROM ex e JOIN df f USING (sh))
  WHERE rn <= nsh - (4 * nsh + 4) // 5 + 1""")
print(f"pref build {time.time()-t0:.1f}s", flush=True)
t("pref rows", "SELECT count(*) FROM pref")
t("cand mass (sum cnt^2 over pref shingles)",
  "SELECT sum(c*c) FROM (SELECT count(*) AS c FROM pref GROUP BY sh)")
t("worst prefix shingle", "SELECT max(c) FROM (SELECT count(*) AS c FROM pref GROUP BY sh)")
