#!/usr/bin/env python3
"""Dev harness for the q68 IVF-ANN oracle: run the candidate DuckDB SQL
against a testdata SF dir and diff it with the Spark result parquet
dumped by graft.Verify. Not part of the gate — tools/check.py is."""
import sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = "/tmp/graft_verify_" + SF.rstrip("/").split("/")[-1]

SQL = r"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list, v AS c
  FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 8)),
s1 AS (
  SELECT e.vec_id, e.v, n.list,
    CASE WHEN n.nrm = 0 THEN 0.0
      ELSE list_sum(list_transform(range(1, 65), i -> e.v[i] * n.c[i])) / n.nrm END AS s
  FROM emb e CROSS JOIN (
    SELECT list, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS nrm FROM c0) n),
a1 AS (
  SELECT vec_id, v, list FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS rn
    FROM s1) WHERE rn = 1),
c1 AS (
  SELECT c0.list, coalesce(nw.c, c0.c) AS c
  FROM c0 LEFT JOIN (
    SELECT list, list(m ORDER BY pos) AS c FROM (
      SELECT a.list AS list, t.i AS pos, avg(a.v[t.i]) AS m
      FROM a1 a, range(1, 65) t(i)
      GROUP BY a.list, t.i)
    GROUP BY list) nw USING (list)),
s2 AS (
  SELECT e.vec_id, e.v, n.list,
    CASE WHEN n.nrm = 0 THEN 0.0
      ELSE list_sum(list_transform(range(1, 65), i -> e.v[i] * n.c[i])) / n.nrm END AS s
  FROM emb e CROSS JOIN (
    SELECT list, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS nrm FROM c1) n),
a2 AS (
  SELECT vec_id, v, list FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS rn
    FROM s2) WHERE rn = 1),
c2 AS (
  SELECT c1.list, coalesce(nw.c, c1.c) AS c
  FROM c1 LEFT JOIN (
    SELECT list, list(m ORDER BY pos) AS c FROM (
      SELECT a.list AS list, t.i AS pos, avg(a.v[t.i]) AS m
      FROM a2 a, range(1, 65) t(i)
      GROUP BY a.list, t.i)
    GROUP BY list) nw USING (list)),
s3 AS (
  SELECT e.vec_id, e.v, n.list,
    CASE WHEN n.nrm = 0 THEN 0.0
      ELSE list_sum(list_transform(range(1, 65), i -> e.v[i] * n.c[i])) / n.nrm END AS s
  FROM emb e CROSS JOIN (
    SELECT list, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS nrm FROM c2) n),
a3 AS (
  SELECT vec_id AS neighbor_id, v AS cv, list FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS rn
    FROM s3) WHERE rn = 1),
p3 AS (
  SELECT vec_id AS query_id, v AS qv, list FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS rn
    FROM s3 WHERE vec_id < 5) WHERE rn <= 3),
scored AS (
  SELECT p.query_id, a.neighbor_id,
    list_sum(list_transform(range(1, 65), i -> p.qv[i] * a.cv[i])) /
    (sqrt(list_sum(list_transform(p.qv, x -> x * x))) *
     sqrt(list_sum(list_transform(a.cv, x -> x * x)))) AS cosine
  FROM p3 p JOIN a3 a USING (list)
  WHERE a.neighbor_id <> p.query_id)
SELECT query_id, neighbor_id, round(cosine, 4) AS cosine, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored)
WHERE rank <= 5 ORDER BY query_id, rank
"""

con = duckdb.connect()
con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
oracle = con.sql(SQL).fetchall()
spark = con.sql(
    f"SELECT query_id, neighbor_id, cosine, rank FROM '{OUT}/q68_ivf_knn/*.parquet' "
    "ORDER BY query_id, rank").fetchall()
print(f"oracle rows: {len(oracle)}  spark rows: {len(spark)}")
ok = True
for i, (o, s) in enumerate(zip(oracle, spark)):
    if tuple(o) != tuple(s):
        ok = False
        print(f"MISMATCH row {i}: oracle={o} spark={s}")
if len(oracle) != len(spark):
    ok = False
print("MATCH" if ok else "FAIL")
