#!/usr/bin/env python3
"""Validate the q58 DuckDB SQL twin against the numpy float32 reference
(tools/q58_proto.py) before registering it in Sources.scala."""
import sys
import duckdb
from q58_proto import pairs

N = int(sys.argv[1]) if len(sys.argv) > 1 else 90

SQL = f"""
WITH RECURSIVE
ids AS (
  SELECT CAST(i AS BIGINT) AS id, CAST(i AS BIGINT) AS seed
  FROM range(0, {N}) t(i) WHERE i % 3 = 0
  UNION ALL
  SELECT CAST(i + 1000000 AS BIGINT), CAST(i AS BIGINT)
  FROM range(0, {N}) t(i) WHERE i % 21 = 0),
seeds AS (SELECT DISTINCT seed FROM ids),
st(seed, p, s) AS (
  SELECT seed, -1,
         CAST(xor(seed, 25214903917) % 281474976710656 AS HUGEINT)
  FROM seeds
  UNION ALL
  SELECT seed, p + 1,
         CAST((s * 25214903917 + 11) % 281474976710656 AS HUGEINT)
  FROM st WHERE p < 1023),
px AS (SELECT seed, p, CAST(s // 16777216 AS BIGINT) AS rgb
       FROM st WHERE p >= 0),
lum AS (SELECT seed, p,
  CAST(
    CAST(
      CAST(CAST(CAST(0.299 AS FLOAT) * ((rgb >> 16) & 255) AS FLOAT)
         + CAST(CAST(0.587 AS FLOAT) * ((rgb >> 8) & 255) AS FLOAT) AS FLOAT)
      + CAST(CAST(0.114 AS FLOAT) * (rgb & 255) AS FLOAT) AS FLOAT)
    / CAST(255.0 AS FLOAT) AS FLOAT) AS l
  FROM px),
feat AS (
  SELECT seed, p % 64 AS j,
         CAST(list_reduce(list(l ORDER BY p),
                          (a, x) -> CAST(a + x AS FLOAT))
              / CAST(16.0 AS FLOAT) AS FLOAT) AS f
  FROM lum GROUP BY seed, p % 64),
mh AS (
  SELECT seed,
         list_reduce(list(CAST(f AS DOUBLE) ORDER BY j), (a, x) -> a + x)
           / 64.0 AS mean
  FROM feat GROUP BY seed),
bits AS (
  SELECT i.id, f.j, (CAST(f.f AS DOUBLE) > m.mean) AS bit
  FROM feat f JOIN mh m USING (seed) JOIN ids i USING (seed))
SELECT a.id AS id1, b.id AS id2,
       CAST(sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS INT) AS hamming
FROM bits a JOIN bits b ON a.j = b.j AND a.id < b.id
GROUP BY a.id, b.id
HAVING sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) <= 7
ORDER BY 1, 2
"""

got = duckdb.sql(SQL).fetchall()
want = pairs(N)
print(f"sql rows={len(got)} ref rows={len(want)}")
assert [tuple(r) for r in got] == want, (got[:10], want[:10])
print("MATCH")
