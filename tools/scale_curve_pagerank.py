"""Scale curve for integer fixed-point PageRank (docs/SCALE.md, r9).

Paired like-work measurement: Spark `pipeline.graph.pagerank`
(2 iterations) vs DuckDB running the registered oracle's unrolled-CTE
shape on the same synthetic graph — a deterministic preferential-
attachment-ish edge list (each node i links to (i*7+3) % (i+1) and
(i*13+5) % (i+1), so early nodes accumulate degree like a power law).
Rank vectors are asserted bit-identical before timing is reported
(integer fixed-point — any divergence is a bug, not noise).

Usage: PYTHONPATH=. python tools/scale_curve_pagerank.py [n_nodes] [leak|redistribute]
One size per invocation; cool the box between sizes (r8 rule). The
synthetic graph has NO dangling nodes (every node 1..N-1 has an out
edge except node 0 receives only), so `redistribute` mode adds
dangling sinks: 1% of edges are redirected to N+src%100 sink nodes.
"""

import os
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
MODE = sys.argv[2] if len(sys.argv) > 2 else "leak"
DATA = f"/tmp/scale_edges_{N}" if MODE == "leak" else f"/tmp/scale_edges_dang_{N}"

from utils_infra_spark.session import get_spark  # noqa: E402

spark = get_spark("scale-curve-pagerank")

if not os.path.exists(DATA):
    base = spark.range(1, N).selectExpr(
        "CAST(id AS BIGINT) AS src", "(id * 7 + 3) % id AS dst"
    ).union(
        spark.range(1, N).selectExpr("CAST(id AS BIGINT) AS src", "(id * 13 + 5) % id AS dst")
    )
    if MODE == "redistribute":
        # ~1% of edges point at 100 pure sinks (dangling by design)
        base = base.selectExpr(
            "src",
            f"CASE WHEN src % 100 = 7 THEN CAST({N} + (src DIV 100) % 100 AS BIGINT) ELSE dst END AS dst",
        )
    base.where("src <> dst").distinct().write.mode("overwrite").parquet(DATA)

import duckdb  # noqa: E402

from utils_infra_spark.pipeline.graph import pagerank  # noqa: E402

edges = spark.read.parquet(DATA)
con = duckdb.connect()
con.execute(f"CREATE VIEW edges AS SELECT src, dst FROM read_parquet('{DATA}/*.parquet')")
DUCK_SQL_T = """
WITH nodes AS (SELECT DISTINCT src AS node FROM edges
               UNION SELECT DISTINCT dst FROM edges),
nn AS (SELECT COUNT(*) AS n FROM nodes),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) // n AS rank_fp, n FROM nodes, nn),
d1 AS (SELECT COALESCE(SUM(r0.rank_fp), 0) AS dm
       FROM r0 LEFT JOIN deg USING (node) WHERE deg.deg IS NULL),
s1 AS (SELECT r0.node, rank_fp // deg AS share FROM r0 JOIN deg USING (node)),
c1 AS (SELECT e.dst AS node, SUM(share) AS contrib
       FROM edges e JOIN s1 ON e.src = s1.node GROUP BY e.dst),
r1 AS (SELECT r0.node,
              ((15 * (CAST(1000000000000 AS BIGINT) // n)) // 100)
              + ((85 * (COALESCE(c1.contrib, 0) + __D1__)) // 100) AS rank_fp, n
       FROM r0 LEFT JOIN c1 USING (node) __X1__),
d2 AS (SELECT COALESCE(SUM(r1.rank_fp), 0) AS dm
       FROM r1 LEFT JOIN deg USING (node) WHERE deg.deg IS NULL),
s2 AS (SELECT r1.node, rank_fp // deg AS share FROM r1 JOIN deg USING (node)),
c2 AS (SELECT e.dst AS node, SUM(share) AS contrib
       FROM edges e JOIN s2 ON e.src = s2.node GROUP BY e.dst),
r2 AS (SELECT r1.node,
              ((15 * (CAST(1000000000000 AS BIGINT) // n)) // 100)
              + ((85 * (COALESCE(c2.contrib, 0) + __D2__)) // 100) AS rank_fp
       FROM r1 LEFT JOIN c2 USING (node) __X2__)
SELECT node, CAST(rank_fp AS BIGINT) AS rank_fp FROM r2
"""
if MODE == "redistribute":
    DUCK_SQL = (DUCK_SQL_T
                .replace("__D1__", "(d1.dm // n)").replace("__X1__", "CROSS JOIN d1")
                .replace("__D2__", "(d2.dm // n)").replace("__X2__", "CROSS JOIN d2"))
else:
    DUCK_SQL = (DUCK_SQL_T
                .replace("d1 AS (SELECT COALESCE(SUM(r0.rank_fp), 0) AS dm\n       FROM r0 LEFT JOIN deg USING (node) WHERE deg.deg IS NULL),\n", "")
                .replace("d2 AS (SELECT COALESCE(SUM(r1.rank_fp), 0) AS dm\n       FROM r1 LEFT JOIN deg USING (node) WHERE deg.deg IS NULL),\n", "")
                .replace("__D1__", "0").replace("__X1__", "")
                .replace("__D2__", "0").replace("__X2__", ""))

s_runs, d_runs = [], []
for _ in range(3):
    t0 = time.perf_counter()
    st = pagerank(edges, iterations=2, dangling=MODE).toArrow()
    s_runs.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    dt = con.execute(DUCK_SQL).arrow()
    d_runs.append(round(time.perf_counter() - t0, 2))
s_map = sorted(zip(st.column("node").to_pylist(), st.column("rank_fp").to_pylist()))
d_map = sorted(zip(dt.column("node").to_pylist(), dt.column("rank_fp").to_pylist()))
assert s_map == d_map, (len(s_map), len(d_map))
print(f"[pr] n_nodes={N} mode={MODE} edges~{2 * N} nodes={len(s_map)}")
print(f"[pr] spark runs: {s_runs} warm: {min(s_runs[1:])}")
print(f"[pr] duck runs:  {d_runs} warm: {min(d_runs[1:])}")
print(f"[pr] spark/duck ratio: {round(min(s_runs[1:]) / min(d_runs[1:]), 2)}")
