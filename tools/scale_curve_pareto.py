"""Scale curve for the 2-D Pareto frontier (docs/SCALE.md, r10).

Paired like-work measurement on CONTINUOUS doubles — the exact input
class whose distinct-x ≈ n made the r9 single-task running max a
one-reducer funnel; the r10 range-partitioned prefix scan must hold
its ratio as n grows. Spark `operators.skyline.pareto_frontier_2d` vs
DuckDB running the registered oracle's shape (keyed max + running max
over distinct x + join back). Row sets asserted identical.

Usage: PYTHONPATH=. python tools/scale_curve_pareto.py [n_rows]
One size per invocation; cool the box between sizes (r8 rule).
"""

import os
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DATA = f"/tmp/scale_pareto_{N}"

from utils_infra_spark.session import get_spark  # noqa: E402

spark = get_spark("scale-curve-pareto")

if not os.path.exists(DATA):
    # continuous x and y from multiplicative hashes — ~all-distinct x
    spark.range(N).selectExpr(
        "CAST(id AS BIGINT) AS rid",
        "CAST((id * 2654435761) % 1000000007 AS DOUBLE) / 1000.0 AS x",
        "CAST((id * 40503 + 7) % 999999937 AS DOUBLE) / 1000.0 AS y",
    ).write.mode("overwrite").parquet(DATA)

import duckdb  # noqa: E402

from utils_infra_spark.operators.skyline import pareto_frontier_2d  # noqa: E402

pts = spark.read.parquet(DATA)
con = duckdb.connect()
con.execute(f"CREATE VIEW pts AS SELECT * FROM read_parquet('{DATA}/*.parquet')")
DUCK_SQL = """
WITH xagg AS (SELECT x, MAX(y) AS ymax FROM pts GROUP BY x),
xr AS (
  SELECT x, ymax,
         MAX(ymax) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS prev
  FROM xagg
)
SELECT p.rid FROM pts p JOIN xr USING (x)
WHERE p.y = xr.ymax AND (xr.prev IS NULL OR xr.prev < p.y)
"""

s_runs, d_runs = [], []
for _ in range(3):
    t0 = time.perf_counter()
    st = pareto_frontier_2d(pts, "x", "y").select("rid").toArrow()
    s_runs.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    dt = con.execute(DUCK_SQL).arrow()
    d_runs.append(round(time.perf_counter() - t0, 2))

s_rows = sorted(st.column("rid").to_pylist())
d_rows = sorted(dt.column("rid").to_pylist())
assert s_rows == d_rows, (len(s_rows), len(d_rows))
print(f"[pareto] n_rows={N} frontier={len(s_rows)}")
print(f"[pareto] spark runs: {s_runs} warm: {min(s_runs[1:])}")
print(f"[pareto] duck runs:  {d_runs} warm: {min(d_runs[1:])}")
print(f"[pareto] spark/duck ratio: {round(min(s_runs[1:]) / min(d_runs[1:]), 2)}")
