"""Scale curve for the exact weighted median (docs/SCALE.md, r10
mid-session).

Paired like-work measurement: Spark
`operators.aggregations.weighted_median` (distinct-(group, value)
collapse + one-exchange windows) vs DuckDB running the registered
oracle shape (grouped weight sums + cumulative window + pick). Group
medians asserted identical before timing counts anything. The value
domain is intentionally wide (~1e6 distinct micros per group) — the
regime where the distinct-value collapse matters.

Usage: PYTHONPATH=. python tools/scale_curve_wmedian.py [n_rows]
One size per invocation; cool the box between sizes (r8 rule).
"""

import os
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DATA = f"/tmp/scale_wmedian_{N}"

from utils_infra_spark.session import get_spark  # noqa: E402

spark = get_spark("scale-curve-wmedian")

if not os.path.exists(DATA):
    spark.range(N).selectExpr(
        "CAST(id % 16 AS STRING) AS g",
        "CAST((id * 2654435761) % 1000003 AS BIGINT) AS v",
        "CAST(1 + (id * 40503) % 9 AS BIGINT) AS w",
    ).write.mode("overwrite").parquet(DATA)

import duckdb  # noqa: E402

from utils_infra_spark.operators.aggregations import weighted_median  # noqa: E402

rows = spark.read.parquet(DATA)
con = duckdb.connect()
con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{DATA}/*.parquet')")
DUCK_SQL = """
WITH d AS (SELECT g, v, SUM(w) AS wsum FROM t WHERE v IS NOT NULL AND w > 0 GROUP BY g, v),
     c AS (SELECT g, v,
                  SUM(wsum) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
                  SUM(wsum) OVER (PARTITION BY g) AS total FROM d)
SELECT g, MIN(CASE WHEN 2*cum >= total THEN v END) AS wm FROM c GROUP BY g
"""

s_runs, d_runs = [], []
st = dt = None
for _ in range(3):
    t0 = time.perf_counter()
    st = weighted_median(rows, ["g"], "v", "w", alias="wm").toArrow()
    s_runs.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    dt = con.execute(DUCK_SQL).arrow()
    d_runs.append(round(time.perf_counter() - t0, 2))

s_map = dict(zip(st.column("g").to_pylist(), (int(x) for x in st.column("wm").to_pylist())))
d_map = dict(zip(dt.column("g").to_pylist(), (int(x) for x in dt.column("wm").to_pylist())))
assert s_map == d_map, (s_map, d_map)
print(f"[wmedian] n_rows={N} groups={len(s_map)}")
print(f"[wmedian] spark runs: {s_runs} warm: {min(s_runs[1:])}")
print(f"[wmedian] duck runs:  {d_runs} warm: {min(d_runs[1:])}")
print(f"[wmedian] spark/duck ratio: {round(min(s_runs[1:]) / min(d_runs[1:]), 2)}")
