"""Scale curve for weighted_quantile_bracketed on a CONTINUOUS value
domain (distinct ≈ rows) — the exact regime where the exact
weighted_quantile's per-group distinct-value window funnels through
one task and the bracketed swap-in exists.

Paired like-work: Spark runs the engine operator; DuckDB runs the
registered oracle shape (weighted histogram bins → cum/total windows
→ argmin bracket). Brackets asserted identical before timing; the
exact weighted quantile is additionally asserted to LIE INSIDE the
Spark bracket at the smallest size (the contains-exact contract).

Usage: PYTHONPATH=. python tools/scale_curve_wquantile_bracket.py [n_rows]
One size per invocation; cool the box between sizes (r8 rule).
"""

import os
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
DATA = f"/tmp/scale_wqb_{N}"
BIN = 1_000_000  # 1.0-wide brackets in micro space

import duckdb  # noqa: E402

from utils_infra_spark.operators.aggregations import weighted_quantile_bracketed  # noqa: E402
from utils_infra_spark.session import get_spark  # noqa: E402

spark = get_spark("scale-curve-wqb")

if not os.path.exists(DATA):
    # continuous doubles: ~all-distinct values per group
    spark.range(N).selectExpr(
        "CAST(id % 8 AS STRING) AS g",
        "CAST((id * 2654435761) % 999999937 AS DOUBLE) / 9973.0 AS v",
        "CAST(1 + (id * 40503) % 9 AS INT) AS w",
    ).write.mode("overwrite").parquet(DATA)

rows = spark.read.parquet(DATA)
con = duckdb.connect()
con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{DATA}/*.parquet')")
DUCK = f"""
WITH d AS (
  SELECT g, CAST(FLOOR(v * 1000000 + 0.5) AS BIGINT) AS vm, w
  FROM t WHERE v IS NOT NULL AND w > 0
), b AS (
  SELECT g, (vm - ((vm % {BIN}) + {BIN}) % {BIN}) // {BIN} AS bin, SUM(w) AS ws
  FROM d GROUP BY 1, 2
), c AS (
  SELECT g, bin,
         SUM(ws) OVER (PARTITION BY g ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(ws) OVER (PARTITION BY g) AS total
  FROM b
)
SELECT g, MIN(bin) AS bin FROM c WHERE 2 * cum >= total GROUP BY g
"""

s_runs, d_runs = [], []
st = dt = None
for _ in range(3):
    t0 = time.perf_counter()
    st = weighted_quantile_bracketed(rows, ["g"], "v", "w", bin_micro=BIN).toArrow()
    s_runs.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    dt = con.execute(DUCK).arrow()
    d_runs.append(round(time.perf_counter() - t0, 2))

s_map = dict(zip(st.column("g").to_pylist(), (int(x) for x in st.column("bin").to_pylist())))
d_map = dict(zip(dt.column("g").to_pylist(), (int(x) for x in dt.column("bin").to_pylist())))
assert s_map == d_map, (s_map, d_map)
print(f"[wqb] n_rows={N} groups={len(s_map)} (brackets engine-identical)")
print(f"[wqb] spark runs: {s_runs} warm: {min(s_runs[1:])}")
print(f"[wqb] duck runs:  {d_runs} warm: {min(d_runs[1:])}")
print(f"[wqb] spark/duck ratio: {round(min(s_runs[1:]) / min(d_runs[1:]), 2)}")
