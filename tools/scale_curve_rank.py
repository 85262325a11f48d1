"""Scale curve for the distributed global rank + sorted-neighborhood
blocking (docs/SCALE.md, r10 mid-session).

Paired like-work measurement: Spark `operators.ranking.global_rank`
(two-level value-binned row_number — the thing a plain unpartitioned
window would funnel through ONE task) vs DuckDB's native window
row_number over the same parquet, then the sorted-neighborhood pair
count at window w=8 both ways. Rank maps asserted identical before
timing counts anything.

Usage: PYTHONPATH=. python tools/scale_curve_rank.py [n_rows]
One size per invocation; cool the box between sizes (r8 rule).
"""

import os
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
W = 8
DATA = f"/tmp/scale_rank_{N}"

from utils_infra_spark.session import get_spark  # noqa: E402

spark = get_spark("scale-curve-rank")

if not os.path.exists(DATA):
    # ~all-distinct continuous sort key — the adversarial input for a
    # one-reducer sort, the bland one for the binned rank
    spark.range(N).selectExpr(
        "CAST(id AS BIGINT) AS rid",
        "CAST((id * 2654435761) % 1000000007 AS DOUBLE) / 1000.0 AS k",
    ).write.mode("overwrite").parquet(DATA)

import duckdb  # noqa: E402

from utils_infra_spark.operators.ranking import global_rank, sorted_neighborhood_pairs  # noqa: E402

pts = spark.read.parquet(DATA)
con = duckdb.connect()
con.execute(f"CREATE VIEW pts AS SELECT * FROM read_parquet('{DATA}/*.parquet')")

# correctness first: the binned rank IS the window rank
st = global_rank(pts, ["k", "rid"], rank_col="rnk").selectExpr("rid", "rnk").toArrow()
dt = con.execute("SELECT rid, row_number() OVER (ORDER BY k, rid) AS rnk FROM pts").arrow()
s_map = dict(zip(st.column("rid").to_pylist(), st.column("rnk").to_pylist()))
d_map = dict(zip(dt.column("rid").to_pylist(), dt.column("rnk").to_pylist()))
assert s_map == d_map, "rank mismatch"
del s_map, d_map, st, dt

DUCK_PAIRS = f"""
WITH r AS (SELECT rid, row_number() OVER (ORDER BY k, rid) AS rnk FROM pts)
SELECT COUNT(*) AS n FROM r a JOIN r b ON b.rnk > a.rnk AND b.rnk <= a.rnk + {W}
"""

s_runs, d_runs = [], []
s_n = d_n = None
for _ in range(3):
    t0 = time.perf_counter()
    s_n = sorted_neighborhood_pairs(pts, ["k"], "rid", window=W, carry_cols=["rid"]).count()
    s_runs.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    d_n = con.execute(DUCK_PAIRS).fetchone()[0]
    d_runs.append(round(time.perf_counter() - t0, 2))

assert s_n == d_n, (s_n, d_n)
print(f"[rank] n_rows={N} w={W} pairs={s_n}")
print(f"[rank] spark runs: {s_runs} warm: {min(s_runs[1:])}")
print(f"[rank] duck runs:  {d_runs} warm: {min(d_runs[1:])}")
print(f"[rank] spark/duck ratio: {round(min(s_runs[1:]) / min(d_runs[1:]), 2)}")
