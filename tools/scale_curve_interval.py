"""Scale curve for interval coalescing (docs/SCALE.md, r10).

Paired like-work measurement: Spark `operators.temporal
.interval_coalesce` vs DuckDB running the registered oracle's span
SQL on the same synthetic interval set — per-key interval soups with
deliberately NON-monotone ends (every 7th interval is long, swallowing
later short ones — the case gap sessionization gets wrong). Outputs
asserted identical before timings are reported.

Usage: PYTHONPATH=. python tools/scale_curve_interval.py [n_rows]
One size per invocation; cool the box between sizes (r8 rule).
"""

import os
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DATA = f"/tmp/scale_intervals_{N}"

from utils_infra_spark.session import get_spark  # noqa: E402

spark = get_spark("scale-curve-interval")

if not os.path.exists(DATA):
    # ~200 intervals per key; start jitter from a multiplicative hash,
    # length 3 (short) or 40 (long, every 7th row) so spans overlap,
    # touch, and swallow — all integer, reproducible from the code
    spark.range(N).selectExpr(
        "CAST(id AS BIGINT) AS event_id",
        f"CAST(id % {max(N // 200, 1)} AS BIGINT) AS user_id",
        "CAST((id * 2654435761) % 10000 AS BIGINT) AS s",
        "CAST((id * 2654435761) % 10000 + CASE WHEN id % 7 = 0 THEN 40 ELSE 3 END AS BIGINT) AS e",
    ).write.mode("overwrite").parquet(DATA)

import duckdb  # noqa: E402

from utils_infra_spark.operators.temporal import interval_coalesce  # noqa: E402

iv = spark.read.parquet(DATA)
con = duckdb.connect()
con.execute(f"CREATE VIEW iv AS SELECT * FROM read_parquet('{DATA}/*.parquet')")
DUCK_SQL = """
WITH flagged AS (
  SELECT user_id, s, e,
         CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_span,
         event_id
  FROM iv
),
spans AS (
  SELECT user_id, s, e,
         CAST(SUM(new_span) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS span_id
  FROM flagged
)
SELECT user_id, span_id, MIN(s) AS span_start, MAX(e) AS span_end,
       COUNT(*) AS n_intervals
FROM spans GROUP BY user_id, span_id
"""

s_runs, d_runs = [], []
for _ in range(3):
    t0 = time.perf_counter()
    st = interval_coalesce(iv, "user_id", "s", "e", "event_id").toArrow()
    s_runs.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    dt = con.execute(DUCK_SQL).arrow()
    d_runs.append(round(time.perf_counter() - t0, 2))

s_rows = sorted(zip(*[st.column(c).to_pylist() for c in sorted(st.column_names)]))
d_rows = sorted(zip(*[dt.column(c).to_pylist() for c in sorted(dt.column_names)]))
assert s_rows == d_rows, (len(s_rows), len(d_rows))
print(f"[interval] n_rows={N} spans={len(s_rows)}")
print(f"[interval] spark runs: {s_runs} warm: {min(s_runs[1:])}")
print(f"[interval] duck runs:  {d_runs} warm: {min(d_runs[1:])}")
print(f"[interval] spark/duck ratio: {round(min(s_runs[1:]) / min(d_runs[1:]), 2)}")
