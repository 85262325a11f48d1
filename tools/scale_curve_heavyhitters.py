"""Scale curve for exact heavy hitters (docs/SCALE.md, round 9).

Paired like-work measurement of `heavy_hitters_exact`'s two-pass shape
(per-batch candidates + exact recount of candidates only) vs DuckDB
running the equivalent plain groupBy-HAVING, on a synthetic token
stream with a Zipf-ish head (so real heavy hitters exist) over a long
tail of unique tokens (so the full-domain groupBy actually hurts).

Generates its own parquet under /tmp (one file set per size) — both
engines read the same files and compute the same answer; the result
sets are asserted identical before any timing is reported.

Usage: PYTHONPATH=. python tools/scale_curve_heavyhitters.py [n_tokens]
One size per invocation; let the box cool between sizes (r8 rule).
"""

import os
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
PPM = 2_000
DATA = f"/tmp/scale_tokens_{N}"

from utils_infra_spark.session import get_spark  # noqa: E402

spark = get_spark("scale-curve-heavyhitters")

if not os.path.exists(DATA):
    # head: 20 hot tokens drawn ~1/(r+3); tail: unique singletons.
    # md5-derived choice keeps generation deterministic.
    spark.range(N).selectExpr(
        "CASE WHEN id % 2 = 0 THEN concat('hot', CAST(conv(substring(md5(CAST(id AS STRING)), 1, 4), 16, 10) % 20 AS STRING)) "
        "ELSE concat('tail', CAST(id AS STRING)) END AS tok"
    ).write.mode("overwrite").parquet(DATA)

import duckdb  # noqa: E402

from utils_infra_spark.pipeline.sketch import heavy_hitters_exact  # noqa: E402

toks = spark.read.parquet(DATA)
con = duckdb.connect()
con.execute(f"CREATE VIEW tok AS SELECT tok FROM read_parquet('{DATA}/*.parquet')")
DUCK_SQL = f"""
WITH tot AS (SELECT COUNT(*) AS n FROM tok WHERE tok IS NOT NULL),
cnt AS (SELECT tok, COUNT(*) AS cnt FROM tok WHERE tok IS NOT NULL GROUP BY tok)
SELECT tok, CAST(cnt AS BIGINT) AS cnt FROM cnt, tot WHERE cnt * 1000000 > n * {PPM}
"""

s_runs, d_runs = [], []
for _ in range(3):
    t0 = time.perf_counter()
    st = heavy_hitters_exact(toks, "tok", threshold_ppm=PPM).toArrow()
    s_runs.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    dt = con.execute(DUCK_SQL).arrow()
    d_runs.append(round(time.perf_counter() - t0, 2))
s_set = sorted(zip(st.column("tok").to_pylist(), st.column("cnt").to_pylist()))
d_set = sorted(zip(dt.column("tok").to_pylist(), dt.column("cnt").to_pylist()))
assert s_set == d_set, (len(s_set), len(d_set))
print(f"[hh] n_tokens={N} ppm={PPM} heavy_hitters={len(s_set)}")
print(f"[hh] spark runs: {s_runs} warm: {min(s_runs[1:])}")
print(f"[hh] duck runs:  {d_runs} warm: {min(d_runs[1:])}")
print(f"[hh] spark/duck ratio: {round(min(s_runs[1:]) / min(d_runs[1:]), 2)}")
