"""Scale curve for the HyperLogLog sketch (docs/SCALE.md).

Paired like-work measurement of `hll_distinct_users_by_type`'s shape —
md5 register derivation → (key, 64)-bounded max aggregate → integer
harmonic estimate — Spark (`pipeline.sketch.hll_distinct`) vs DuckDB
running the registered oracle construction, on a generated events-like
table (seed 42, `n` rows, `n/20` distinct users across 8 types, zipf-ish
type skew). Also reports the estimate's relative error per type vs the
exact count (the ~1.04/sqrt(64) ≈ 13% sigma regime).

Usage: PYTHONPATH=. python tools/scale_curve_hll.py [n_rows] [files]
"""

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DATA = f"/tmp/scale_events_{N}"

if not os.path.exists(DATA):
    tmp = DATA + ".tmp"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    os.makedirs(tmp)
    rng = np.random.default_rng(42)
    per = (N + FILES - 1) // FILES
    written = 0
    for f in range(FILES):
        if written >= N:
            break
        k = min(per, N - written)
        users = rng.integers(0, max(N // 20, 8), size=k)
        types = rng.choice(
            [f"t{i}" for i in range(8)], size=k, p=[0.4, 0.2, 0.1, 0.1, 0.08, 0.06, 0.04, 0.02]
        )
        pq.write_table(
            pa.table({"event_type": types, "user_id": users.astype("int64")}),
            f"{tmp}/part-{f:03d}.parquet",
        )
        written += k
    os.rename(tmp, DATA)

import duckdb

from utils_infra_spark.pipeline.sketch import hll_distinct
from utils_infra_spark.queries import REGISTRY, _load
from utils_infra_spark.session import get_spark

_load()
spark = get_spark("scale-curve-hll")
ev = spark.read.parquet(DATA)

con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{DATA}/*.parquet')")
DUCK_SQL = REGISTRY["hll_distinct_users_by_type"].oracle


def spark_query():
    import pyspark.sql.functions as F

    est = hll_distinct(ev, ["event_type"], "user_id")
    exact = (
        ev.where("user_id IS NOT NULL")
        .groupBy("event_type")
        .agg(F.expr("COUNT(DISTINCT user_id) AS exact_distinct"))
    )
    return est.join(exact, "event_type")


s_runs, d_runs = [], []
for _ in range(3):
    t0 = time.perf_counter()
    st = spark_query().toArrow()
    s_runs.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    dt = con.execute(DUCK_SQL).arrow()
    d_runs.append(round(time.perf_counter() - t0, 2))
assert st.num_rows == dt.num_rows
rows = st.to_pylist()
errs = [abs(r["hll_estimate"] - r["exact_distinct"]) / r["exact_distinct"] for r in rows]
# cross-engine value identity of the estimates (the deterministic-sketch claim)
assert sorted((r["event_type"], r["hll_estimate"]) for r in rows) == sorted(
    (r["event_type"], r["hll_estimate"]) for r in dt.to_pylist()
)
print(f"[hll] n_rows={N} types={st.num_rows} max_rel_err={max(errs):.3f} mean={sum(errs)/len(errs):.3f}")
print(f"[hll] spark runs: {s_runs} warm: {min(s_runs[1:])}")
print(f"[hll] duck runs:  {d_runs} warm: {min(d_runs[1:])}")
print(f"[hll] spark/duck ratio: {round(min(s_runs[1:]) / min(d_runs[1:]), 2)}")
