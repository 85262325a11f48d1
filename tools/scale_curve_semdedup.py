"""Scale curve for SemDeDup (docs/SCALE.md).

Paired like-work measurement of `semdedup_embeddings`'s full shape —
IVF coarse assignment (broadcast literal codebook) → per-bucket Gram
kernel pairs at cosine ≥ 0.4 → large-star/small-star connected
components → min-id representative — Spark (the registered builder)
vs DuckDB running the registered oracle (recursive-CTE reachability)
on a generated embeddings table: `n` 64-dim vectors, seed 7, 15%
planted near-duplicates (base + N(0, 0.03) noise → cosine ≈ 0.999)
over an 85% unique gaussian population, so the component structure is
non-trivial at every size.

Usage: PYTHONPATH=. python tools/scale_curve_semdedup.py [n_vecs] [files]
"""

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 16
DIM = 64
DATA = f"/tmp/scale_emb_{N}"

if not os.path.exists(f"{DATA}/embeddings.parquet"):
    os.makedirs(DATA, exist_ok=True)
    rng = np.random.default_rng(7)
    base = rng.standard_normal((N, DIM)).astype(np.float32)
    # plant near-dups: each of the last 15% copies a random earlier
    # vector plus small noise
    n_dup = int(N * 0.15)
    src = rng.integers(0, N - n_dup, size=n_dup)
    base[N - n_dup :] = base[src] + rng.normal(0, 0.03, (n_dup, DIM)).astype(np.float32)
    # shard across FILES parquet files so the Spark scan's split
    # count reflects the layout a real corpus would have
    os.makedirs(f"{DATA}/embeddings.parquet", exist_ok=True)
    per = (N + FILES - 1) // FILES
    for f in range(FILES):
        lo, hi = f * per, min((f + 1) * per, N)
        if lo >= hi:
            break
        pq.write_table(
            pa.table(
                {
                    "vec_id": np.arange(lo, hi, dtype=np.int64),
                    "embedding": list(base[lo:hi]),
                }
            ),
            f"{DATA}/embeddings.parquet/part-{f:03d}.parquet",
        )

import duckdb

from utils_infra_spark.queries import REGISTRY, _load
from utils_infra_spark.session import get_spark

_load()
spark = get_spark("scale-curve-semdedup")
q = REGISTRY["semdedup_embeddings"]

con = duckdb.connect()
con.execute(
    f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{DATA}/embeddings.parquet/*.parquet')"
)

s_runs, d_runs = [], []
st = dt = None
for _ in range(3):
    t0 = time.perf_counter()
    st = q.fn(spark, DATA).toArrow()
    s_runs.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    dt = con.execute(q.oracle).arrow()
    d_runs.append(round(time.perf_counter() - t0, 2))

assert st.num_rows == dt.num_rows == N
cols = sorted(st.column_names)
sp = sorted(tuple(r[c] for c in cols) for r in st.to_pylist())
du = sorted(tuple(r[c] for c in cols) for r in dt.to_pylist())
assert sp == du, "cross-engine component structure differs"
n_reps = sum(1 for r in st.to_pylist() if r["is_representative"])
print(f"[semdedup] n={N} components={n_reps} dropped={N - n_reps}")
print(f"[semdedup] spark runs: {s_runs} warm: {min(s_runs[1:])}")
print(f"[semdedup] duck runs:  {d_runs} warm: {min(d_runs[1:])}")
print(f"[semdedup] spark/duck ratio: {round(min(s_runs[1:]) / min(d_runs[1:]), 2)}")
