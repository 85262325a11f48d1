"""Reproduce the Python-kernel amortization curve in docs/SCALE.md.

Paired Spark-kernel vs DuckDB brute-force cosine top-k on a generated
64-dim embedding corpus (seed 42), bench.py's methodology: fresh
QueryExecution per run, Arrow delivery on both engines, alternating
(Spark, DuckDB) runs, warm = min of the non-cold runs. Production
session regime (AQE on, 32 shuffle partitions — no tiny-input tuning).

Usage: PYTHONPATH=. python tools/scale_curve_topk.py [rows] [files]
(defaults 1_000_000 rows / 32 files; data under /tmp/scale_emb_<rows>)
"""
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 32
if N % FILES != 0:
    sys.exit(f"rows ({N}) must be divisible by files ({FILES}) so the corpus is exactly N rows")
D = 64
DATA = f"/tmp/scale_emb_{N}"

if not os.path.exists(DATA):
    # generate into a temp dir and rename so an interrupted run can
    # never leave a partial corpus that later runs silently reuse
    tmp = DATA + ".tmp"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    os.makedirs(tmp)
    rng = np.random.default_rng(42)
    per = N // FILES
    for f in range(FILES):
        ids = np.arange(f * per, (f + 1) * per, dtype=np.int64)
        mat = rng.standard_normal((per, D)).astype(np.float32)
        flat = pa.array(mat.reshape(-1))
        tbl = pa.table(
            {
                "vec_id": ids,
                "embedding": pa.FixedSizeListArray.from_arrays(flat, D).cast(pa.list_(pa.float32())),
            }
        )
        pq.write_table(tbl, f"{tmp}/part{f:02d}.parquet")
    os.rename(tmp, DATA)
    print(f"generated {N} rows in {FILES} files at {DATA}")

import duckdb
from pyspark.sql import functions as F

from utils_infra_spark.pipeline.similarity import brute_force_topk
from utils_infra_spark.session import get_spark

spark = get_spark("scale-curve-topk")
emb = spark.read.parquet(DATA)
topk = brute_force_topk(emb.where(F.col("vec_id") < 8), emb, k=5)

con = duckdb.connect()
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{DATA}/*.parquet')")
SQL = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
scored AS (
  SELECT q.query_id, c.cand_id,
         ROUND(list_dot_product(q.qv, c.cv) /
               (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))), 6) AS cos_sim
  FROM c, q WHERE q.query_id <> c.cand_id
)
SELECT query_id, cand_id, cos_sim, CAST(rnk AS INT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rnk
  FROM scored
) WHERE rnk <= 5
"""
s_runs, d_runs = [], []
for _ in range(4):
    t0 = time.perf_counter()
    st = topk.select("*").toArrow()
    s_runs.append(round(time.perf_counter() - t0, 3))
    t0 = time.perf_counter()
    dt = con.execute(SQL).arrow()
    d_runs.append(round(time.perf_counter() - t0, 3))
assert st.num_rows == dt.num_rows == 40
print("spark runs:", s_runs, "warm:", min(s_runs[1:]))
print("duck runs:", d_runs, "warm:", min(d_runs[1:]))
print("ratio warm:", round(min(s_runs[1:]) / min(d_runs[1:]), 2))
