"""Scale curve for Bloom incremental-ingest dedup (docs/SCALE.md).

Paired like-work measurement of `bloom_novelty_documents`'s shape —
build the 2^16-bit filter from the corpus half, probe the increment
half, pair with the exact ground truth — Spark
(`pipeline.dedup.bloom_novelty`) vs DuckDB running the registered
oracle form, on the seeded corpora from tools/scale_curve_minhash.py.

Usage: PYTHONPATH=. python tools/scale_curve_bloom.py [n_docs] [files]
"""

import os
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DATA = f"/tmp/scale_docs_{N}"

if not os.path.exists(DATA):
    sys.exit(f"corpus {DATA} missing — run tools/scale_curve_minhash.py {N} {FILES} first")

import duckdb

from utils_infra_spark.pipeline.dedup import bloom_novelty
from utils_infra_spark.queries.pipeline_queries import _bloom_pos_sql
from utils_infra_spark.session import get_spark

spark = get_spark("scale-curve-bloom")
docs = spark.read.parquet(DATA).select("doc_id", "text")
split = N // 2

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DATA}/*.parquet')")
DUCK_SQL = f"""
WITH base AS (
  SELECT doc_id, text AS t FROM documents WHERE text IS NOT NULL
),
pos AS (
  SELECT doc_id, t, unnest([{", ".join(_bloom_pos_sql(j) for j in range(4))}]) AS pos
  FROM base
),
cw AS (
  SELECT pos // 32 AS w,
         bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS word
  FROM pos WHERE doc_id <= {split} GROUP BY 1
),
probe AS (
  SELECT p.doc_id, p.t,
         bool_and(coalesce((cw.word & (1::BIGINT << CAST(p.pos % 32 AS INT))) != 0,
                           FALSE)) AS maybe_seen
  FROM pos p LEFT JOIN cw ON p.pos // 32 = cw.w
  WHERE p.doc_id > {split}
  GROUP BY p.doc_id, p.t
),
ct AS (SELECT DISTINCT t FROM base WHERE doc_id <= {split})
SELECT probe.doc_id, probe.maybe_seen, (ct.t IS NOT NULL) AS exact_seen
FROM probe LEFT JOIN ct ON probe.t = ct.t
"""

s_runs, d_runs = [], []
for _ in range(3):
    t0 = time.perf_counter()
    st = bloom_novelty(docs, "text", "doc_id", split).toArrow()
    s_runs.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    dt = con.execute(DUCK_SQL).arrow()
    d_runs.append(round(time.perf_counter() - t0, 2))
assert st.num_rows == dt.num_rows
fp = sum(1 for m, e in zip(st.column("maybe_seen").to_pylist(),
                           st.column("exact_seen").to_pylist()) if m and not e)
# analytic check: fpp = (1 - e^{-k*n_inserted/m})^k for k=4, m=2^16.
# The filter is deliberately FIXED-SIZE for oracle-checkability, so
# growing corpora saturate it on schedule — measured-vs-predicted
# agreement is the validation that the bit construction is correct.
import math
predicted = (1 - math.exp(-4 * split / 65536.0)) ** 4
print(f"[bloom] n_docs={N} increment_rows={st.num_rows} false_positives={fp} "
      f"measured_fpp={fp / st.num_rows:.4f} predicted_fpp={predicted:.4f}")
print(f"[bloom] spark runs: {s_runs} warm: {min(s_runs[1:])}")
print(f"[bloom] duck runs:  {d_runs} warm: {min(d_runs[1:])}")
print(f"[bloom] spark/duck ratio: {round(min(s_runs[1:]) / min(d_runs[1:]), 2)}")
