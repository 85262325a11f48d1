"""Scale curve for DSIR importance scoring (docs/SCALE.md).

Paired like-work measurement of `dsir_importance_documents`'s shape —
tokenize → hashed-bucket fit (bounded key space) → quantize →
broadcast-join score — Spark (`pipeline.text.dsir_importance_scores`)
vs DuckDB running the registered oracle form, on the seeded corpora
from tools/scale_curve_minhash.py. The generated corpus has no lang
column, so the target set is `doc_id % 3 = 0` on both sides — same
work, same smoothing, same md5 buckets.

Both engines pay the full fit + score every run (the Spark builder is
registered uncacheable; here we call the lib function directly, which
re-fits per call by construction).

Usage: PYTHONPATH=. python tools/scale_curve_dsir.py [n_docs] [files]
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

from utils_infra_spark.pipeline.text import dsir_importance_scores
from utils_infra_spark.session import get_spark

spark = get_spark("scale-curve-dsir")
docs = spark.read.parquet(DATA).select("doc_id", "text")

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DATA}/*.parquet')")

_NIB = "(instr('0123456789abcdef', substr(md5(u.w), {i}, 1)) - 1)"
_BUCKET = (
    f"(({_NIB.format(i=1)} * 256 + {_NIB.format(i=2)} * 16 + {_NIB.format(i=3)}) % 1024)"
)
DUCK_SQL = f"""
WITH base AS (
  SELECT doc_id, (doc_id % 3 = 0) AS is_t,
         list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                     x -> x <> '') AS ts
  FROM documents WHERE text IS NOT NULL
),
tok AS (
  SELECT doc_id, is_t, {_BUCKET} AS b
  FROM base, LATERAL (SELECT unnest(ts) AS w) u
  WHERE len(ts) >= 1
),
bc AS (
  SELECT b, COUNT(*) AS cr, COUNT(*) FILTER (WHERE is_t) AS ct
  FROM tok GROUP BY 1
),
tot AS (SELECT SUM(cr) AS tr, SUM(ct) AS tt FROM bc),
q AS (
  SELECT bc.b,
         CAST(FLOOR(ln(((CAST(bc.ct AS DOUBLE) + 0.5) / (CAST(tot.tt AS DOUBLE) + 512.0))
                       / ((CAST(bc.cr AS DOUBLE) + 0.5) / (CAST(tot.tr AS DOUBLE) + 512.0)))
                    * 1000000000.0 + 0.5) AS BIGINT) AS q
  FROM bc CROSS JOIN tot
)
SELECT tok.doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(q.q) AS BIGINT) AS dsir_nanonats
FROM tok JOIN q USING (b)
GROUP BY tok.doc_id
"""

s_runs, d_runs = [], []
for _ in range(3):
    t0 = time.perf_counter()
    st = dsir_importance_scores(docs, "text", "doc_id", target_sql="doc_id % 3 = 0").toArrow()
    s_runs.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    dt = con.execute(DUCK_SQL).arrow()
    d_runs.append(round(time.perf_counter() - t0, 2))
assert st.num_rows == dt.num_rows
# value spot-check: total nanonats must agree exactly (integer contract)
s_sum = sum(st.column("dsir_nanonats").to_pylist())
d_sum = sum(dt.column("dsir_nanonats").to_pylist())
assert s_sum == d_sum, (s_sum, d_sum)
print(f"[dsir] n_docs={N} scored_docs={st.num_rows} total_nanonats_match=True")
print(f"[dsir] spark runs: {s_runs} warm: {min(s_runs[1:])}")
print(f"[dsir] duck runs:  {d_runs} warm: {min(d_runs[1:])}")
print(f"[dsir] spark/duck ratio: {round(min(s_runs[1:]) / min(d_runs[1:]), 2)}")
