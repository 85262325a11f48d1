"""Scale curve for corpus line dedup (docs/SCALE.md).

Paired like-work measurement of `line_dedup_documents`'s shape —
explode lines → global first-occurrence window → reassemble — Spark
(`pipeline.dedup.line_dedup_corpus`) vs DuckDB running the registered
oracle form, on the seeded corpora from tools/scale_curve_minhash.py.
Both sides do the full two-shuffle pipeline every run.

Usage: PYTHONPATH=. python tools/scale_curve_linededup.py [n_docs] [files]
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

from utils_infra_spark.pipeline.dedup import line_dedup_corpus
from utils_infra_spark.session import get_spark

spark = get_spark("scale-curve-linededup")
# the generated corpus is single-line docs; re-line them so the
# operator has real line structure (5 tokens per line)
docs = spark.sql("""
  SELECT doc_id,
         array_join(transform(sequence(0, CAST(size(split(text, ' ')) / 5 AS INT) - 1),
                    i -> array_join(slice(split(text, ' '), i * 5 + 1, 5), ' ')), '\n') AS text
  FROM {d}
""", d=spark.read.parquet(DATA).select("doc_id", "text"))
docs.write.mode("overwrite").parquet(f"{DATA}_lines")
docs = spark.read.parquet(f"{DATA}_lines")

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DATA}_lines/*.parquet')")
DUCK_SQL = """
WITH lx AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls
  FROM documents WHERE text IS NOT NULL
),
lines AS (
  SELECT doc_id, unnest(range(len(ls))) AS line_no, unnest(ls) AS line
  FROM lx
),
ranked AS (
  SELECT doc_id, line_no, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
  FROM lines WHERE NOT regexp_matches(line, '^[ \\t\\n\\x0B\\f\\r]*$')
)
SELECT doc_id,
       string_agg(line, chr(10) ORDER BY line_no) FILTER (WHERE rn = 1) AS clean_text,
       COUNT(*) FILTER (WHERE rn = 1) AS kept_lines,
       COUNT(*) FILTER (WHERE rn > 1) AS dropped_lines
FROM ranked GROUP BY doc_id
HAVING COUNT(*) FILTER (WHERE rn = 1) > 0
"""

s_runs, d_runs = [], []
for _ in range(3):
    t0 = time.perf_counter()
    st = line_dedup_corpus(docs, "text", "doc_id").toArrow()
    s_runs.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    dt = con.execute(DUCK_SQL).arrow()
    d_runs.append(round(time.perf_counter() - t0, 2))
assert st.num_rows == dt.num_rows
print(f"[line_dedup] n_docs={N} surviving_docs={st.num_rows}")
print(f"[line_dedup] spark runs: {s_runs} warm: {min(s_runs[1:])}")
print(f"[line_dedup] duck runs:  {d_runs} warm: {min(d_runs[1:])}")
print(f"[line_dedup] spark/duck ratio: {round(min(s_runs[1:]) / min(d_runs[1:]), 2)}")
