"""Scale curve for per-source boilerplate line removal (docs/SCALE.md).

Paired like-work measurement of `boilerplate_line_removal_documents`'s
shape — explode lines → per-(source, line) distinct-doc counts → join
back → reassemble — Spark (`pipeline.dedup.boilerplate_line_removal`)
vs DuckDB running the registered oracle form, on the re-lined corpora
from tools/scale_curve_linededup.py (5-token lines). The generated
corpus has no source column; both engines derive `doc_id % 4` so the
work is identical. Because every 100th doc is a near-copy of an
earlier one, shared lines really do cross the >=3-distinct-docs
threshold at these sizes.

Usage: PYTHONPATH=. python tools/scale_curve_boilerplate.py [n_docs]
"""

import os
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
DATA = f"/tmp/scale_docs_{N}_lines"

if not os.path.exists(DATA):
    sys.exit(f"re-lined corpus {DATA} missing — run tools/scale_curve_linededup.py {N} first")

import duckdb

from utils_infra_spark.pipeline.dedup import boilerplate_line_removal
from utils_infra_spark.session import get_spark

spark = get_spark("scale-curve-boilerplate")
docs = spark.read.parquet(DATA).selectExpr(
    "doc_id", "CAST(doc_id % 4 AS STRING) AS source", "text"
)

con = duckdb.connect()
con.execute(
    f"CREATE VIEW documents AS SELECT doc_id, CAST(doc_id % 4 AS VARCHAR) AS source, text"
    f" FROM read_parquet('{DATA}/*.parquet')"
)

from utils_infra_spark.queries import REGISTRY, _load

_load()
DUCK_SQL = REGISTRY["boilerplate_line_removal_documents"].oracle

s_runs, d_runs = [], []
for _ in range(3):
    t0 = time.perf_counter()
    st = boilerplate_line_removal(docs, "text", "doc_id", "source", min_docs=3).toArrow()
    s_runs.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    dt = con.execute(DUCK_SQL).arrow()
    d_runs.append(round(time.perf_counter() - t0, 2))
assert st.num_rows == dt.num_rows
s_rm = sum(st.column("removed_lines").to_pylist())
d_rm = sum(dt.column("removed_lines").to_pylist())
assert s_rm == d_rm, (s_rm, d_rm)
print(f"[boiler] n_docs={N} docs={st.num_rows} removed_lines={s_rm}")
print(f"[boiler] spark runs: {s_runs} warm: {min(s_runs[1:])}")
print(f"[boiler] duck runs:  {d_runs} warm: {min(d_runs[1:])}")
print(f"[boiler] spark/duck ratio: {round(min(s_runs[1:]) / min(d_runs[1:]), 2)}")
