"""Scale curve for exact-substring dup-span coverage (docs/SCALE.md).

Paired like-work measurement of `dup_span_coverage_documents`'s shape —
in-row 8-token window hashing → duplicated-hash set → semi-join →
distinct-covered-token count — Spark (`pipeline.dedup.dup_span_coverage`)
vs DuckDB running the registered oracle form, on the seeded corpora
from tools/scale_curve_minhash.py (which contain real cross-doc
duplication: ~10% near-dup pairs share long token spans).

Usage: PYTHONPATH=. python tools/scale_curve_dupspan.py [n_docs] [files]
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

from utils_infra_spark.pipeline.dedup import dup_span_coverage
from utils_infra_spark.queries import REGISTRY, _load
from utils_infra_spark.session import get_spark

spark = get_spark("scale-curve-dupspan")
docs = spark.read.parquet(DATA).select("doc_id", "text")

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DATA}/*.parquet')")
_load()
DUCK_SQL = REGISTRY["dup_span_coverage_documents"].oracle  # the registered oracle, verbatim

s_runs, x_runs, d_runs = [], [], []
for _ in range(3):
    t0 = time.perf_counter()
    st = dup_span_coverage(docs, "text", "doc_id", window=8).toArrow()
    s_runs.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    xt = dup_span_coverage(docs, "text", "doc_id", window=8, hash_fn="xxhash64").toArrow()
    x_runs.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    dt = con.execute(DUCK_SQL).arrow()
    d_runs.append(round(time.perf_counter() - t0, 2))
assert st.num_rows == dt.num_rows == xt.num_rows
cov = sum(1 for v in st.column("dup_covered_tokens").to_pylist() if v > 0)
print(f"[dup_span] n_docs={N} rows={st.num_rows} docs_with_dup_spans={cov}")
print(f"[dup_span] spark md5 runs:  {s_runs} warm: {min(s_runs[1:])}  (oracle-checkable form)")
print(f"[dup_span] spark xx64 runs: {x_runs} warm: {min(x_runs[1:])}  (production form)")
print(f"[dup_span] duck md5 runs:   {d_runs} warm: {min(d_runs[1:])}")
print(f"[dup_span] md5/duck ratio:  {round(min(s_runs[1:]) / min(d_runs[1:]), 2)}"
      f"  xx64/duck ratio: {round(min(x_runs[1:]) / min(d_runs[1:]), 2)}")
