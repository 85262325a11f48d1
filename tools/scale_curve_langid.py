"""Scale curve for trigram language-ID (docs/SCALE.md, r10).

Paired like-work measurement: Spark `pipeline.text.langid_trigram`
vs DuckDB running the registered oracle on the same synthetic corpus —
4 synthetic "languages" with distinct trigram stock phrases plus a
per-doc salt token so profiles are non-trivial. Outputs are asserted
identical (driver-style canonical form) before timings are reported.

Usage: PYTHONPATH=. python tools/scale_curve_langid.py [n_docs]
One size per invocation; cool the box between sizes (r8 rule).
"""

import os
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
DATA = f"/tmp/scale_langid_{N}"

from utils_infra_spark.session import get_spark  # noqa: E402

spark = get_spark("scale-curve-langid")

PHRASES = {
    0: ("aa", "the quick brown fox jumps over the lazy dog again and again"),
    1: ("bb", "el rapido zorro marron salta sobre el perro perezoso otra vez"),
    2: ("cc", "der schnelle braune fuchs springt uber den faulen hund nochmal"),
    3: ("dd", "le renard brun rapide saute par dessus le chien paresseux encore"),
}

if not os.path.exists(DATA):
    cases = " ".join(
        f"WHEN {k} THEN '{lang}|{txt}'" for k, (lang, txt) in PHRASES.items()
    )
    spark.range(N).selectExpr(
        "CAST(id AS BIGINT) AS doc_id",
        f"split(CASE CAST(id % 4 AS INT) {cases} END, '\\\\|')[0] AS lang",
        f"concat(split(CASE CAST(id % 4 AS INT) {cases} END, '\\\\|')[1],"
        " ' tok', CAST(id AS STRING)) AS text",
    ).write.mode("overwrite").parquet(DATA)

import duckdb  # noqa: E402

from utils_infra_spark.pipeline.text import langid_trigram  # noqa: E402
from utils_infra_spark.queries import REGISTRY, _load  # noqa: E402

_load()
docs = spark.read.parquet(DATA)
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DATA}/*.parquet')")
DUCK_SQL = REGISTRY["langid_trigram_documents"].oracle

s_runs, d_runs = [], []
for _ in range(3):
    t0 = time.perf_counter()
    st = langid_trigram(docs, "text", "lang", "doc_id", top_m=40).toArrow()
    s_runs.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    dt = con.execute(DUCK_SQL).arrow()
    d_runs.append(round(time.perf_counter() - t0, 2))

s_rows = sorted(zip(*[st.column(c).to_pylist() for c in sorted(st.column_names)]))
d_rows = sorted(zip(*[dt.column(c).to_pylist() for c in sorted(dt.column_names)]))
assert s_rows == d_rows, (len(s_rows), len(d_rows))
acc = sum(1 for r in s_rows if r[0]) / len(s_rows)
print(f"[langid] n_docs={N} rows={len(s_rows)} accuracy={acc:.3f}")
print(f"[langid] spark runs: {s_runs} warm: {min(s_runs[1:])}")
print(f"[langid] duck runs:  {d_runs} warm: {min(d_runs[1:])}")
print(f"[langid] spark/duck ratio: {round(min(s_runs[1:]) / min(d_runs[1:]), 2)}")
