"""Scale curve for the fused cleaning-pipeline capstone (docs/SCALE.md).

Three paired measurements on the re-lined corpus from
tools/scale_curve_minhash.py (5-token lines, every 100th doc a
mutated near-copy, exact duplicates from the generator's repeats):

1. FUSED Spark (`pretrain_pipeline_documents` — gate_flags one-scan
   projection + digest riding the scan; the r8 shape)
2. UNFUSED Spark (the r7 shape rebuilt inline: each in-row gate its
   own branch, five doc_id equi-joins back) — the curve this round's
   fusion exists to beat
3. DuckDB running the registered capstone oracle (the four component
   oracles nested as CTEs)

Cross-engine value identity is asserted between (1) and (3) every
run; (1) and (2) are asserted identical too (same semantics, different
plan).

Usage: PYTHONPATH=. python tools/scale_curve_pretrain.py [n_docs] [files]
(generate the base corpus first: tools/scale_curve_minhash.py N FILES)
"""

import os
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 32
BASE = f"/tmp/scale_docs_{N}"
DATA = f"/tmp/scale_pretrain_{N}"

if not os.path.exists(BASE):
    sys.exit(f"corpus {BASE} missing — run tools/scale_curve_minhash.py {N} {FILES} first")

import duckdb

from pyspark.sql import functions as F

from utils_infra_spark.queries import REGISTRY, _load
from utils_infra_spark.session import get_spark

_load()
spark = get_spark("scale-curve-pretrain")

if not os.path.exists(f"{DATA}/documents.parquet"):
    # re-line the single-line corpus (5 tokens per line) so the C4 /
    # repetition / line gates have real line structure to chew on
    # ceil-division line count: a 7-token doc gets 2 lines (5 + the
    # 2-token tail) and a <5-token doc gets exactly 1 — the floor form
    # silently dropped tails and produced a [0, -1] sequence (an
    # end-anchored slice) for tiny docs
    docs = spark.sql(
        """
        SELECT doc_id,
               array_join(transform(
                 sequence(0, CAST(CEIL(size(split(text, ' ')) / 5.0) AS INT) - 1),
                 i -> array_join(slice(split(text, ' '), i * 5 + 1, 5), ' ')), '\n') AS text
        FROM {d}
        WHERE size(split(text, ' ')) >= 1
        """,
        d=spark.read.parquet(BASE).select("doc_id", "text"),
    )
    docs.write.mode("overwrite").parquet(f"{DATA}/documents.parquet")

q = REGISTRY["pretrain_pipeline_documents"]

con = duckdb.connect()
con.execute(
    f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DATA}/documents.parquet/*.parquet')"
)


def unfused(spark, sf_dir):
    """The r7 capstone shape, verbatim: five separate gate branches
    equi-joined back on doc_id (9 corpus scans, 8 joins)."""
    from utils_infra_spark.pipeline.text import (
        c4_line_filter,
        control_char_profile,
        quality_profile,
        repetition_profile,
    )
    from utils_infra_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    base = docs.where("text IS NOT NULL")
    c4 = c4_line_filter(docs, "text", "doc_id").select("doc_id", "c4_keep")
    gq = quality_profile(docs, "text", "doc_id").select("doc_id", "quality_pass")
    gr = repetition_profile(docs, "text", "doc_id").select("doc_id", "gopher_pass")
    enc = control_char_profile(docs, "text", "doc_id").select("doc_id", "encoding_pass")
    digs = base.selectExpr("doc_id", "md5(text) AS __dig")
    keeper = digs.groupBy("__dig").agg(F.expr("MIN(doc_id) AS __keeper"))
    dup = digs.join(keeper, "__dig").selectExpr("doc_id", "doc_id != __keeper AS is_exact_dup")
    return (
        base.select("doc_id")
        .join(dup, "doc_id")
        .join(c4, "doc_id", "left")
        .join(gq, "doc_id", "left")
        .join(gr, "doc_id", "left")
        .join(enc, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "COALESCE(c4_keep, FALSE) AS c4_keep",
            "COALESCE(quality_pass, FALSE) AS quality_pass",
            "COALESCE(gopher_pass, FALSE) AS repetition_pass",
            "COALESCE(encoding_pass, FALSE) AS encoding_pass",
            "is_exact_dup",
        )
        .selectExpr(
            # final_keep over the COALESCEd columns, in a second
            # select — exactly the r7 builder's two-stage shape, so a
            # doc missing from a gate branch yields FALSE, never NULL
            "doc_id", "c4_keep", "quality_pass", "repetition_pass", "encoding_pass",
            "is_exact_dup",
            "(c4_keep AND quality_pass AND repetition_pass AND encoding_pass"
            " AND NOT is_exact_dup) AS final_keep",
        )
    )


fused_runs, unfused_runs, duck_runs = [], [], []
ft = ut = dt = None
for _ in range(3):
    t0 = time.perf_counter()
    ft = q.fn(spark, DATA).toArrow()
    fused_runs.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    ut = unfused(spark, DATA).toArrow()
    unfused_runs.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    dt = con.execute(q.oracle).arrow()
    duck_runs.append(round(time.perf_counter() - t0, 2))

assert ft.num_rows == ut.num_rows == dt.num_rows
cols = sorted(ft.column_names)
f_rows = sorted(tuple(r[c] for c in cols) for r in ft.to_pylist())
u_rows = sorted(tuple(r[c] for c in cols) for r in ut.to_pylist())
d_rows = sorted(tuple(r[c] for c in cols) for r in dt.to_pylist())
assert f_rows == u_rows, "fused vs unfused drifted"
assert f_rows == d_rows, "cross-engine values differ"
kept = sum(1 for r in ft.to_pylist() if r["final_keep"])
dups = sum(1 for r in ft.to_pylist() if r["is_exact_dup"])
print(f"[pretrain] n={ft.num_rows} kept={kept} exact_dups={dups}")
print(f"[pretrain] fused runs:   {fused_runs} warm: {min(fused_runs[1:])}")
print(f"[pretrain] unfused runs: {unfused_runs} warm: {min(unfused_runs[1:])}")
print(f"[pretrain] duck runs:    {duck_runs} warm: {min(duck_runs[1:])}")
print(
    f"[pretrain] fused/duck: {round(min(fused_runs[1:]) / min(duck_runs[1:]), 2)}"
    f"  fused/unfused: {round(min(fused_runs[1:]) / min(unfused_runs[1:]), 2)}"
)
