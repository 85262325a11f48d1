"""Scale curve for the MinHash near-dup pipeline (docs/SCALE.md).

Two measurements on a generated document corpus (seed 42, ~100
tokens/doc from a 10k-word vocab, every 100th doc a 5%-mutated copy
of an earlier doc so real near-dup pairs exist):

1. CROSS-ENGINE, LIKE-WORK — the LSH band-key sketch stage with the
   md5 hash family (`pipeline.dedup.minhash_band_keys`, the same
   contract the `minhash_band_keys_md5` oracle verifies) paired
   against DuckDB computing the identical sig/band SQL. Both engines
   do the same shingling + 8 md5 minhashes + 4 band keys, so the
   ratio measures ENGINE scaling, not work differences.
2. SPARK-ONLY — the full production near-dup pipeline
   (`minhash_near_duplicates`, xxhash64 family, candidate pairs +
   exact-Jaccard verify) timed at increasing corpus sizes to show
   runtime grows ~linearly with the corpus (no quadratic blowup —
   the 100 TB survival property).

bench.py methodology: fresh QueryExecution per run, Arrow delivery,
alternating paired runs, warm = min of non-cold runs. Production
session regime (AQE on, 32 shuffle partitions).

Usage: PYTHONPATH=. python tools/scale_curve_minhash.py [n_docs] [files]
(defaults 50_000 docs / 32 files; data under /tmp/scale_docs_<n>)
"""

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 32
# ceil-division can exhaust N before the last file for many N (e.g.
# 100/32: per=4, files 25-31 empty) — an empty file would carry
# null-typed columns and break both engines' schema unification, so
# generation below simply stops writing once the docs run out
VOCAB = 10_000
DATA = f"/tmp/scale_docs_{N}"

if not os.path.exists(DATA):
    tmp = DATA + ".tmp"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    os.makedirs(tmp)
    rng = np.random.default_rng(42)
    words = np.array([f"w{i:04d}" for i in range(VOCAB)])
    per = (N + FILES - 1) // FILES
    doc_id = 0
    prev_tokens = None
    for f in range(FILES):
        if doc_id >= N:
            break  # never write an empty (null-typed) parquet file
        ids, texts = [], []
        for _ in range(min(per, N - doc_id)):
            n_tok = int(rng.integers(80, 121))
            toks = words[rng.integers(0, VOCAB, size=n_tok)]
            if doc_id % 100 == 99 and prev_tokens is not None:
                # 5%-mutated copy of the previous doc -> a real near-dup
                toks = prev_tokens.copy()
                flip = rng.random(len(toks)) < 0.05
                toks[flip] = words[rng.integers(0, VOCAB, size=int(flip.sum()))]
            prev_tokens = toks
            ids.append(doc_id)
            texts.append(" ".join(toks))
            doc_id += 1
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}),
            f"{tmp}/part{f:02d}.parquet",
        )
    os.rename(tmp, DATA)
    print(f"generated {N} docs in {len(os.listdir(DATA))} files at {DATA}")

import duckdb

from utils_infra_spark.pipeline.dedup import minhash_band_keys, minhash_near_duplicates
from utils_infra_spark.session import get_spark

spark = get_spark("scale-curve-minhash")
docs = spark.read.parquet(DATA)

# --- 1. cross-engine like-work: md5 band-key sketch stage ---
bands_df = minhash_band_keys(docs, "text", "doc_id", hash_family="md5")
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DATA}/*.parquet')")
SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]
              ELSE [array_to_string(t, ' ')] END AS grams
  FROM toks
),
ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
sig AS (
  SELECT doc_id,
         MIN(substr(md5('mh0:' || g), 1, 16)) AS h0, MIN(substr(md5('mh1:' || g), 1, 16)) AS h1,
         MIN(substr(md5('mh2:' || g), 1, 16)) AS h2, MIN(substr(md5('mh3:' || g), 1, 16)) AS h3,
         MIN(substr(md5('mh4:' || g), 1, 16)) AS h4, MIN(substr(md5('mh5:' || g), 1, 16)) AS h5,
         MIN(substr(md5('mh6:' || g), 1, 16)) AS h6, MIN(substr(md5('mh7:' || g), 1, 16)) AS h7
  FROM ex GROUP BY doc_id
)
SELECT doc_id, band, key FROM (
  SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS key FROM sig
  UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3) FROM sig
  UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5) FROM sig
  UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7) FROM sig
)
"""
s_runs, d_runs = [], []
for _ in range(3):
    t0 = time.perf_counter()
    st = bands_df.select("*").toArrow()
    s_runs.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    dt = con.execute(SQL).arrow()
    d_runs.append(round(time.perf_counter() - t0, 2))
assert st.num_rows == dt.num_rows == 4 * N
print(f"[band-keys md5, like-work] spark runs: {s_runs} warm: {min(s_runs[1:])}")
print(f"[band-keys md5, like-work] duck runs:  {d_runs} warm: {min(d_runs[1:])}")
print(f"[band-keys md5, like-work] ratio warm: {round(min(s_runs[1:]) / min(d_runs[1:]), 2)}")

# --- 2. spark-only: full production near-dup pipeline ---
pipe = minhash_near_duplicates(docs, "text", "doc_id", threshold=0.5)
p_runs = []
pairs = None
for _ in range(3):
    t0 = time.perf_counter()
    pt = pipe.select("*").toArrow()
    p_runs.append(round(time.perf_counter() - t0, 2))
    pairs = pt.num_rows
print(f"[full pipeline xxhash64] runs: {p_runs} warm: {min(p_runs[1:])} pairs found: {pairs}")
print(f"(expect ~{N // 100} injected near-dup pairs at threshold 0.5)")
