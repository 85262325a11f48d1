"""HyperLogLog sketch properties (pipeline/sketch.py).

The oracle parity test checks the full query cross-engine; these pin
the algorithm itself: registers match a pure-Python reference, merge
of partials equals the direct sketch exactly (register-for-register),
and the estimate lands within the published error regime.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F
from stream_waits import await_terminated

from utils_infra_spark.pipeline.sketch import (
    HLL_M,
    _LC_MICRO,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_sketch,
)


def _py_register(value: str) -> tuple[int, int]:
    """Pure-Python reference for (idx, rho): md5 hex, first two
    nibbles mod 64, leading-zero bits of the next 52 + 1."""
    h = hashlib.md5(value.encode()).hexdigest()
    idx = (int(h[0], 16) * 16 + int(h[1], 16)) % HLL_M
    bits = bin(int(h[2:15], 16))[2:].zfill(52)
    rho = len(bits) - len(bits.lstrip("0")) + 1
    return idx, rho


def test_registers_match_python_reference(spark):
    vals = [str(v) for v in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "u string").selectExpr(
        "'g' AS g", "u"
    )
    got = {
        (r["idx"], r["m"])
        for r in hll_sketch(df, ["g"], "u").collect()
    }
    want: dict[int, int] = {}
    for v in vals:
        idx, rho = _py_register(v)
        want[idx] = max(want.get(idx, 0), rho)
    assert got == set(want.items())


def test_merge_of_partials_equals_direct_sketch(spark):
    rows = [(i % 7, f"user{i % 300}") for i in range(2000)]
    df = spark.createDataFrame(rows, "day int, u string").selectExpr(
        "'g' AS g", "day", "u"
    )
    direct = {
        (r["idx"], r["m"]) for r in hll_sketch(df, ["g"], "u").collect()
    }
    per_day = hll_sketch(df, ["g", "day"], "u").drop("day")
    merged = {
        (r["idx"], r["m"]) for r in hll_merge(per_day, ["g"]).collect()
    }
    assert merged == direct  # max is associative: any merge tree agrees


def test_estimate_accuracy_and_small_range_branch(spark):
    # large group: raw branch; small group: linear-counting branch
    rows = [("big", f"u{i}") for i in range(3000)] + [
        ("small", f"v{i}") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, u string")
    est = {r["g"]: r["hll_estimate"] for r in hll_distinct(df, ["g"], "u").collect()}
    assert abs(est["big"] - 3000) / 3000 < 0.4  # ~13% sigma, 3-sigma bound
    assert abs(est["small"] - 10) / 10 < 0.6
    # the small group's value must come from the shared literal table
    direct = hll_sketch(df.where("g = 'small'"), ["g"], "u").count()
    v = HLL_M - direct
    assert est["small"] == _LC_MICRO[v - 1] / 1e6


def test_estimate_overflow_regime_no_ansi_error(spark):
    """All 64 registers at the max rho (53) drives raw ≈ 4.1e17 —
    micro-rounding that would overflow BIGINT and ANSI-error the
    query. Above 1e12 the estimate is the raw double, unrounded, and
    the Python twin agrees exactly."""
    from utils_infra_spark.pipeline.sketch import hll_estimate_py

    regs = spark.createDataFrame(
        [("g", i, 53) for i in range(HLL_M)], "g string, idx int, m int"
    )
    est = hll_estimate(regs, ["g"]).collect()[0]["hll_estimate"]
    want = (0.709 * 4096.0 * 9007199254740992.0) / 64.0
    assert est == want
    assert hll_estimate_py([53] * HLL_M) == want


def test_lc_table_matches_formula():
    for v in (1, 13, 64):
        assert _LC_MICRO[v - 1] == math.floor(HLL_M * math.log(HLL_M / v) * 1e6 + 0.5)


def test_estimate_partition_invariant(spark):
    rows = [("g", f"u{i}") for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, u string")
    vals = set()
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n in (2, 8, 32):
            spark.conf.set("spark.sql.shuffle.partitions", str(n))
            vals.add(
                hll_distinct(df.repartition(int(n)), ["g"], "u").collect()[0][
                    "hll_estimate"
                ]
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert len(vals) == 1  # integer register sum: merge order can't leak


# ---------------------------------------------------------------- JL
def test_jl_projection_preserves_pairwise_distances(spark):
    """Achlioptas' guarantee, pinned empirically: for unit-ish random
    vectors, squared distances in the 16-dim projection (scaled by
    1/out_dim) track the 64-dim originals within a loose 3-sigma band
    — JL is an approximation, the test asserts the STATISTIC, not
    per-pair exactness."""
    import numpy as np

    from utils_infra_spark.pipeline.similarity import jl_signs

    rng = np.random.default_rng(7)
    X = rng.standard_normal((40, 64))
    S = np.array(jl_signs(64, 16), dtype=float)      # (16, 64)
    P = X @ S.T / np.sqrt(16.0)
    ratios = []
    for a in range(0, 40, 3):
        for b in range(a + 1, 40, 7):
            d0 = np.sum((X[a] - X[b]) ** 2)
            d1 = np.sum((P[a] - P[b]) ** 2)
            ratios.append(d1 / d0)
    r = np.array(ratios)
    assert 0.4 < r.mean() < 1.6
    assert (np.abs(r - 1.0) < 1.5).mean() > 0.9


def test_jl_long_form_matches_numpy(spark):
    import numpy as np

    from utils_infra_spark.pipeline.similarity import jl_project_long, jl_signs

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((5, 64)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {
        (r["vec_id"], r["out_dim"]): r["p"]
        for r in jl_project_long(df, in_dim=64, out_dim=16).collect()
    }
    import math

    S = np.array(jl_signs(64, 16), dtype=np.int64)
    for i in range(5):
        # the operator's exact contract: per-element integer
        # nano-quantize, then sign-weighted INTEGER sums — so the
        # reference reproduces it bit-for-bit, no tolerance needed
        qv = np.array(
            [math.floor(float(v) * 1e9 + 0.5) for v in vecs[i].astype(np.float64)],
            dtype=np.int64,
        )
        want = S @ qv
        for d in range(16):
            assert got[(i, d)] == int(want[d]) / 1e9


def test_jl_row_domain_gate(spark):
    """The row-domain gate is size(vec) = in_dim exactly: NULL, short,
    and OVER-length vectors are all excluded — an over-length vector
    previously threw INVALID_ARRAY_INDEX under ANSI while the DuckDB
    oracle silently summed the first in_dim elements."""
    from utils_infra_spark.pipeline.similarity import jl_project_long

    rows = [
        (1, [0.5] * 64),
        (2, [0.5] * 65),
        (3, [0.5] * 10),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = jl_project_long(df, in_dim=64, out_dim=16).collect()
    assert {r["vec_id"] for r in out} == {1}
    assert len(out) == 16


# ------------------------------------------------------ streaming HLL
def test_hll_estimate_py_matches_sql(spark):
    """The Python estimate twin must be value-identical to the batch
    SQL on real register sets (same integer harmonic sum, same float
    op order, same literal LC table)."""
    from utils_infra_spark.pipeline.sketch import hll_estimate_py

    rows = [("big", f"u{i}") for i in range(3000)] + [
        ("small", f"v{i}") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, u string")
    sql_est = {r["g"]: r["hll_estimate"] for r in hll_distinct(df, ["g"], "u").collect()}
    regs = {}
    for r in hll_sketch(df, ["g"], "u").collect():
        regs.setdefault(r["g"], [0] * HLL_M)[r["idx"]] = r["m"]
    for g, dense in regs.items():
        assert hll_estimate_py(dense) == sql_est[g], g


def test_hll_stream_preserves_int_key_type(spark, tmp_path):
    """The state-output key schema derives from the input stream — an
    int key column must come out int (hard-coding string mistyped it
    before), and the estimates must still match batch."""
    import json
    import os

    from utils_infra_spark.pipeline.sketch import hll_distinct_stream

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [(7, f"u{i}") for i in range(50)] + [(9, f"w{i}") for i in range(20)]
    with open(f"{src}/b0.json", "w") as f:
        for g, u in rows:
            f.write(json.dumps({"seg": g, "u": u}) + "\n")
    stream = (
        spark.readStream.schema("seg int, u string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = hll_distinct_stream(stream, ["seg"], "u")
    assert dict(out.dtypes)["seg"] == "int"
    q = (
        out.writeStream.format("memory")
        .queryName("hll_stream_int")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_int"))
        .trigger(availableNow=True)
        .start()
    )
    # asserting wait (r14, verdict item 1): the bare awaitTermination
    # returned False silently on timeout and the test read a partial
    # sink under a live query — these timer-free availableNow
    # aggregations self-terminate, so termination is assertable
    await_terminated(q)
    got = {
        r["seg"]: r["hll_estimate"]
        for r in spark.sql("SELECT seg, hll_estimate FROM hll_stream_int").collect()
    }
    batch = {
        r["seg"]: r["hll_estimate"]
        for r in hll_distinct(
            spark.createDataFrame(rows, "seg int, u string"), ["seg"], "u"
        ).collect()
    }
    assert got == batch
    assert all(isinstance(k, int) for k in got)


def test_hll_stream_matches_batch_estimate(spark, tmp_path):
    """Stateful streaming HLL: rows split across micro-batches in an
    arbitrary order must end at the IDENTICAL estimate the batch
    sketch computes on the union — max-merge is order-free and the
    estimate math is shared."""
    import json
    import os

    from utils_infra_spark.pipeline.sketch import hll_distinct_stream

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [("a", f"u{i}") for i in range(300)] + [("b", f"w{i}") for i in range(40)]
    # two micro-batch files, interleaved split
    for bi in range(2):
        with open(f"{src}/b{bi}.json", "w") as f:
            for g, u in rows[bi::2]:
                f.write(json.dumps({"g": g, "u": u}) + "\n")
    stream = (
        spark.readStream.schema("g string, u string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = hll_distinct_stream(stream, ["g"], "u")
    q = (
        out.writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # asserting wait (r14, verdict item 1): the bare awaitTermination
    # returned False silently on timeout and the test read a partial
    # sink under a live query — these timer-free availableNow
    # aggregations self-terminate, so termination is assertable
    await_terminated(q)
    got = spark.sql(
        "SELECT g, hll_estimate FROM hll_stream"
    ).toPandas()
    # update mode appends one row per key per batch, in no guaranteed
    # order — but register max-merge makes the estimate monotone
    # non-decreasing, so the FINAL value is the max per key
    final = got.groupby("g")["hll_estimate"].max().to_dict()
    batch = {
        r["g"]: r["hll_estimate"]
        for r in hll_distinct(
            spark.createDataFrame(rows, "g string, u string"), ["g"], "u"
        ).collect()
    }
    assert final == batch
