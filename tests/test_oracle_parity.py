"""Emulates the driver's t2 gate: for every registered query with an
oracle, run the Spark plan AND the DuckDB SQL on the same parquet and
compare row-count + column names + order-insensitive values exactly.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from utils_infra_spark.queries import REGISTRY, _load

_load()
WITH_ORACLE = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY = sorted(name for name, q in REGISTRY.items() if q.oracle is None)


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values, sort rows — the
    order-insensitive form the driver hashes."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(col):
            # exact repr: driver-style value identity, not tolerance
            df[c] = col.map(lambda v: "nan" if v is None or (isinstance(v, float) & (v != v)) else repr(float(v)))
        elif col.dtype == object:
            df[c] = col.map(lambda v: "null" if v is None else str(v))
        else:
            df[c] = col.astype(str)
    return df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, sf_dir, duck):
    q = REGISTRY[name]
    got = q.fn(spark, sf_dir).toPandas()
    want = duck.execute(q.oracle).df()

    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != oracle {sorted(want.columns)}"
    )
    g, w = canonicalize(got), canonicalize(want)
    mism = (g != w).any(axis=1)
    if mism.any():
        idx = mism[mism].index[:5]
        raise AssertionError(
            f"{name}: {int(mism.sum())}/{len(g)} rows differ.\nspark:\n{g.loc[idx]}\noracle:\n{w.loc[idx]}"
        )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, spark, sf_dir):
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries().keys()) >= set(e.oracle_sql().keys())
