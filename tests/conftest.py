from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from utils_infra_spark.session import get_spark

    s = get_spark("utils-infra-tests", cpus=4)
    # suite-time discipline (r14, verdict item 1): get_spark's
    # cluster-oriented default is max(cpus, 32) = 32 shuffle
    # partitions, which on this local[4] test session made every
    # stateful streaming micro-batch run 32 state-store tasks on 4
    # cores (~3 such stages per micro-batch, several micro-batches
    # per test — the dominant wall cost of the streaming e2e files,
    # and the reason the r13 driver's full-suite run overran its
    # budget in the streaming region). 8 partitions = 2 waves on 4
    # cores; tests that probe partition-count behavior set and
    # restore their own values (test_session, the 2/8/32
    # partitioning-invariance sweeps).
    s.conf.set("spark.sql.shuffle.partitions", "8")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the star-schema views registered, the
    same way the driver's oracle harness does."""
    import duckdb

    con = duckdb.connect()
    from utils_infra_spark.sources.tables import TABLE_NAMES

    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()
