"""Dump `.explain("formatted")` for named queries to files.

Usage:
    PYTHONPATH=. python tools/dump_query_plans.py OUTDIR SUFFIX q1 q2 ...

Writes OUTDIR/<query>_<SUFFIX>.txt for each query, containing the
full formatted physical plan at sf0.1 under the tuned bench session
(same tuning path the bench uses, so the plans match what the bench
times). Used to produce the plans/r13/<query>_{before,after}.txt
optimization-round evidence files.
"""
import io
import os
import sys

from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from utils_infra_spark.queries import REGISTRY, _load
from utils_infra_spark.session import get_spark, tune_for_input

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plan-dump")
    tune_for_input(spark, SF)
    _load()
    for name in names:
        df = REGISTRY[name].plan(spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
