"""Registry-wide physical-plan sweep: scale-killer scan at HEAD.

Builds the formatted physical plan of EVERY registered query at sf0.1
under the tuned bench session and scans the text for the scale-killer
classes the round audits care about:

* ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — quadratic joins;
* Python-boundary nodes (``BatchEvalPython``, ``ArrowEvalPython``,
  ``MapInPandas``, ``MapInArrow``, ``FlatMapGroupsInPandas``) — must
  appear only in the sanctioned §2.11 surface (raster codecs, DOM
  extraction, LLM-stub summarize, Arrow matmul kernels);
* ``InMemoryTableScan``s left by a previous query (leaked persists).

Plan BUILD may execute bounded model-fit collects (char-LM, k-means,
query-vector steps) — that is those operators' documented contract.
Emits one line per query plus a summary; exit code 1 if any cartesian
or BNLJ shows up anywhere, so the sweep can run as a gate.

Run: PYTHONPATH=. python tools/scan_all_plans.py [out.tsv]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from utils_infra_spark.queries import REGISTRY, _load  # noqa: E402
from utils_infra_spark.session import get_spark, tune_for_input  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PY_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "MapInArrow",
    "FlatMapGroupsInPandas",
)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    spark = get_spark("plan-sweep")
    tune_for_input(spark, SF)
    _load()
    rows: list[tuple[str, int, bool, bool, str, str]] = []
    errors: list[tuple[str, str]] = []
    for name in sorted(REGISTRY):
        try:
            df = REGISTRY[name].plan(spark, SF)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # plan must BUILD for every query
            errors.append((name, f"{type(exc).__name__}: {exc}"))
            continue
        n_ex = text.count("Exchange")
        cart = "CartesianProduct" in text
        bnlj = "BroadcastNestedLoopJoin" in text
        py = ",".join(sorted({p for p in PY_NODES if p in text}))
        joins = ",".join(
            sorted(
                {
                    j
                    for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
                    if j in text
                }
            )
        )
        rows.append((name, n_ex, cart, bnlj, py, joins))
        # drop anything a plan build persisted so queries stay independent
        spark.catalog.clearCache()
    lines = ["query\texchanges\tcartesian\tbnlj\tpython_nodes\tjoin_strategies"]
    for r in rows:
        lines.append("\t".join(str(x) for x in r))
    report = "\n".join(lines)
    if out_path:
        with open(out_path, "w") as f:
            f.write(report + "\n")
    print(report)
    n_cart = sum(1 for r in rows if r[2])
    n_bnlj = sum(1 for r in rows if r[3])
    with_py = [r[0] for r in rows if r[4]]
    print(
        f"\nSUMMARY: {len(rows)} plans built, {len(errors)} errors, "
        f"{n_cart} cartesian, {n_bnlj} BNLJ, {len(with_py)} with Python nodes"
    )
    if with_py:
        print("python-boundary queries:", ", ".join(with_py))
    for name, err in errors:
        print("ERROR", name, err)
    spark.stop()
    sys.exit(1 if (n_cart or n_bnlj or errors) else 0)


if __name__ == "__main__":
    main()
