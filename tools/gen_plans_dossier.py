"""Generate docs/PLANS.md: the formatted physical plan of every
headline query at sf0.1, with the scale-relevant lines annotated.
Regenerate with: PYTHONPATH=. python tools/gen_plans_dossier.py
"""
import re

from bench import HEADLINE
from utils_infra_spark.queries import REGISTRY, _load
from utils_infra_spark.session import get_spark, tune_for_input

SF = "/root/testdata/sf0.1"
spark = get_spark("plans-dossier")
tune_for_input(spark, SF)
_load()

MARKS = ("PushedFilters", "ReadSchema", "BroadcastHashJoin", "SortMergeJoin",
         "TakeOrderedAndProject", "Exchange", "HashAggregate", "MapInPandas",
         "FlatMapGroupsInPandas", "LeftSemi", "WholeStageCodegen")

# Hand-written warm-time attributions, injected under the matching
# query's section so they survive regeneration. Keep these NOTES in
# sync with the stage-timeline measurements they cite
# (tools/profile_topk_timeline.py, bench regime).
NOTES: dict[str, str] = {
    "top3_orders_per_customer": (
        "**Warm-time attribution (r13 stage timeline)** — one job, two "
        "stages: a 5-task partial scan and the 8-task `row_number` window "
        "after the `o_custkey` exchange; plan-build (analysis→physical) "
        "~0.05 s/run, job span ~0.13 s, then Arrow delivery of the full "
        "~45k-row result (the oracle pays the same fetch). The plan is the "
        "minimal W2 shape — one exchange, one window, `rnk <= 3` filter, no "
        "global sort — so the >2× vs DuckDB decomposes entirely into two "
        "stage-scheduling constants + per-run JVM re-planning + result "
        "delivery, each bounded by the no-op floor and none "
        "data-proportional. At 100× the identical two stages fan out across "
        "parquet splits while a single-node engine serializes; FLOOR PROOF, "
        "no code change indicated."
    ),
    "line_dedup_documents": (
        "**Warm-time attribution (r13 stage timeline)** — two jobs "
        "(broadcast `__total_segs` side: 1 task ~0.03 s; main: 1 task "
        "~0.1 s) and ZERO data exchanges: the tiny cached input is one "
        "partition, which trivially satisfies every clustering requirement, "
        "so Catalyst runs posexplode → blank-line filter → sort → "
        "partial/final `min(struct)` → `collect_list` reassembly → "
        "broadcast join as ONE serialized task — the same "
        "no-exchange-below-the-gate rule `spread()` applies everywhere "
        "(the token_histogram A/B showed a forced repartition costs more "
        "than it buys at this input size). The >2× vs DuckDB is DuckDB "
        "running the identical serialized computation minus per-stage "
        "scheduling, per-run re-planning, and the broadcast job. At 100 TB "
        "the same plan receives thousands of splits: the skew-safe "
        "min(struct) SortAggregate distributes per split and the exchange "
        "materializes exactly where required — no single-task funnel exists "
        "at scale (partition-invariance probes). FLOOR PROOF, no code "
        "change indicated."
    ),
    "char_lm_quality_documents": (
        "**r13 changes (stage-timeline driven)** — (1) the normalize "
        "regexp ran serialized in the 1-task pre-exchange stage because "
        "the `char_length >= 3` filter was pushed below the round-robin "
        "exchange; the guard moved into the explode's CASE (nothing "
        "pushable remains). (2) The model upload switched from "
        "createDataFrame — a Python-RDD-backed relation whose broadcast "
        "build forked one Python worker per core per run (~10 s task-time "
        "for ~400 rows) — to a SQL VALUES literal (LocalRelation, "
        "driver-side broadcast, no job). (3) Corpus-side plan fragments "
        "are memoized (pure Py4J expression building); the fit still "
        "re-executes per call and per-run clearCache re-materializes the "
        "norm. Net: 0.669 s (r12 bank) → 0.375 s warm. Remaining cost = "
        "two genuine corpus passes (fit count + score join) + the "
        "documented re-fit honesty contract the paired oracle also pays."
    ),
    "minhash_near_dup_documents": (
        "**r13 change (stage-timeline driven)** — the verify stage joined "
        "a fully-shingled corpus: a second corpus-wide shingle pass (~40% "
        "of query task-time) plus a shuffle of k×-wider shingle arrays for "
        "every document. Verify now joins pair-role rows against the "
        "narrow raw text and shingles only matched rows (`cand` stays "
        "single-consumption, no persist). Remaining warm cost: the sketch "
        "pass itself (shingle → xxhash64 → 16 min-aggs, the operator's "
        "real work), three small reduce stages, and per-run re-planning of "
        "the widest plan in the headline set. Unpaired (rows-only), so "
        "outside the ratio; tracked for wall-time only."
    ),
    "union_distinct_orders": (
        "**r13 change (A/B at the call site)** — one scan with an OR "
        "predicate + distinct replaced the UNION of two filtered scans of "
        "the same table (Catalyst does not rewrite union-of-filters into a "
        "disjunctive scan): ~35% faster warm at sf0.1 and half the scan IO "
        "at 100 TB. Oracle unchanged (the UNION SQL remains the semantic "
        "spec); the heterogeneous multi-SOURCE union shape O4 describes "
        "lives in the funnel/upsert/scraper-fan-in queries."
    ),
}

out = ["""# Headline-query physical plans (sf0.1, tuned session)

Auto-generated by `tools/gen_plans_dossier.py` — the `.explain("formatted")`
output of every headline query, so the scale-relevant shapes (pushdown
reaching the scan, pruned ReadSchema, broadcast vs sort-merge joins,
TakeOrderedAndProject top-k, digest-only exchanges, Arrow-batched Python
stages) can be audited without a running session. The plan-shape
assertions in `tests/test_plans.py` pin the load-bearing lines.
"""]
for name in HEADLINE:
    df = REGISTRY[name].plan(spark, SF)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # keep the tree + the detail lines that matter; drop the rest of the verbose detail section
    lines = plan.splitlines()
    try:
        split_at = next(i for i, ln in enumerate(lines) if not ln.strip())
    except StopIteration:
        split_at = len(lines)
    tree = lines[:split_at]
    details = [ln for ln in lines[split_at:] if any(m in ln for m in ("PushedFilters", "ReadSchema", "Arguments: hashpartitioning"))]
    # strip plan-instance ids so regeneration diffs stay readable
    body = "\n".join(tree + ([""] if details else []) + details)
    body = re.sub(r"#\d+", "#N", body)
    body = re.sub(r"\[plan_id=\d+\]", "[plan_id=N]", body)
    oracle = "oracle-backed" if REGISTRY[name].oracle else "rows-only (no SQL oracle by design)"
    note = NOTES.get(name)
    note_block = f"{note}\n\n" if note else ""
    out.append(f"## {name} ({oracle})\n\n{note_block}```\n{body}\n```\n")

with open("docs/PLANS.md", "w") as f:
    f.write("\n".join(out))
print("wrote docs/PLANS.md,", len(HEADLINE), "plans")
spark.stop()
