"""Stage-timeline attribution for a bench headliner's warm run —
the r10/r11 verdict ask for `embedding_topk_cosine` (0.10 s over the
no-op floor, unattributed through three judge runs).

Replicates the bench regime exactly: tuned session (tune_for_input),
block-manager input cache, prepared logical plan, fresh
QueryExecution per run, Arrow-table delivery. One timed warm run is
then decomposed against the Spark UI REST API (/api/v1) into:

  * per-job driver latency (submission gap before the first task)
  * per-stage spans: scheduling delay, task wall, inter-stage gaps
  * JVM-side total vs Python-measured wall (the difference is Py4J
    command latency + Arrow fetch + driver-side planning)

plus two isolations run the same way:
  * plan-build-only (analysis+optimization+physical planning, no exec)
  * the no-op floor (spark.range(1) toArrow) for the same session

Usage: python tools/profile_topk_timeline.py [query_name ...]
(defaults to embedding_topk_cosine; any registry headliner works).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from utils_infra_spark.queries import REGISTRY, _load  # noqa: E402
from utils_infra_spark.session import get_spark, tune_for_input  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 6


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def _ms(iso: str) -> float:
    # Spark REST timestamps: '2026-08-16T12:34:56.789GMT'
    from datetime import datetime, timezone

    return (
        datetime.strptime(iso.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        .astimezone(timezone.utc)
        .timestamp()
    )


def profile(name: str) -> None:
    # the engine session disables the UI by default; the profiler
    # needs the REST endpoint
    os.environ["SPARK_GRAFT_UI"] = "true"
    spark = get_spark("topk-profile")
    if spark.sparkContext.uiWebUrl is None:
        raise SystemExit("UI still disabled — stop any existing session first")
    tune_for_input(spark, SF_DIR)
    _load()
    from utils_infra_spark.session import is_tiny_input
    from utils_infra_spark.sources.tables import cache_base_tables, set_input_mode

    if is_tiny_input(spark):
        cache_base_tables(spark, SF_DIR)
        set_input_mode("cached")
    q = REGISTRY[name]
    spark.range(1000).selectExpr("sum(id)").collect()

    # warm: plan cache + codegen + JIT, exactly like bench's non-cold runs
    walls = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        q.plan(spark, SF_DIR).select("*").toArrow()
        walls.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    print(f"== {name} @ {SF_DIR} ==")
    print("walls:", [round(w, 4) for w in walls], "min-warm:", round(min(walls[1:]), 4))

    # the TIMED run: bracket with REST job list
    jobs_before = {j["jobId"] for j in _rest(spark, "/jobs")}
    t0 = time.perf_counter()
    q.plan(spark, SF_DIR).select("*").toArrow()
    wall = time.perf_counter() - t0
    t_end = time.time()
    t_start = t_end - wall
    jobs = [j for j in _rest(spark, "/jobs") if j["jobId"] not in jobs_before]
    jobs.sort(key=lambda j: j["jobId"])
    print(f"timed wall {wall:.4f}s, {len(jobs)} job(s)")
    jvm_total = 0.0
    cursor = t_start
    for j in jobs:
        jsub, jend = _ms(j["submissionTime"]), _ms(j["completionTime"])
        jvm_total += jend - jsub
        print(
            f"  job {j['jobId']}: pre-submit gap {jsub - cursor:+.4f}s, "
            f"span {jend - jsub:.4f}s, stages {sorted(j['stageIds'])}"
        )
        cursor = jend
        for sid in sorted(j["stageIds"]):
            try:
                # /stages/{sid} returns ALL attempts, unordered —
                # take the completed one (fall back to the highest
                # attemptId), not blindly [0]
                atts = [a for a in _rest(spark, f"/stages/{sid}") if "submissionTime" in a]
                done = [a for a in atts if a.get("status") == "COMPLETE"]
                st = (done or sorted(atts, key=lambda a: a.get("attemptId", 0)))[-1]
            except Exception:
                continue
            ssub = _ms(st["submissionTime"])
            sfirst = _ms(st.get("firstTaskLaunchedTime", st["submissionTime"]))
            sdone = _ms(st["completionTime"])
            print(
                f"    stage {sid}: tasks {st['numCompleteTasks']}, "
                f"sub->first-task {sfirst - ssub:.4f}s, "
                f"first-task->done {sdone - sfirst:.4f}s, "
                f"task-time(sum) {st['executorRunTime'] / 1000:.4f}s, "
                f"name {st['name'].split()[0]}"
            )
    print(
        f"  post-last-job tail (Arrow fetch + Py4J return): {t_end - cursor:.4f}s"
        f" | jvm job spans total {jvm_total:.4f}s | wall-jvm residue "
        f"{wall - jvm_total:.4f}s (driver planning + Py4J + Arrow)"
    )

    # isolation A: plan build only (no execution)
    tp = []
    for _ in range(4):
        t0 = time.perf_counter()
        df = q.plan(spark, SF_DIR).select("*")
        df._jdf.queryExecution().executedPlan()
        tp.append(time.perf_counter() - t0)
    print("plan-build only (analysis→physical):", [round(x, 4) for x in tp])

    # isolation B: no-op floor in this same session
    fl = []
    noop = spark.range(1)
    for _ in range(4):
        t0 = time.perf_counter()
        noop.select("*").toArrow()
        fl.append(time.perf_counter() - t0)
    print("no-op floor:", [round(x, 4) for x in fl])
    set_input_mode("parquet")
    spark.stop()


if __name__ == "__main__":
    for nm in sys.argv[1:] or ["embedding_topk_cosine"]:
        profile(nm)
