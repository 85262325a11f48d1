"""LLM batch-summarize stage (the sitrep pipeline's model step).

Re-expresses the reference's scheduled sitrep generator as a Spark
batch operator (ref lambda/sitrep-generator/index.py:397-425
``call_bedrock``, :389-394 ``extract_json``, :300-336
``feature_to_context``/``line_endpoints``, :339-383
``build_context``): features are grouped per layer key, each group is
projected to a compact context (the reference sends only
callsign/time/metadata per feature — never geometry), formatted into
ONE prompt per group, and a pluggable model callable is invoked
executor-side inside ``applyInPandas``; the first ``{...}`` JSON
object in the model's reply is extracted and lands as typed columns.

Scale shape: one shuffle on the layer key, then one model call per
layer — the prompt is BOUNDED (``max_items`` cap + compact
projection) so its size is independent of corpus size, and layers
summarize in parallel across executors. This is the 100 TB version
of the reference's 15-minute Lambda cron: same contract, but the
feature scan is a distributed read instead of a paginated REST loop
and the model fan-out rides the cluster.

The default model is a deterministic STUB — this container has no
model runtime, and golden-output tests need reproducibility. The
stub parses the context back out of the prompt and answers with the
same JSON contract the reference expects from Bedrock
(summary_line / brief_report / full_report / assessment), wrapped in
prose so ``extract_json`` is genuinely exercised. Swap in a real
callable (`prompt -> response text`) for production.
"""

from __future__ import annotations

import json
import re
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# condensed from the reference's SYSTEM_PROMPT: the model answers with
# one JSON object; prose outside the braces is tolerated (extract_json)
SYSTEM_PROMPT = (
    "You are a situational-report writer. Given the JSON context of "
    "active features for one layer, reply with a single JSON object "
    'with keys "summary_line" (one display-ticker line), '
    '"brief_report" (3-4 lines), "full_report" and "assessment" '
    '(one of "stable", "elevated").'
)

SUMMARY_SCHEMA = (
    "layer string, n_features bigint, summary_line string, "
    "brief_report string, assessment string, model string"
)


def extract_json(text: str) -> dict:
    """First ``{...}`` object in the model reply (ref index.py:389-394:
    models pad JSON with prose; truncation shows up here as a parse
    error, which the caller surfaces per-layer instead of failing the
    whole report)."""
    match = re.search(r"\{.*\}", text, re.DOTALL)
    if not match:
        raise ValueError(f"No JSON object found in model response: {text[:200]}")
    return json.loads(match.group(0))


def stub_model(prompt: str) -> str:
    """Deterministic stand-in for the Bedrock call (same reply
    contract, no network): reads the context JSON back out of the
    prompt and derives the report fields from it. Wrapped in prose so
    extract_json has to do its job."""
    ctx = json.loads(prompt.split("Context:\n", 1)[1])
    layer, items, n = ctx["layer"], ctx["items"], ctx["n_features"]
    times = sorted(t for t in (i.get("time") for i in items) if t)
    span = f"{times[0]}..{times[-1]}" if times else "no timestamps"
    out = {
        "summary_line": f"{layer}: {n} active feature{'s' if n != 1 else ''}",
        "brief_report": f"Layer {layer} reports {n} active features ({span}). "
        f"Showing {len(items)} in context.",
        "full_report": f"## {layer}\n\n{n} features active; context sample of {len(items)}.",
        "assessment": "elevated" if n > 100 else "stable",
    }
    return f"Here is the situational report.\n{json.dumps(out)}\nEnd of report."


def llm_summarize_by_key(
    df: DataFrame,
    *,
    key_col: str,
    callsign_col: str,
    time_col: str,
    metadata_col: str,
    model: Callable[[str], str] | None = None,
    model_id: str = "stub-deterministic",
    max_items: int = 50,
    prompt_header: str = SYSTEM_PROMPT,
) -> DataFrame:
    """One summarize call per ``key_col`` group → one report row each.

    Context parity with the reference: each item carries ONLY
    (callsign, time, metadata) — the compact projection of
    feature_to_context (index.py:300-306) — and the item list is
    capped at ``max_items`` after a deterministic (time, callsign)
    sort, newest first, so reruns and retried tasks build the same
    prompt. ``n_features`` is the TRUE group size (the reference's
    feature_counts), independent of the cap.
    """
    fn = model if model is not None else stub_model

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        key = str(pdf["__key"].iloc[0])
        n = len(pdf)
        pdf = pdf.sort_values(["__time", "__callsign"], ascending=[False, True]).head(max_items)
        items = [
            {
                "callsign": None if pd.isna(r["__callsign"]) else str(r["__callsign"]),
                "time": None if pd.isna(r["__time"]) else str(r["__time"]),
                "metadata": None if pd.isna(r["__metadata"]) else str(r["__metadata"]),
            }
            for r in pdf.to_dict("records")
        ]
        context = {"layer": key, "n_features": n, "items": items}
        prompt = f"{prompt_header}\n\nContext:\n{json.dumps(context, sort_keys=True)}"
        try:
            parsed = extract_json(fn(prompt))
            row = {
                "layer": key,
                "n_features": n,
                "summary_line": str(parsed.get("summary_line", "")),
                "brief_report": str(parsed.get("brief_report", "")),
                # reference defaults a missing assessment to "stable"
                # (index.py:462) rather than failing the report
                "assessment": str(parsed.get("assessment", "stable")),
                "model": model_id,
            }
        except Exception as exc:  # per-layer failure isolation (T6)
            row = {
                "layer": key,
                "n_features": n,
                "summary_line": "",
                "brief_report": f"summarize failed: {exc}",
                "assessment": "unknown",
                "model": model_id,
            }
        return pd.DataFrame([row])

    narrow = df.select(
        F.col(key_col).cast("string").alias("__key"),
        F.col(callsign_col).cast("string").alias("__callsign"),
        F.col(time_col).cast("string").alias("__time"),
        F.col(metadata_col).cast("string").alias("__metadata"),
    )
    return narrow.groupBy("__key").applyInPandas(summarize, schema=SUMMARY_SCHEMA)


def sitrep_report(summaries: DataFrame, *, generated_at: str, model_id: str = "stub-deterministic") -> str:
    """Assemble the K3-style single-object report from the per-layer
    summary frame (ref index.py:455-463): feature_counts map + the
    concatenated layer lines. Driver-side by design — the input is
    one row per layer."""
    rows = sorted(summaries.collect(), key=lambda r: r["layer"])
    return json.dumps(
        {
            "generated_at": generated_at,
            "model": model_id,
            "summary_line": " | ".join(r["summary_line"] for r in rows if r["summary_line"]),
            "brief_report": "\n".join(r["brief_report"] for r in rows),
            "feature_counts": {r["layer"]: r["n_features"] for r in rows},
            "assessment": (
                "elevated" if any(r["assessment"] == "elevated" for r in rows) else "stable"
            ),
        },
        sort_keys=True,
    )
