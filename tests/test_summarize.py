"""Golden-output tests for the LLM batch-summarize stage
(ref lambda/sitrep-generator/index.py:389-425)."""

import json

import pytest

from utils_infra_spark.pipeline.summarize import (
    extract_json,
    llm_summarize_by_key,
    sitrep_report,
    stub_model,
)


def _features(spark):
    rows = [
        ("quakes", "Q-001", "2024-01-29 10:00:00", '{"mag": 4.2}'),
        ("quakes", "Q-002", "2024-01-29 11:00:00", '{"mag": 3.1}'),
        ("nzta", "SH94", "2024-01-28 08:00:00", '{"status": "closed"}'),
        ("nzta", "SH6", None, None),
    ]
    return spark.createDataFrame(rows, "layer string, callsign string, time string, meta string")


def _summaries(spark):
    return llm_summarize_by_key(
        _features(spark),
        key_col="layer",
        callsign_col="callsign",
        time_col="time",
        metadata_col="meta",
    )


# ---------------------------------------------------------- extract_json
def test_extract_json_strips_prose():
    assert extract_json('noise {"a": 1} trailing') == {"a": 1}


def test_extract_json_no_object_raises():
    with pytest.raises(ValueError):
        extract_json("the model rambled with no JSON at all")


# ---------------------------------------------------------- golden outputs
def test_summarize_golden_rows(spark):
    got = {r["layer"]: r.asDict() for r in _summaries(spark).collect()}
    assert got["quakes"] == {
        "layer": "quakes",
        "n_features": 2,
        "summary_line": "quakes: 2 active features",
        "brief_report": "Layer quakes reports 2 active features "
        "(2024-01-29 10:00:00..2024-01-29 11:00:00). Showing 2 in context.",
        "assessment": "stable",
        "model": "stub-deterministic",
    }
    assert got["nzta"]["summary_line"] == "nzta: 2 active features"
    # null time/metadata features survive the compact projection
    assert got["nzta"]["n_features"] == 2


def test_summarize_deterministic_across_runs(spark):
    a = sorted(map(str, _summaries(spark).collect()))
    b = sorted(map(str, _summaries(spark).collect()))
    assert a == b


def test_max_items_caps_prompt_not_count(spark):
    rows = [("L", f"c{i:03d}", f"2024-01-{10 + i % 15:02d} 00:00:00", "{}") for i in range(120)]
    df = spark.createDataFrame(rows, "layer string, callsign string, time string, meta string")
    out = llm_summarize_by_key(
        df, key_col="layer", callsign_col="callsign", time_col="time", metadata_col="meta", max_items=10
    ).collect()
    assert len(out) == 1
    # true group size reported (reference's feature_counts), not the cap
    assert out[0]["n_features"] == 120
    # stub reports how many items made it into the bounded context
    assert "Showing 10 in context" in out[0]["brief_report"]
    # >100 features flips the stub's assessment
    assert out[0]["assessment"] == "elevated"


def test_model_failure_isolated_per_layer(spark):
    def broken(prompt: str) -> str:
        if '"layer": "nzta"' in prompt:
            return "no json here"
        return stub_model(prompt)

    out = {
        r["layer"]: r.asDict()
        for r in llm_summarize_by_key(
            _features(spark),
            key_col="layer",
            callsign_col="callsign",
            time_col="time",
            metadata_col="meta",
            model=broken,
        ).collect()
    }
    assert out["quakes"]["assessment"] == "stable"  # healthy layer unaffected
    assert out["nzta"]["assessment"] == "unknown"
    assert "summarize failed" in out["nzta"]["brief_report"]
    assert out["nzta"]["n_features"] == 2  # count survives model failure


# ---------------------------------------------------------- K3 report
def test_sitrep_report_shape(spark):
    report = json.loads(sitrep_report(_summaries(spark), generated_at="2024-01-30T00:00:00Z"))
    assert report["generated_at"] == "2024-01-30T00:00:00Z"
    assert report["feature_counts"] == {"nzta": 2, "quakes": 2}
    assert report["assessment"] == "stable"
    assert "quakes: 2 active features" in report["summary_line"]


# ---------------------------------------------------------- judged query
def test_sitrep_summarize_query(spark, sf_dir):
    from __spark_entry__ import queries

    out = queries()["sitrep_summarize"](spark, sf_dir).collect()
    layers = [r["layer"] for r in out]
    assert layers == sorted(layers) and len(layers) > 0
    assert all(r["model"] == "stub-deterministic" for r in out)
    assert all(r["n_features"] > 0 for r in out)
