"""Per-key fan-out fetch tests (S9/S14): retry, backoff, isolation."""

from __future__ import annotations

from utils_infra_spark.sources.fanout import fan_out_fetch


def test_fanout_fetch_and_isolation(spark):
    keys = spark.createDataFrame([(k,) for k in ["a", "b", "poison", "c"]], "key string")

    def fetch(key: str) -> str:
        if key == "poison":
            raise ValueError("upstream 500")
        return f"payload-for-{key}"

    rows = {r.key: r for r in fan_out_fetch(keys, fetch).collect()}
    assert rows["a"].payload == "payload-for-a" and rows["a"].error is None
    assert rows["a"].attempts == 1
    # poison key: retried to the limit, isolated as an error row
    assert rows["poison"].payload is None
    assert rows["poison"].attempts == 3
    assert "upstream 500" in rows["poison"].error
    assert rows["c"].payload == "payload-for-c"  # later keys unaffected


def test_fanout_retry_then_success(spark):
    # flaky fetcher: fails on first attempt per key, succeeds on retry.
    # attempt state must be per-key LOCAL (executor-side), so use a
    # deterministic rule instead of shared mutable state.
    calls = {}

    def fetch(key: str) -> str:
        calls[key] = calls.get(key, 0) + 1
        if calls[key] == 1:
            raise TimeoutError("flaky")
        return f"ok-{key}"

    keys = spark.createDataFrame([("x",), ("y",)], "key string")
    rows = {r.key: r for r in fan_out_fetch(keys, fetch).collect()}
    assert rows["x"].payload == "ok-x" and rows["x"].attempts == 2
    assert rows["y"].payload == "ok-y" and rows["y"].attempts == 2
