"""Per-key fan-out fetch source (S9/S14; ref power-outages/scrapers/
tlc.js:28-85 — one HTTP request per locality×faultType — and the
retry/backoff pattern of weather-proxy/server.js:149-159).

Spark shape: the key list parallelizes across the cluster
(``spread``), each partition's keys are fetched inside an
Arrow-batched ``mapInPandas`` stage with per-key retry + exponential
backoff + failure isolation (a dead key yields an error row, not a
dead stage — the reference's ``Promise.allSettled`` semantics).

The fetcher is injected (``fetch_fn: key -> payload``) so tests use a
deterministic stub and production plugs in an HTTP client. I/O
concurrency = partition count; at 1000 executors the fan-out is
bounded by ``spread``'s partitioning, the Spark analog of the
reference's worker-pool limit.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

FANOUT_SCHEMA = "key string, payload string, attempts int, error string"


def fan_out_fetch(
    keys: DataFrame,
    fetch_fn: Callable[[str], str],
    *,
    key_col: str = "key",
    max_retries: int = 3,
    backoff_base_s: float = 0.0,
) -> DataFrame:
    """Fetch one payload per key with retry/backoff/failure-isolation.

    Returns (key, payload, attempts, error); error rows have NULL
    payload — callers filter or route them to a dead-letter sink.
    """
    from .tables import spread

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"key": [], "payload": [], "attempts": [], "error": []}
            for key in pdf[key_col]:
                payload, err, attempt = None, None, 0
                for attempt in range(1, max_retries + 1):
                    try:
                        payload = fetch_fn(key)
                        err = None
                        break
                    except Exception as ex:  # noqa: BLE001 — isolate per key
                        err = f"{type(ex).__name__}: {ex}"
                        if attempt < max_retries and backoff_base_s:
                            time.sleep(backoff_base_s * (2 ** (attempt - 1)))
                out["key"].append(str(key))
                out["payload"].append(payload)
                out["attempts"].append(attempt)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return spread(keys.select(key_col), min_bytes=0).mapInPandas(fn, schema=FANOUT_SCHEMA)
