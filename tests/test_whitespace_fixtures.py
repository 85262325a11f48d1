"""Adversarial whitespace parity fixtures (r6 ADVICE): the corpus
operators' tokenization / blank-line / normalization contracts must be
engine-identical on content the driver fixtures never contain —
trailing newlines and tabs (phantom empty tokens under naive
split-on-trim), and U+000B vertical tab (inside Java's ``\\s`` but
outside RE2's, so any ``\\s``-based contract silently diverges the
engines).

Each test runs the PRODUCTION operator on a synthetic Spark DataFrame
and the registered DuckDB oracle on the same rows (view named
``documents``, as the driver registers it), then compares with the
driver-style canonical form. This is the fixture net the sf-dir parity
tests cannot provide: the generated testdata has no trailing
whitespace and no vertical tabs, so these classes were latent there.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from test_oracle_parity import canonicalize
from utils_infra_spark.queries import REGISTRY, _load

_load()

# every class the explicit [ \t\n\x0B\f\r] contract distinguishes:
# trailing LF / trailing tab (phantom-empty-token minting), VT-only
# lines and VT separators (Java-vs-RE2 \s membership), interior runs
# of mixed whitespace, duplicated lines and duplicated 8-token spans
# so the dedup operators produce non-trivial output.
SENTENCE = "the quick brown fox jumps over the lazy dog"  # 9 tokens
FIXTURE_TEXTS: list[str | None] = [
    SENTENCE + " today",                      # 10 tokens, clean
    SENTENCE + " today\n",                    # same tokens + trailing LF
    SENTENCE + " yesterday\t",                # shared 9-token prefix + trailing tab
    "alpha\x0bbeta gamma " + SENTENCE,        # VT as separator
    "\x0b",                                   # VT-only doc: zero tokens, blank line
    "shared line\nunique one\n\x0b\nshared line",  # dup line + VT-only line
    "shared line\nunique two\n",              # cross-doc dup line + trailing LF
    " \t\n\x0b\f\r ",                         # all-whitespace doc
    "",                                       # empty doc
    None,                                     # null text
    "x\r\ny mixed\f ws\ttokens one two three four",  # CR/FF/tab separators
]


@pytest.fixture(scope="module")
def ws_spark_docs(spark):
    rows = [(i + 1, t) for i, t in enumerate(FIXTURE_TEXTS)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def ws_duck():
    con = duckdb.connect()
    pdf = pd.DataFrame(
        {"doc_id": range(1, len(FIXTURE_TEXTS) + 1), "text": FIXTURE_TEXTS}
    ).astype({"doc_id": "int64"})
    con.register("ws_docs", pdf)
    con.execute("CREATE VIEW documents AS SELECT doc_id, text FROM ws_docs")
    yield con
    con.close()


def _assert_parity(name: str, got: pd.DataFrame, want: pd.DataFrame) -> None:
    assert len(got) == len(want), f"{name}: rows {len(got)} != oracle {len(want)}"
    assert sorted(got.columns) == sorted(want.columns)
    g, w = canonicalize(got), canonicalize(want)
    mism = (g != w).any(axis=1)
    if mism.any():
        idx = mism[mism].index[:5]
        raise AssertionError(
            f"{name}: {int(mism.sum())}/{len(g)} rows differ.\nspark:\n{g.loc[idx]}\noracle:\n{w.loc[idx]}"
        )


def test_dup_span_coverage_whitespace_parity(ws_spark_docs, ws_duck):
    from utils_infra_spark.pipeline.dedup import dup_span_coverage

    got = dup_span_coverage(ws_spark_docs, "text", "doc_id", window=8).toPandas()
    want = ws_duck.execute(REGISTRY["dup_span_coverage_documents"].oracle).df()
    # the fixtures must actually exercise the dup path: docs 1 and 2
    # share their full 10-token text modulo the trailing LF, so both
    # carry duplicated windows — if tokenization minted a phantom
    # token for doc 2, its hashes (and n_tokens) would diverge
    assert (want[want["doc_id"].isin([1, 2])]["dup_covered_tokens"] > 0).all()
    assert set(want[want["doc_id"] == 2]["n_tokens"]) == {10}
    _assert_parity("dup_span_coverage", got, want)


def test_line_dedup_whitespace_parity(ws_spark_docs, ws_duck):
    from utils_infra_spark.pipeline.dedup import line_dedup_corpus

    got = line_dedup_corpus(ws_spark_docs, "text", "doc_id").toPandas()
    want = ws_duck.execute(REGISTRY["line_dedup_documents"].oracle).df()
    # doc 6's VT-only line must count as BLANK on both engines (RE2's
    # \s excludes \x0B — the exact divergence the explicit class
    # fixes), and its duplicated "shared line" must be deduped
    d6 = want[want["doc_id"] == 6]
    assert set(d6["dropped_lines"]) == {1}
    assert list(d6["clean_text"]) == ["shared line\nunique one"]
    # no surviving line is whitespace-only (VT-only lines are blank)
    import re

    blank = re.compile(r"^[ \t\x0b\f\r]*$")
    assert not any(
        blank.match(line) for t in want["clean_text"] for line in t.split("\n")
    )
    _assert_parity("line_dedup", got, want)


def test_char_lm_whitespace_parity(ws_spark_docs, ws_duck):
    from utils_infra_spark.pipeline.text import char_trigram_lm_scores

    got = char_trigram_lm_scores(ws_spark_docs, "text", "doc_id").toPandas()
    want = ws_duck.execute(REGISTRY["char_lm_quality_documents"].oracle).df()
    # VT must normalize to a space on both engines: doc 4's trigrams
    # then include 'a b' from "alpha<VT>beta"; and the all-whitespace
    # doc 8 must be excluded (normalizes below 3 chars) on both
    assert 8 not in set(want["doc_id"])
    _assert_parity("char_lm", got, want)


def test_gopher_repetition_whitespace_parity(ws_spark_docs, ws_duck):
    from utils_infra_spark.pipeline.text import repetition_profile

    got = repetition_profile(ws_spark_docs, "text", "doc_id").toPandas()
    want = ws_duck.execute(REGISTRY["gopher_repetition_documents"].oracle).df()
    # the all-whitespace / empty / null docs (8, 9, 10) have no
    # non-blank line and must be excluded by BOTH engines; doc 6's
    # VT-only line must not count as a line
    assert {8, 9, 10}.isdisjoint(set(want["doc_id"]))
    assert set(want[want["doc_id"] == 6]["n_lines"]) == {3}
    _assert_parity("gopher_repetition", got, want)


def test_doc_fingerprint_md5_whitespace_parity(ws_spark_docs, ws_duck):
    from utils_infra_spark.queries import REGISTRY

    q = REGISTRY["doc_fingerprint_md5"]
    # run the registered builder against the fixture frame by renaming
    # the view the oracle reads — the builder itself takes (spark, dir),
    # so drive its body inline on the fixture columns instead
    ws = r"'[ \\t\\n\\x0B\\f\\r]+'"
    got = (
        ws_spark_docs.where("text IS NOT NULL")
        .selectExpr("doc_id", rf"filter(split(text, {ws}), t -> t != '') AS __ts")
        .where("size(__ts) > 0")
        .selectExpr(
            "doc_id",
            "CAST(size(__ts) AS BIGINT) AS n_tokens",
            "CASE WHEN size(__ts) >= 8 THEN"
            " array_min(transform(sequence(1, size(__ts) - 7),"
            " i -> md5(concat_ws(' ', slice(__ts, i, 8)))))"
            " ELSE md5(concat_ws(' ', __ts)) END AS fingerprint",
        )
        .toPandas()
    )
    want = ws_duck.execute(q.oracle).df()
    w = want.set_index("doc_id")
    # docs 1 and 2 differ only by a trailing LF: phantom-token minting
    # would give them different window sets — the fingerprints must match
    assert w.loc[1, "fingerprint"] == w.loc[2, "fingerprint"]
    _assert_parity("doc_fingerprint_md5", got, want)


def test_token_histogram_whitespace_parity(ws_spark_docs, ws_duck):
    # r9 ADVICE sweep: T.tokens and every '\s+' oracle moved to the
    # explicit class in one pass — before it, Java \s split on doc 4's
    # VT while RE2's did not, so "alpha\x0bbeta" was one oracle token
    # but two engine tokens. This is the first VT-content parity run
    # for the token_histogram contract.
    from pyspark.sql import functions as F

    from utils_infra_spark.pipeline import text as T

    got = (
        ws_spark_docs.select(F.explode(T.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    want = ws_duck.execute(REGISTRY["token_histogram"].oracle).df()
    # the VT split must be real on both engines: alpha and beta are
    # separate tokens, and no token contains a vertical tab
    toks = set(want["token"])
    assert "alpha" in toks and "beta" in toks
    assert not any("\x0b" in t for t in toks)
    _assert_parity("token_histogram", got, want)


def test_text_stats_whitespace_parity(ws_spark_docs, ws_duck):
    from pyspark.sql import functions as F

    from utils_infra_spark.pipeline import text as T

    ex = ws_spark_docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_actual"),
        F.explode(T.tokens("text")).alias("tok"),
    )
    n = F.count(F.lit(1))
    got = (
        ex.groupBy("doc_id")
        .agg(
            n.cast("bigint").alias("n_tokens"),
            F.first("n_chars_actual").alias("n_chars_actual"),
            F.round(F.sum(F.length("tok")) / n, 6).alias("avg_token_len"),
            F.round(
                F.sum(F.when(F.lower("tok").isin("the", "a"), 1).otherwise(0)) / n, 6
            ).alias("stopword_ratio"),
        )
        .select("doc_id", "n_tokens", "n_chars_actual", "avg_token_len", "stopword_ratio")
        .toPandas()
    )
    want = ws_duck.execute(REGISTRY["text_stats_documents"].oracle).df()
    # doc 4 ("alpha<VT>beta gamma " + 9-token sentence): VT must
    # separate, so both engines count 12 tokens, not 11
    assert set(want[want["doc_id"] == 4]["n_tokens"]) == {12}
    _assert_parity("text_stats", got, want)


def test_heavy_hitters_whitespace_parity(ws_spark_docs, ws_duck):
    # the r9 ADVICE item by name: the heavy-hitter oracles tokenized
    # with RE2 '\s+' while the engine used Java '\s+' — divergent on
    # exactly this fixture set (U+000B content). Runs the PRODUCTION
    # operator at the registered query's threshold.
    from pyspark.sql import functions as F

    from utils_infra_spark.pipeline import text as T
    from utils_infra_spark.pipeline.sketch import heavy_hitters_exact

    toks = ws_spark_docs.select(F.explode(T.tokens("text")).alias("tok"))
    got = heavy_hitters_exact(toks, "tok", threshold_ppm=2000).toPandas()
    want = ws_duck.execute(REGISTRY["heavy_hitter_tokens_documents"].oracle).df()
    assert "alpha" in set(want["tok"])  # VT-split token reaches the answer
    _assert_parity("heavy_hitter_tokens", got, want)


def test_heavy_hitters_non_string_token_type(spark):
    # r9 ADVICE: the candidate schema hardcoded `tok string`; a bigint
    # id stream must flow through with its type preserved end to end
    import pandas as pd
    from pyspark.sql import functions as F

    from utils_infra_spark.pipeline.sketch import heavy_hitters_exact

    ids = [7] * 60 + [9] * 25 + list(range(100, 115))
    df = spark.createDataFrame(pd.DataFrame({"item_id": pd.Series(ids, dtype="int64")}))
    out = heavy_hitters_exact(df, "item_id", threshold_ppm=200_000)
    assert dict(out.dtypes)["item_id"] == "bigint"
    rows = {r["item_id"]: r["cnt"] for r in out.collect()}
    assert rows == {7: 60, 9: 25}
