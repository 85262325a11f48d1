"""Adversarial parity fixtures for the r7 corpus-quality trio —
Gopher quality rules, C4 line cleaning, DSIR importance weights — on
content the generated testdata never contains: CRLF line endings
(which defeat terminal-punctuation checks unless the per-line
edge-trim strips \r), vertical tabs (Java-\\s vs RE2-\\s membership),
bullet/ellipsis line shapes, lorem-ipsum/brace screens, and
negative-score DSIR documents.

Same harness as test_whitespace_fixtures: production operator on a
synthetic Spark frame vs the registered DuckDB oracle on identical
rows, compared in the driver's canonical form.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from test_oracle_parity import canonicalize
from utils_infra_spark.queries import REGISTRY, _load

_load()

_SW = "the be to of and that have with"  # all 8 Gopher stopwords
# a 56-word paragraph that passes every Gopher quality gate
_GOOD = ("the quick brown fox jumps over a lazy dog and then walks back "
         "to town because it wants food that people have left with care "
         "for animals in need of warmth be it summer or winter and this "
         "line keeps going until the word count clears fifty easily now ok")

FIXTURES: list[tuple[str | None, str]] = [
    # (text, lang)
    (_GOOD, "en"),                                            # 1: passes quality
    ("short doc", "en"),                                      # 2: word count fail
    ("# " * 60 + _SW, "en"),                                  # 3: symbol-ratio fail
    ("- bullet one\n- bullet two\n- bullet three\n" + _GOOD, "en"),   # 4: bullets
    ("trailing dots...\nmore dots…\nclean line here\n" + _GOOD, "en"),  # 5: ellipses
    ("\t- tab-led bullet line\n• real bullet\n* star\n" + _SW, "en"),  # 6: tab-led bullet
    ("12345 67890 !!! ??? " * 20 + _SW, "en"),                # 7: alpha-frac fail
    ("this crlf line has five words.\r\nanother crlf sentence sits right here.\r\n"
     "short line.\r\n", "en"),                                # 8: CRLF endings
    ("this page contains lorem ipsum filler text in volume.\n"
     "a second proper sentence lives here today.\n"
     "and a third proper sentence follows it naturally.", "en"),  # 9: lorem screen
    ("var x = {a: 1};\nthis line mentions javascript explicitly here.\n"
     "a perfectly good sentence ends right here.", "en"),     # 10: brace + javascript
    ("une phrase française assez longue pour être utile ici.", "fr"),  # 11: non-target
    ("没有空格的中文文本不会分词", "zh"),                      # 12: zero-space CJK
    ("ends with quote \"so it counts.\"\nno terminal punct here\n"
     "only four words here.\nfive proper words end here.", "en"),  # 13: quote-end
    ("\x0b\nvertical\x0btab separated tokens here.\n \t\r ", "en"),  # 14: VT
    ("", "en"),                                               # 15: empty
    (None, "en"),                                             # 16: null
    ("....\nfour dots make one ellipsis plus a dot.\n" + _SW, "en"),  # 17: '....'
]


# boilerplate/control-char shapes: three same-source docs sharing a
# footer line (boilerplate at min_docs=3), a two-doc repeat (NOT
# boilerplate), and encoding damage (U+FFFD / C0 controls)
FIXTURES += [
    ("unique alpha content line.\nFOOTER: all rights reserved\nmore body text.", "en"),
    ("different middle body line.\nFOOTER: all rights reserved", "en"),
    ("FOOTER: all rights reserved\nclosing words of the third doc.", "en"),
    ("twice-shared line only\nown content here.", "en"),
    ("twice-shared line only\nother own content.", "en"),
    ("clean text then damage \ufffd\ufffd here.", "en"),
    ("control\x01chars\x1fin\x7fhere", "en"),
]


@pytest.fixture(scope="module")
def qx_spark_docs(spark):
    rows = [
        (i + 1, t, lang, "webA" if i >= len(FIXTURES) - 7 else "webB")
        for i, (t, lang) in enumerate(FIXTURES)
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )


@pytest.fixture(scope="module")
def qx_duck():
    con = duckdb.connect()
    pdf = pd.DataFrame(
        {
            "doc_id": range(1, len(FIXTURES) + 1),
            "text": [t for t, _ in FIXTURES],
            "lang": [lg for _, lg in FIXTURES],
            "source": [
                "webA" if i >= len(FIXTURES) - 7 else "webB"
                for i in range(len(FIXTURES))
            ],
        }
    ).astype({"doc_id": "int64"})
    con.register("qx_docs", pdf)
    con.execute(
        "CREATE VIEW documents AS SELECT doc_id, text, lang, source FROM qx_docs"
    )
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
            f"{name}: {int(mism.sum())}/{len(g)} rows differ.\n"
            f"spark:\n{g.loc[idx]}\noracle:\n{w.loc[idx]}"
        )


def test_gopher_quality_whitespace_parity(qx_spark_docs, qx_duck):
    from utils_infra_spark.pipeline.text import quality_profile

    got = quality_profile(qx_spark_docs, "text", "doc_id").toPandas()
    want = qx_duck.execute(REGISTRY["gopher_quality_documents"].oracle).df()
    w = want.set_index("doc_id")
    assert bool(w.loc[1, "quality_pass"])            # the designed pass
    assert not bool(w.loc[2, "quality_pass"])        # word count
    assert w.loc[3, "hash_word_ratio"] > 0.1         # hash symbols counted
    assert not bool(w.loc[3, "quality_pass"])        # EITHER ratio fails alone
    assert w.loc[4, "bullet_line_frac"] > 0          # dash bullets counted
    assert w.loc[5, "ellipsis_line_frac"] > 0        # both ellipsis forms
    assert w.loc[6, "bullet_line_frac"] == 0.5       # tab-led line NOT a bullet
    assert w.loc[7, "alpha_word_frac"] < 0.8         # digit/punct tokens
    # doc 17: '....' = one non-overlapping '...' occurrence (+ none unicode)
    assert w.loc[17, "ellipsis_word_ratio"] > 0
    assert w.loc[17, "hash_word_ratio"] == 0.0       # ratios are separate
    assert 15 not in w.index and 16 not in w.index   # empty/null excluded
    _assert_parity("gopher_quality", got, want)


def test_c4_line_filters_whitespace_parity(qx_spark_docs, qx_duck):
    from utils_infra_spark.pipeline.text import c4_line_filter

    got = c4_line_filter(qx_spark_docs, "text", "doc_id").toPandas()
    want = qx_duck.execute(REGISTRY["c4_line_filters_documents"].oracle).df()
    w = want.set_index("doc_id")
    # CRLF doc: both \r\n-terminated sentences survive the edge-trim
    # (the 'short line.' has < 5 words and drops)
    assert w.loc[8, "kept_lines"] == 2
    assert "\r" not in w.loc[8, "clean_text"]
    assert bool(w.loc[9, "has_lorem"]) and not bool(w.loc[9, "c4_keep"])
    assert bool(w.loc[10, "has_brace"]) and not bool(w.loc[10, "c4_keep"])
    # javascript line dropped even though it has 5+ words and a period
    assert "javascript" not in w.loc[10, "clean_text"]
    # quote-terminated line retained; bare line dropped
    assert 'counts."' in w.loc[13, "clean_text"]
    assert w.loc[13, "kept_lines"] == 2
    assert w.loc[15, "kept_lines"] == 0              # empty doc audited, not dropped
    _assert_parity("c4_line_filters", got, want)


def test_dsir_importance_whitespace_parity(qx_spark_docs, qx_duck):
    from utils_infra_spark.pipeline.text import dsir_importance_scores

    got = dsir_importance_scores(qx_spark_docs, "text", "doc_id").toPandas()
    want = qx_duck.execute(REGISTRY["dsir_importance_documents"].oracle).df()
    w = want.set_index("doc_id")
    # the French doc's tokens skew away from the en-heavy target: its
    # per-token score must undercut the designed-English doc's
    g1 = w.loc[1, "dsir_nanonats"] / w.loc[1, "n_tokens"]
    g11 = w.loc[11, "dsir_nanonats"] / w.loc[11, "n_tokens"]
    assert g1 > g11
    # zero-space CJK is ONE token (no whitespace to split on)
    assert w.loc[12, "n_tokens"] == 1
    assert 15 not in w.index and 16 not in w.index
    _assert_parity("dsir_importance", got, want)


def test_boilerplate_line_removal_parity(qx_spark_docs, qx_duck):
    from utils_infra_spark.pipeline.dedup import boilerplate_line_removal

    got = boilerplate_line_removal(
        qx_spark_docs, "text", "doc_id", "source", min_docs=3
    ).toPandas()
    want = qx_duck.execute(
        REGISTRY["boilerplate_line_removal_documents"].oracle
    ).df()
    w = want.set_index("doc_id")
    n = len(FIXTURES)
    d1, d2, d3, t1, t2 = n - 6, n - 5, n - 4, n - 3, n - 2
    # the footer appears in 3 distinct same-source docs -> removed everywhere
    for d in (d1, d2, d3):
        assert w.loc[d, "removed_lines"] == 1, d
        assert "FOOTER" not in w.loc[d, "clean_text"]
    # a doc that was ONLY the footer + one line keeps its other line
    assert w.loc[d2, "kept_lines"] == 1
    # a line shared by only TWO docs survives (distinct-doc threshold)
    assert w.loc[t1, "removed_lines"] == 0 and w.loc[t2, "removed_lines"] == 0
    assert "twice-shared" in w.loc[t1, "clean_text"]
    _assert_parity("boilerplate_line_removal", got, want)


def test_control_char_profile_parity(qx_spark_docs, qx_duck):
    from utils_infra_spark.pipeline.text import control_char_profile

    got = control_char_profile(qx_spark_docs, "text", "doc_id").toPandas()
    want = qx_duck.execute(REGISTRY["control_char_profile_documents"].oracle).df()
    w = want.set_index("doc_id")
    n = len(FIXTURES)
    dmg, ctl = n - 1, n
    assert w.loc[dmg, "replacement_chars"] == 2
    assert not bool(w.loc[dmg, "encoding_pass"])
    assert w.loc[ctl, "control_chars"] == 3
    assert not bool(w.loc[ctl, "encoding_pass"])
    # the clean designed doc passes
    assert bool(w.loc[1, "encoding_pass"])
    _assert_parity("control_char_profile", got, want)


_PASS_LINE1 = ("the quick brown fox jumps over a lazy dog and then walks back to town "
               "because it wants food that people have left out with care today.")
_PASS_LINE2 = ("a second proper sentence lives here and keeps the word count moving "
               "toward the fifty word floor that the quality rules demand of it.")
_PASS_LINE3 = ("finally the third line closes the document with enough plain words "
               "to be kept by every single gate in the cleaning pipeline.")
_FULL_PASS = "\n".join([_PASS_LINE1, _PASS_LINE2, _PASS_LINE3])


def test_pretrain_pipeline_full_pass_and_dup_flag(spark):
    """The composed pipeline must be able to KEEP a document (the
    generated testdata is single-line, so C4's >=3-lines rule fails
    everything there — this pins the positive path), and must flag
    the exact-dup copy while keeping the min-doc_id original."""
    import duckdb as _duck

    import pandas as pd

    from utils_infra_spark.queries import REGISTRY

    rows = [
        (1, _FULL_PASS, "en", "webA"),
        (2, _FULL_PASS, "en", "webA"),      # byte-identical dup of 1
        (3, "short doc", "en", "webA"),     # fails word count
        (4, None, "en", "webA"),            # excluded
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string, source string")
    # the builder takes (spark, sf_dir); run the same composition on the
    # fixture frame via the lib pieces it chains
    from utils_infra_spark.pipeline.text import (
        c4_line_filter,
        control_char_profile,
        quality_profile,
        repetition_profile,
    )
    from pyspark.sql import functions as F

    base = df.where("text IS NOT NULL")
    digs = base.selectExpr("doc_id", "md5(text) AS __dig")
    keeper = digs.groupBy("__dig").agg(F.expr("MIN(doc_id) AS __keeper"))
    dup = digs.join(keeper, "__dig").selectExpr("doc_id", "doc_id != __keeper AS is_exact_dup")
    out = (
        base.select("doc_id")
        .join(dup, "doc_id")
        .join(c4_line_filter(df, "text", "doc_id").select("doc_id", "c4_keep"), "doc_id", "left")
        .join(quality_profile(df, "text", "doc_id").select("doc_id", "quality_pass"), "doc_id", "left")
        .join(repetition_profile(df, "text", "doc_id").select("doc_id", "gopher_pass"), "doc_id", "left")
        .join(control_char_profile(df, "text", "doc_id").select("doc_id", "encoding_pass"), "doc_id", "left")
        .selectExpr(
            "doc_id",
            "COALESCE(c4_keep, FALSE) AND COALESCE(quality_pass, FALSE)"
            " AND COALESCE(gopher_pass, FALSE) AND COALESCE(encoding_pass, FALSE)"
            " AND NOT is_exact_dup AS final_keep",
            "is_exact_dup",
        )
        .toPandas()
        .set_index("doc_id")
    )
    assert bool(out.loc[1, "final_keep"])          # the designed keeper
    assert bool(out.loc[2, "is_exact_dup"])        # byte-identical copy flagged
    assert not bool(out.loc[2, "final_keep"])
    assert not bool(out.loc[3, "final_keep"])      # too short
    assert 4 not in out.index
    # oracle agreement on the same fixture (the registered composed SQL)
    con = _duck.connect()
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": [r[3] for r in rows],
        }
    ).astype({"doc_id": "int64"})
    con.register("qx", pdf)
    con.execute("CREATE VIEW documents AS SELECT * FROM qx")
    w = con.execute(REGISTRY["pretrain_pipeline_documents"].oracle).df().set_index("doc_id")
    assert bool(w.loc[1, "final_keep"]) and not bool(w.loc[2, "final_keep"])
    con.close()


def test_gate_flags_fused_equals_component_profiles(qx_spark_docs, spark):
    """gate_flags (the capstone's fused single-projection form of the
    three in-row gates) must be VALUE-IDENTICAL to the canonical
    profile functions on the adversarial fixture corpus, with the
    profiles' row-domain filters folded in as FALSE (zero-token docs
    for quality, empty docs for encoding). This is the anti-drift pin:
    the fused expressions are copies, so a future one-sided edit of
    either form fails here."""
    from utils_infra_spark.pipeline.text import (
        c4_line_filter,
        control_char_profile,
        gate_flags,
        quality_profile,
    )

    df = qx_spark_docs
    fused = (
        gate_flags(df, "text", "doc_id", extra_cols={"__dig": "md5(text)"})
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    want = (
        c4_line_filter(df, "text", "doc_id")
        .select("doc_id", "c4_keep")
        .join(
            quality_profile(df, "text", "doc_id").select("doc_id", "quality_pass"),
            "doc_id",
            "left",
        )
        .join(
            control_char_profile(df, "text", "doc_id").select("doc_id", "encoding_pass"),
            "doc_id",
            "left",
        )
        .selectExpr(
            "doc_id",
            "c4_keep",
            "COALESCE(quality_pass, FALSE) AS quality_pass",
            "COALESCE(encoding_pass, FALSE) AS encoding_pass",
        )
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # same row domain (every non-null-text doc appears exactly once)
    assert list(fused.index) == list(want.index)
    for col in ("c4_keep", "quality_pass", "encoding_pass"):
        diff = fused[col] != want[col]
        assert not diff.any(), f"{col} differs at doc_ids {list(fused.index[diff])}"
    # the extra_cols rider matches a direct projection
    dig = (
        df.where("text IS NOT NULL")
        .selectExpr("doc_id", "md5(text) AS want_dig")
        .toPandas()
        .set_index("doc_id")["want_dig"]
    )
    assert (fused["__dig"].sort_index() == dig.sort_index()).all()
