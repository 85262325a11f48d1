"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

Everything is built-in Column expressions (split / regexp / HOFs) —
at 100 TB these run as one codegen projection over the documents
scan, no Python in the loop.
"""

from __future__ import annotations

import weakref

from pyspark.sql import Column
from pyspark.sql import functions as F

# session -> the char-LM build's persisted trigram stream; each new
# build unpersists its predecessor (leak bound + the honesty pin —
# see char_trigram_lm_scores)
_TRIS_CACHE: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()

# tiny per-language stopword lists for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "es"],
    "fr": ["le", "la", "de", "et", "est"],
    "de": ["der", "die", "das", "und", "ist"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (empty string → empty array)."""
    text = F.col(text) if isinstance(text, str) else text
    t = F.split(F.trim(text), r"\s+")
    return F.when(F.trim(text) == "", F.array().cast("array<string>")).otherwise(t)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """A BPE-flavored proxy: count word-piece units as
    ceil(chars/4) per word, the common ~4-chars-per-token rule."""
    toks = tokens(text)
    return F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("long")
    )


def avg_token_len(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, F.round(total / F.size(toks), 6)).otherwise(F.lit(None))


def stopword_ratio(text: Column | str, stopwords: list[str]) -> Column:
    toks = tokens(text)
    sw = F.size(F.filter(toks, lambda t: F.lower(t).isin(*stopwords)))
    return F.when(F.size(toks) > 0, F.round(sw / F.size(toks), 6)).otherwise(F.lit(0.0))


def punct_ratio(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(F.regexp_replace(text, r"[^\.,;:!\?'\"-]", ""))
    return F.when(F.length(text) > 0, F.round(n_punct / F.length(text), 6)).otherwise(F.lit(0.0))


def quality_score(text: Column | str, stopwords: list[str] | None = None) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword
    presence + sane average token length. Deterministic, monotone in
    each signal — a Gopher-rules-flavored filter."""
    sw = stopwords or LANG_MARKERS["en"]
    n = token_count(text)
    len_ok = F.when((n >= 10) & (n <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
    sw_sig = F.least(stopword_ratio(text, sw) * 4, F.lit(1.0)) * 0.3
    atl = avg_token_len(text)
    atl_ok = F.when((atl >= 2.5) & (atl <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
    return F.round(len_ok + sw_sig + atl_ok, 6)


def lang_scores(text: Column | str) -> Column:
    """Stopword-hit score per language → map<string,double>."""
    toks = tokens(text)
    entries = []
    for lang, words in LANG_MARKERS.items():
        hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*words)))
        score = F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))
        entries.extend([F.lit(lang), score])
    return F.create_map(*entries)


def lang_guess(text: Column | str) -> Column:
    """argmax over lang_scores; 'und' when nothing scores > 0."""
    toks = tokens(text)
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    # ordered when-chain: later langs win only with STRICTLY higher score
    for lang, words in LANG_MARKERS.items():
        hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*words)))
        score = F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))
        best_lang = F.when(score > best_score, F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(score, best_score)
    return best_lang


def rolling_fingerprint_from_tokens(toks: Column | str, window: int = 8) -> Column:
    """Winnowing-style fingerprint from a token-array ATTRIBUTE (this
    expression references ``toks`` ~window+2 times — alias the token
    column in its own projection so tokenization runs once)."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(window - 1), F.lit(1)))
    win_hash = F.transform(
        idx,
        lambda i: F.xxhash64(F.concat_ws(" ", *[F.element_at(toks, F.least(i + j, n)) for j in range(window)])),
    )
    # empty/whitespace-only document: no windows exist — NULL, not a
    # crash (element_at(toks, least(i, 0)) raises INVALID_INDEX_OF_ZERO)
    return F.when(n > 0, F.array_min(win_hash)).otherwise(F.lit(None).cast("bigint"))


def rolling_fingerprint(text: Column | str, window: int = 8) -> Column:
    """Winnowing-style document fingerprint: min rolling hash over
    token windows — robust to local edits, built from HOFs only.
    Convenience form; hot paths should use the _from_tokens variant."""
    return rolling_fingerprint_from_tokens(tokens(text), window)


# PII scrubbing patterns. Deliberately restricted to syntax with
# identical semantics in Java regex (Spark, JVM-side regexp_replace)
# and RE2 (the DuckDB oracle): character classes, bounded repetition,
# and \b word boundaries — no lookaround, no backrefs, no alternation
# whose leftmost-first order could diverge.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d[\d\- ]{7,}\d"


def redact_pii(text: Column | str) -> Column:
    """Replace emails, IPv4 addresses, and phone-like digit runs with
    typed placeholders. Order matters and is part of the contract:
    email → ip → phone, so the phone pattern can never eat the digits
    of an address already collapsed to a placeholder. Pure JVM-side
    regexp_replace — codegen'd, no Python in the row path; at 100 TB
    this is a narrow map over the corpus scan (zero shuffles).
    """
    text = F.col(text) if isinstance(text, str) else text
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")


def pii_counts(text: Column | str) -> list[Column]:
    """(n_email, n_ip, n_phone) found in the ORIGINAL text — the audit
    columns a redaction job reports alongside the scrubbed corpus."""
    text = F.col(text) if isinstance(text, str) else text
    return [
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), 0)).cast("bigint").alias("n_email"),
        F.size(F.regexp_extract_all(text, F.lit(PII_IPV4), 0)).cast("bigint").alias("n_ip"),
        F.size(
            F.regexp_extract_all(
                F.regexp_replace(F.regexp_replace(text, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"),
                F.lit(PII_PHONE),
                0,
            )
        )
        .cast("bigint")
        .alias("n_phone"),
    ]


# ---------------------------------------------------------------------------
# Intra-document repetition signals (Gopher-style quality rules).
# Public-knowledge filters from Rae et al. 2021 ("Scaling Language
# Models: ... Gopher", appendix A1.1) and the C4 cleanup rules:
# documents dominated by repeated lines / paragraphs / n-grams are
# boilerplate or spam and get filtered before training. Line and
# paragraph fractions are per-row HOF folds over the split text —
# O(L^2) in a document's LINE count (not its length), which is the
# one-off-per-row case where an interpreted HOF is fine; the n-gram
# signal gets a DataFrame-level operator instead because its natural
# scale shape is explode + two bounded-key shuffles.


def _nonempty_segments(text: Column | str, pattern: str) -> Column:
    """Split on ``pattern``, trim each segment, drop empties."""
    text = F.col(text) if isinstance(text, str) else text
    segs = F.transform(F.split(text, pattern), lambda s: F.trim(s))
    return F.filter(segs, lambda s: s != "")


def dup_line_fraction(text: Column | str) -> Column:
    """Fraction of lines that are repeats of an earlier line:
    1 - distinct/total over trimmed non-empty lines (0.0 for <=1 line).
    Gopher filters documents above 0.30."""
    lines = _nonempty_segments(text, r"\n")
    n = F.size(lines)
    return F.when(n > 0, F.round((n - F.size(F.array_distinct(lines))) / n, 6)).otherwise(F.lit(0.0))


def dup_paragraph_fraction(text: Column | str) -> Column:
    """Same rule over blank-line-separated paragraphs (threshold 0.30)."""
    paras = _nonempty_segments(text, r"\n{2,}")
    n = F.size(paras)
    return F.when(n > 0, F.round((n - F.size(F.array_distinct(paras))) / n, 6)).otherwise(F.lit(0.0))


def dup_line_char_fraction(text: Column | str) -> Column:
    """Fraction of CHARACTERS sitting in lines that occur more than
    once (all occurrences counted — Gopher's char-weighted variant,
    threshold 0.20). The inner occurrence count makes this O(L^2) in
    the document's line count; adversarially line-heavy corpora should
    use an explode + groupBy(doc, line) job instead."""
    lines = _nonempty_segments(text, r"\n")
    total = F.aggregate(lines, F.lit(0).cast("long"), lambda acc, s: acc + F.length(s))
    dup_chars = F.aggregate(
        F.array_distinct(lines),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.when(
            F.size(F.filter(lines, lambda y: y == s)) > 1,
            F.size(F.filter(lines, lambda y: y == s)) * F.length(s),
        ).otherwise(F.lit(0)),
    )
    return F.when(total > 0, F.round(dup_chars / total, 6)).otherwise(F.lit(0.0))


def passes_repetition_filters(
    text: Column | str,
    *,
    max_dup_line_frac: float = 0.30,
    max_dup_para_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
) -> Column:
    """Boolean keep/drop for the line-level Gopher repetition rules
    (defaults are the published thresholds)."""
    return (
        (dup_line_fraction(text) <= max_dup_line_frac)
        & (dup_paragraph_fraction(text) <= max_dup_para_frac)
        & (dup_line_char_fraction(text) <= max_dup_line_char_frac)
    )


def top_ngram_stats(df, text_col: str, id_col: str, n: int = 2):
    """Per document: the most frequent token n-gram and the fraction
    of characters it covers (count x gram length / trimmed doc chars
    — Gopher's "fraction of characters in the most common n-gram",
    thresholds 0.20 / 0.18 / 0.16 for n = 2 / 3 / 4).

    Scale shape: explode the n-grams (narrow projection over the
    corpus scan), ONE shuffle on (doc, gram) for the counts, one
    bounded shuffle on doc for the per-doc argmax via max_by — the
    exchange carries (id, gram, count), never the text. Ties break to
    the lexicographically greatest gram (struct max over (count,
    gram) — deterministic across partitionings). Documents with fewer
    than ``n`` tokens are kept with a null gram and 0.0 fraction.
    """
    toks = tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = df.select(
        F.col(id_col), F.length(F.trim(F.col(text_col))).alias("__chars"), grams.alias("__grams")
    )
    counts = (
        base.select(id_col, "__chars", F.explode("__grams").alias("gram"))
        .groupBy(id_col, "__chars", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.groupBy(id_col, "__chars").agg(
        F.max_by(F.struct(F.col("cnt"), F.col("gram")), F.struct(F.col("cnt"), F.col("gram"))).alias("__top")
    )
    scored = top.select(
        id_col,
        F.col("__top.gram").alias("top_gram"),
        F.col("__top.cnt").alias("top_gram_count"),
        F.when(
            F.col("__chars") > 0,
            F.round(F.col("__top.cnt") * F.length("__top.gram") / F.col("__chars"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("top_gram_char_fraction"),
    )
    # keep short documents (no n-grams) with null gram / zero fraction
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            "top_gram",
            "top_gram_count",
            F.coalesce("top_gram_char_fraction", F.lit(0.0)).alias("top_gram_char_fraction"),
        )
    )


def char_entropy_stats(df, text_col: str, id_col: str):
    """Per-document Shannon entropy over characters (bits/char) — the
    cheap compressibility proxy for corpus quality: near-0 entropy is
    padding/repetition spam, unusually high entropy is binary noise or
    minified blobs; natural language sits in a stable band (~3.5-4.5
    bits for English).

    Scale shape: explode characters (narrow projection over the scan),
    one shuffle on (doc, char) for the histogram — at most
    |alphabet| ≈ 100s of rows per document survive the map-side
    combine — then a bounded shuffle on doc for the final fold using
    H = log2(n) - (Σ c·log2 c)/n. Returns (id, n_chars,
    distinct_chars, entropy_bits) with entropy rounded to 6 dp;
    empty documents get 0.0.
    """
    chars = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("ch"))
        .where(F.col("ch") != "")
        .groupBy(id_col, "ch")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    agg = chars.groupBy(id_col).agg(
        F.sum("cnt").alias("n_chars"),
        F.count(F.lit(1)).alias("distinct_chars"),
        F.sum(F.col("cnt") * F.log2("cnt")).alias("__clogc"),
    )
    scored = agg.select(
        id_col,
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("distinct_chars").cast("bigint").alias("distinct_chars"),
        F.round(F.log2("n_chars") - F.col("__clogc") / F.col("n_chars"), 6).alias("entropy_bits"),
    )
    # keep empty documents with zero stats (left join back on ids)
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
            F.coalesce("distinct_chars", F.lit(0)).alias("distinct_chars"),
            F.coalesce("entropy_bits", F.lit(0.0)).alias("entropy_bits"),
        )
    )


def char_trigram_lm_scores(df, text_col: str, id_col: str, *, add_k: float = 0.5):
    """Model-based quality scoring with a SELF-TRAINED character
    trigram language model — the CCNet recipe (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web
    Crawl Data") with an n-gram LM standing in for their KenLM:
    documents whose characters are poorly predicted by the corpus's
    own statistics (gibberish, encoding damage, boilerplate soup)
    score high and get filtered.

    Per document: normalize (lowercase, collapse whitespace — the
    whitespace class is EXPLICIT ``[ \\t\\n\\x0B\\f\\r]`` because
    Java's ``\\s`` includes U+000B while RE2's does not), emit all
    character trigrams, and score the add-k-smoothed conditional
    probability of each third character given its two-char context,
    where c3/c2 are corpus trigram/context counts and V is the
    distinct-third-character vocabulary. Emits
    ``(doc_id, n_trigrams, avg_neg_logp)`` (nats/char; lower =
    better-predicted text).

    Cross-engine determinism contract (the event_interarrival / BM25
    rule — round in INTEGER space, never round(avg(double))): each
    distinct trigram's term ``-ln((c3+k)/(c2+k*V))`` is quantized
    ONCE to integer nanonats, ``floor(x*1e9 + 0.5)``; the per-doc
    score is then an integer half-up mean in micro-nats,
    ``(2*sum + n*1000) div (2*n*1000)``, with ONE shared float
    division by 1e6 at the end. A plain ``round(avg(...), 6)`` is
    float-summed in engine/partitioning-dependent order and can flip
    the 6-dp boundary (first observed in event_interarrival at
    sf0.1); the integer form is order-independent by construction.
    The quantization itself happens driver-side with ``math.log`` —
    glibc's libm, the same ``ln`` DuckDB's oracle calls on this
    platform — and the 1e-9 quantum guards the residual
    last-ulp class regardless.

    Engine shape at 100 TB: the LM "fit" is one groupBy on a BOUNDED
    key space (≤ charset³ trigrams — the model is KBs-to-MBs no
    matter the corpus size) whose result is collected, enriched
    driver-side (context totals, vocabulary, quantized terms —
    model-sized work), and broadcast back as a single ``(tri, q)``
    scoring table; the per-doc mean shuffles only partial
    (sum, count) pairs of INTEGERS — the scoring pass does no
    transcendental math at all. Exactly one corpus pass to fit + one
    to score.
    """
    import math

    from pyspark import StorageLevel

    from ..sources.tables import prune_stopped_sessions, spread

    # CPU-heavy per-row work (len(t) trigram substrings per doc) on a
    # small-but-hot input: round-robin the narrow rows across cores
    # first, or a single-partition cached scan serializes the whole
    # explode (the exact starvation mode spread() exists for)
    norm = spread(
        df.where(f"{text_col} IS NOT NULL")
        .selectExpr(
            f"{id_col} AS doc_id",
            rf"trim(regexp_replace(lower({text_col}), '[ \\t\\n\\x0B\\f\\r]+', ' ')) AS t",
        )
        .where("char_length(t) >= 3"),
        min_bytes=0,
    )
    tris = norm.selectExpr(
        "doc_id",
        "explode(transform(sequence(1, char_length(t) - 2), i -> substring(t, i, 3))) AS tri",
    )
    # fit and score both consume the trigram stream — persist it so
    # the explode runs ONCE per build instead of twice (measured
    # 0.86 s → 0.62 s warm at sf0.1). The PREVIOUS build's cache is
    # unpersisted first, and not only as a leak bound: Spark's
    # CacheManager matches cache entries by logical-plan equality, so
    # without the unpersist a REBUILD (cache_plan=False re-fits per
    # plan() call) would silently serve the old run's cached explode
    # — exactly the cross-run amortization the uncacheable-plan
    # honesty pin exists to prevent. Pinned by test.
    sess = tris.sparkSession
    # weak keys alone cannot bound this dict: the cached DataFrame
    # value strongly references its session key (DataFrame._session),
    # so entries of STOPPED sessions would live forever — prune on
    # access, the same discipline as the registry's plan cache
    prune_stopped_sessions(_TRIS_CACHE)
    prev = _TRIS_CACHE.pop(sess, None)
    if prev is not None:
        try:
            prev.unpersist(blocking=True)
        except Exception:
            pass
    tris = tris.persist(StorageLevel.MEMORY_AND_DISK)
    _TRIS_CACHE[sess] = tris
    # FIT: one corpus pass aggregates trigram counts, then the model
    # comes to the driver — it is bounded by charset^3 (tens of KBs)
    # no matter the corpus size, the same small-by-contract collect as
    # similarity.py's query vectors. Deriving context totals, the
    # vocabulary, and the quantized per-trigram terms from the
    # collected counts costs model-sized driver work and spares the
    # cluster THREE re-aggregations of the corpus explode (the naive
    # all-DataFrame form re-ran it for the context counts, the vocab
    # count, and each broadcast build — measured 2x slower end-to-end
    # at sf0.1) — and removes transcendental math from the scoring
    # pass entirely: the executors sum broadcast-looked-up integers.
    tc_pdf = tris.groupBy("tri").agg(F.count(F.lit(1)).alias("c3")).toPandas()
    tc_pdf["ctx"] = tc_pdf["tri"].str.slice(0, 2)
    tc_pdf["c2"] = tc_pdf.groupby("ctx")["c3"].transform("sum")
    vsz = int(tc_pdf["tri"].str.slice(2, 3).nunique())
    # integer-nanonat quantization of each distinct trigram's term;
    # operation order mirrors the oracle SQL exactly:
    # (CAST(c3 AS DOUBLE)+k) / (CAST(c2 AS DOUBLE)+k*V), -ln, *1e9,
    # +0.5, floor — every step an IEEE double op or libm ln
    denom_k = add_k * float(vsz)
    tc_pdf["q"] = [
        math.floor(-math.log((float(c3) + add_k) / (float(c2) + denom_k)) * 1000000000.0 + 0.5)
        for c3, c2 in zip(tc_pdf["c3"].tolist(), tc_pdf["c2"].tolist())
    ]
    model = F.broadcast(
        tris.sparkSession.createDataFrame(tc_pdf[["tri", "q"]], "tri string, q bigint")
    )
    # SCORE: the second corpus pass hash-joins the broadcast model and
    # reduces per document — the shuffle carries partial (sum, count)
    # INTEGER pairs per doc only; the half-up micro-nat mean stays in
    # integer space to the last shared float division (see docstring).
    # (A fully in-row variant — one-row broadcast map + `aggregate`
    # HOF folding each doc's trigram sequence, zero shuffles — was
    # measured 2.5x SLOWER at sf0.1: HOF lambdas evaluate interpreted,
    # outside whole-stage codegen, so the explode + codegen'd
    # broadcast-hash-join + partial-sum shape wins despite
    # materializing per-trigram rows.)
    return (
        tris.join(model, "tri")
        .groupBy("doc_id")
        .agg(
            F.expr("COUNT(1) AS n_trigrams"),
            F.expr(
                "CAST((2*SUM(q) + COUNT(1)*1000) DIV (2*COUNT(1)*1000) AS DOUBLE) / 1000000.0"
                " AS avg_neg_logp"
            ),
        )
    )


def repetition_profile(df, text_col: str, id_col: str):
    """Gopher repetition rules (Rae et al. 2021, "Scaling Language
    Models: ... Gopher", Table A1) as ONE oracle-checkable per-document
    profile: duplicate-line fraction, duplicate-line CHARACTER
    fraction, duplicate-paragraph fraction, top-2-gram character
    fraction, and the combined keep/drop verdict at the published
    thresholds (0.30 / 0.20 / 0.30 / 0.20).

    Emits ``(doc_id, n_lines, dup_line_frac, dup_line_char_frac,
    dup_para_frac, top_2gram_char_frac, gopher_pass)`` for every doc
    with at least one non-blank line.

    Contracts (each engine-identical by construction):

    * line/paragraph blankness uses the EXPLICIT whitespace class
      (``[ \\t\\n\\x0B\\f\\r]`` — Java ``\\s`` includes U+000B, RE2's
      does not); kept segments compare TRIMMED (``trim`` strips only
      0x20 in both Spark and DuckDB — and a kept segment always has a
      non-whitespace char, so it never trims to empty);
    * tokenization = the dup-span contract (explicit class split,
      empty tokens filtered);
    * every fraction derives from exact integers and is published via
      the integer half-up micro rule ``(2*a*1e6 + b) div (2*b) / 1e6``
      — never ``round(double)``; the verdict compares the integer
      micros against integer thresholds (300000/200000), immune to
      0.3's float unrepresentability;
    * the top 2-gram tie-breaks (count DESC, gram ASC) via
      row_number, deterministic across engines and partitionings.

    Engine shape at 100 TB — every key is doc-scoped, so no corpus
    hot key exists by construction: one explode of non-blank lines →
    groupBy (doc, line) with map-side partial counts → per-doc
    reduction; paragraphs and token stats stay IN-ROW (array ops, no
    explode); one explode of 2-grams → (doc, gram) counts → per-doc
    row_number window whose partitions are single documents. The
    line-stat shuffle carries (doc, line-text) once; unlike the in-row
    ``dup_line_char_fraction`` HOF (O(lines²) per doc) this form is
    linear and safe for adversarially line-heavy documents.

    Known single-node inefficiency, deliberately kept: the line
    explode, the paragraph/token projection, and the 2-gram explode
    each re-read the text column (3 scans of the cached input; the
    whitespace splitting is recomputed per branch). Fusing them via a
    persisted base (the char-LM pattern) would save ~2× the split
    cost per run — worth doing only if this query ever joins a timed
    headline set; at 100 TB the scans share the columnar source and
    the split cost is per-core work that scales out linearly.
    """
    blank = r"'^[ \\t\\n\\x0B\\f\\r]*$'"
    base = df.where(f"{text_col} IS NOT NULL").selectExpr(
        f"{id_col} AS doc_id", f"{text_col} AS __text"
    )
    lines = base.selectExpr(
        "doc_id",
        rf"explode(filter(split(__text, '\\n'), l -> NOT l RLIKE {blank})) AS l",
    ).selectExpr("doc_id", "trim(l) AS line")
    lc = lines.groupBy("doc_id", "line").agg(F.expr("COUNT(1) AS cnt"))
    ls = lc.groupBy("doc_id").agg(
        F.expr("SUM(cnt) AS n_lines"),
        F.expr("COUNT(1) AS n_distinct"),
        F.expr("SUM(cnt * char_length(line)) AS total_lc"),
        F.expr("SUM(IF(cnt = 1, char_length(line), 0)) AS single_lc"),
    )
    pt = base.selectExpr(
        "doc_id",
        rf"filter(split(__text, '\\n{{2,}}'), p -> NOT p RLIKE {blank}) AS __paras",
        rf"filter(split(__text, '[ \\t\\n\\x0B\\f\\r]+'), t -> t != '') AS __toks",
    ).selectExpr(
        "doc_id",
        "size(__paras) AS n_paras",
        "size(array_distinct(transform(__paras, p -> trim(p)))) AS n_distinct_paras",
        "char_length(array_join(__toks, ' ')) AS tok_chars",
        "__toks",
    )
    grams = pt.where("size(__toks) >= 2").selectExpr(
        "doc_id",
        "explode(transform(sequence(1, size(__toks) - 1),"
        " i -> concat(element_at(__toks, i), ' ', element_at(__toks, i + 1)))) AS gram",
    )
    gc = grams.groupBy("doc_id", "gram").agg(F.expr("COUNT(1) AS cnt"))
    gtop = (
        gc.withColumn(
            "rn",
            F.expr("row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC)"),
        )
        .where("rn = 1")
        .selectExpr("doc_id", "cnt * char_length(gram) AS top_chars")
    )
    return (
        ls.join(pt.select("doc_id", "n_paras", "n_distinct_paras", "tok_chars"), "doc_id")
        .join(gtop, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "CAST(n_lines AS BIGINT) AS n_lines",
            "(2*(n_lines - n_distinct)*1000000 + n_lines) DIV (2*n_lines) AS __m_line",
            "(2*(total_lc - single_lc)*1000000 + total_lc) DIV (2*total_lc) AS __m_lchar",
            "(2*(n_paras - n_distinct_paras)*1000000 + n_paras) DIV (2*n_paras) AS __m_para",
            "(2*COALESCE(top_chars, 0)*1000000 + tok_chars) DIV (2*tok_chars) AS __m_gram",
        )
        .selectExpr(
            "doc_id",
            "n_lines",
            "CAST(__m_line AS DOUBLE) / 1000000.0 AS dup_line_frac",
            "CAST(__m_lchar AS DOUBLE) / 1000000.0 AS dup_line_char_frac",
            "CAST(__m_para AS DOUBLE) / 1000000.0 AS dup_para_frac",
            "CAST(__m_gram AS DOUBLE) / 1000000.0 AS top_2gram_char_frac",
            "(__m_line <= 300000 AND __m_lchar <= 200000 AND __m_para <= 300000"
            " AND __m_gram <= 200000) AS gopher_pass",
        )
    )
