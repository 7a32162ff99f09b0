"""Text-analysis operators for training-data pipelines.

All pure built-in column expressions (JVM-side, codegen'd): language
ID via marker-token scoring, quality scoring via length/stopword/
punctuation ratios, token counting, and md5 document fingerprinting.
These are first-class engine citizens (not ports of anything in the
reference) — the operations a 100 TB text-corpus pipeline needs in
front of dedup/routing.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deterministic marker vocabularies for the n-gram/stopword language
# heuristic; real corpora would use char-trigram profiles, same plumbing
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "a"),
    "fr": ("le", "la", "et", "de", "un"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "los", "y", "que", "una"),
    "zh": ("的", "是", "了", "在", "我"),
}
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def tokens(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


# Java regex \s — what tokens() splits on — is ASCII whitespace ONLY.
# The driver-side mirror below must use this class, never str.split()
# (which also splits on Unicode whitespace like U+00A0, tokenizing a
# pasted document fragment differently from how it was indexed).
_PY_WS_RX = _re.compile("[ \t\n\x0b\f\r]+")


def py_tokens(s: str) -> list[str]:
    """Driver-side mirror of :func:`tokens` for small strings (search
    queries, phrases): identical lowercase + ASCII-whitespace split.
    The ONE place query-side tokenization lives — change :func:`tokens`
    and this together (``tests/test_search_timeseries.py`` pins their
    agreement on tricky inputs)."""
    return [t for t in _PY_WS_RX.split(str(s).lower()) if t]


def token_count(col: str | Column = "text") -> Column:
    return F.size(tokens(col))


def stopword_ratio(col: str | Column = "text") -> Column:
    toks = tokens(col)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def quality_score(col: str | Column = "text") -> Column:
    """Deterministic [0,1] quality heuristic: rewards mid-length docs
    and a healthy stopword ratio, penalizes punctuation soup."""
    c = F.col(col) if isinstance(col, str) else col
    len_score = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(c) * 4, F.lit(1.0))
    punct_pen = F.greatest(F.lit(1.0) - punct_ratio(c) * 5, F.lit(0.0))
    return F.round((len_score * 0.4 + stop_score * 0.3 + punct_pen * 0.3), 4)


def lang_guess(col: str | Column = "text") -> Column:
    """argmax over marker-token hit counts; deterministic tie-break by
    language code order. Expression-only (no UDF)."""
    toks = tokens(col)
    scored = None
    for lang in sorted(LANG_MARKERS):
        markers = LANG_MARKERS[lang]
        score = F.size(F.filter(toks, lambda t: t.isin(*markers)))
        entry = F.struct(score.alias("score"), F.lit(lang).alias("lang"))
        scored = entry if scored is None else F.when(entry["score"] > scored["score"], entry).otherwise(scored)
    # strict > while iterating ascending ⇒ alphabetically-first wins ties
    return scored["lang"]


def fingerprint(col: str | Column = "text") -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    (A rolling/locality-sensitive variant lives in dedup.simhash.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


ROLLING_MOD = 1_000_000_007


def rolling_fingerprint(toks: Column) -> Column:
    """Position-weighted polynomial fingerprint over a token array
    (the rolling-hash document fingerprint): Σᵢ h(tokᵢ)·i mod p, with
    h = first 8 hex chars of md5 — portable across engines (md5 and
    64-bit integer arithmetic behave identically in Spark and DuckDB,
    unlike xxhash64 which DuckDB lacks). Expression-only; order-
    sensitive, so reordered tokens change the fingerprint while the
    bag-of-words md5 :func:`fingerprint` would not."""
    tok_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")  # noqa: E731
    weighted = F.zip_with(
        toks,
        F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1))),
        lambda t, i: tok_hash(t) * i.cast("long"),
    )
    acc = F.aggregate(weighted, F.lit(0).cast("long"), lambda a, v: a + v)
    return F.when(F.size(toks) > 0, acc % ROLLING_MOD).otherwise(F.lit(0).cast("long"))


def with_text_features(df: DataFrame, col: str = "text") -> DataFrame:
    return (
        df.withColumn("n_tokens", token_count(col))
        .withColumn("quality", quality_score(col))
        .withColumn("lang_guess", lang_guess(col))
        .withColumn("fingerprint", fingerprint(col))
    )


def ngrams_of_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-gram array from a TOKEN-ARRAY column (duplicates
    preserved, document order). Pass a *materialized* token column on
    hot paths — CSE cannot reach inside higher-order-function lambdas,
    so inlining the tokenizer re-splits once per ``element_at``
    reference (the 19×-slower shape ``dedup.word_shingles`` documents).
    Guarded for short docs: ``sequence(1, 0)`` DESCENDS in Spark
    ([1, 0]), which would feed ``element_at`` index 0 and error."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])
    )
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def ngram_array(col: str | Column = "text", n: int = 3) -> Column:
    """One-shot convenience: tokenize + n-gram in a single expression.
    Fine for ad-hoc use; hot paths should materialize ``tokens()`` into
    a column first and call :func:`ngrams_of_tokens` (see there)."""
    return ngrams_of_tokens(tokens(col), n)


def repetition_of_grams(grams: Column) -> Column:
    """``(total − distinct) / total`` over an n-gram-array column; 0
    for empty. Reference a materialized grams column on hot paths."""
    total = F.size(grams)
    dup = total - F.size(F.array_distinct(grams))
    return F.when(total > 0, F.round(dup / total, 4)).otherwise(F.lit(0.0))


def repetition_ratio(col: str | Column = "text", n: int = 3) -> Column:
    """Intra-document repetition: the fraction of n-grams that are
    repeats of an earlier n-gram in the same document. The Gopher/C4
    quality signal that catches boilerplate loops and degenerate
    generations. One-shot expression — hot paths stage
    ``tokens`` → ``ngrams_of_tokens`` → ``repetition_of_grams``
    through materialized columns instead."""
    return repetition_of_grams(ngram_array(col, n))


# engine-portable redaction patterns (explicit classes — identical
# semantics under Java regex and RE2/DuckDB)
EMAIL_RX = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
LONG_NUMBER_RX = "[0-9][0-9][0-9][0-9][0-9][0-9]+"  # 6+ digit runs


def redact(col: str | Column = "text") -> Column:
    """PII-style scrubbing pass: emails → ``<EMAIL>``, 6+-digit number
    runs → ``<NUM>`` (ids, phones, cards). The standard pre-training
    hygiene step; extend the pattern list per policy."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, EMAIL_RX, "<EMAIL>")
    return F.regexp_replace(out, LONG_NUMBER_RX, "<NUM>")


def redaction_count(col: str | Column = "text") -> Column:
    """How many spans :func:`redact` would replace (audit metric)."""
    c = F.col(col) if isinstance(col, str) else col
    n_email = F.size(F.regexp_extract_all(c, F.lit(EMAIL_RX), 0))
    no_email = F.regexp_replace(c, EMAIL_RX, "<EMAIL>")
    n_num = F.size(F.regexp_extract_all(no_email, F.lit(LONG_NUMBER_RX), 0))
    return n_email + n_num


def subword_token_count(col: str | Column = "text") -> Column:
    """BPE-style pre-tokenization count: word runs + individual
    punctuation marks (the GPT-2-ish ``\\w+|[^\\w\\s]`` split) —
    the cheap token estimator a training pipeline budgets with."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"\w+|[^\w\s]"), 0))


def tfidf_topk(
    df: DataFrame, doc_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Per-document top-k TF-IDF keywords over the whole corpus.

    Plan — three shuffles, every key uniform or zipf-bounded:

      1. explode tokens → ``groupBy(doc, token)`` term frequencies
         (key cardinality = corpus distinct doc-token pairs, uniform);
      2. ``groupBy(token)`` document frequencies over the already-
         deduplicated doc-token set (shuffle ∝ vocabulary, not corpus);
      3. tf ⋈ df on token, then a per-document ``row_number`` window —
         partition size is one document's distinct-token count, never
         corpus-sized, so the rank stage survives any corpus scale.

    N (corpus size) is a one-scalar aggregate crossJoin-broadcast, not
    a driver collect. ``idf = ln((N+1)/(df+1))`` (add-one smoothed);
    the score is rounded to 4 dp BEFORE ranking so rank order (score
    desc, token asc) is bit-reproducible across engines.
    """
    from pyspark.sql import Window

    toks = df.select(doc_col, F.explode(tokens(text_col)).alias("token"))
    tf = toks.groupBy(doc_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 4
            ),
        )
    )
    w = Window.partitionBy(doc_col).orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(doc_col, "token", "tfidf", "rnk")
    )


def remove_common_units(
    df: DataFrame,
    delimiter: str = "\n",
    min_docs: int | None = None,
    min_doc_pct: int | None = None,
    min_chars: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-frequency unit removal — CCNet/RefinedWeb-style
    boilerplate stripping generalized over the split unit. With
    ``delimiter='\\n'`` a *line* that occurs (length ≥ ``min_chars``)
    in at least ``min_docs`` distinct documents — or in at least
    ``min_doc_pct`` percent of the corpus — is boilerplate (nav bars,
    disclaimers, repeated headers) and is deleted from every document;
    with ``delimiter=' '`` the same machinery is document-frequency
    stopword pruning. Returns one row per input document:
    ``(id_col, clean_text, n_removed)`` with unit order preserved.

    Plan — scale shape at 100 TB:

      1. ``posexplode(split(...))`` is narrow (no shuffle);
      2. the document-frequency count is ONE shuffle keyed by the unit
         string with map-side partial aggregation; the frequency filter
         happens before anything joins back, so the "common" set is
         tiny (true boilerplate) — AQE turns the anti-join into a
         broadcast when it fits, and a shuffled anti-join otherwise;
      3. reassembly is ONE shuffle keyed by ``id_col`` (uniform);
         per-document ordering uses ``array_sort`` on (pos, unit)
         structs INSIDE the aggregate — no global sort. No driver
         collect anywhere.

    The percent threshold is evaluated in pure integer arithmetic
    (``df*100 >= n_docs*pct``) so both engines agree bit-for-bit; the
    corpus size is a one-scalar aggregate crossJoin-broadcast.
    """
    if (min_docs is None) == (min_doc_pct is None):
        raise ValueError("pass exactly one of min_docs / min_doc_pct")
    import re as _re

    rx = _re.escape(delimiter)
    units = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), rx)).alias("pos", "unit"),
    )
    dfreq = (
        units.filter(F.length("unit") >= min_chars)
        .groupBy("unit")
        .agg(F.countDistinct("_id").alias("_df"))
    )
    if min_docs is not None:
        common = dfreq.filter(F.col("_df") >= min_docs)
    else:
        n = df.agg(F.count(F.lit(1)).alias("_n_docs"))
        common = dfreq.crossJoin(F.broadcast(n)).filter(
            F.col("_df") * 100 >= F.col("_n_docs") * min_doc_pct
        )
    kept = units.join(common.select("unit"), "unit", "left_anti")
    agg = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "unit"))),
                lambda s: s["unit"],
            ),
            delimiter,
        ).alias("_clean"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    t = F.col(text_col)
    return (
        df.join(agg, F.col(id_col) == F.col("_id"), "left")
        .select(
            id_col,
            F.when(t.isNull(), F.lit(None).cast("string"))
            .otherwise(F.coalesce("_clean", F.lit("")))
            .alias("clean_text"),
            F.when(t.isNull(), F.lit(0))
            .otherwise(F.size(F.split(t, rx)) - F.coalesce("_n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def hashed_linear_score(toks: Column, buckets: int = 1024) -> Column:
    """Linear quality-classifier scoring under the hashing trick (the
    fasttext-style bag-of-words filter every large corpus pipeline
    runs): feature index = md5-bucket of the token, weight = the
    bucket's (deterministically "trained") integer weight in
    [-100, 100], document score = Σ weights. Pure JVM expressions (a
    higher-order ``aggregate`` lambda — interpreted, not codegen'd,
    but zero Python and NO weight-table join or shuffle at all);
    with externally trained weights the same
    shape becomes a broadcast map over the bucket id. Integer weights
    keep the score exact (a float Σ would be summation-order-
    dependent across engines and partitionings).

    The bucket→weight map multiplies by a Knuth-style odd constant
    before the mod-201 fold so the weight range stays two-sided for
    ANY bucket count (a plain ``bucket % 201`` is all-negative for
    buckets ≤ 100 — a filter that silently rejects the whole corpus).
    """
    from .sampling import hash_bucket

    if buckets < 2:
        raise ValueError(f"need buckets >= 2, got {buckets}")
    w = lambda t: (hash_bucket(t, buckets) * 2654435761) % 201 - 100  # noqa: E731
    return F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + w(t))
