"""Text analysis over document tables: token counting, quality metrics,
language identification, and content fingerprinting.

All hot-path logic is built-in column expressions (regexp/string/array
functions — JVM-side, codegen'd, no Python in the loop), so these run at
parquet-scan speed over 100 TB of documents. Every operator has an exact
DuckDB oracle: the same arithmetic is expressible in both engines, and
all ratios are computed with identical expression trees so doubles are
bitwise-reproducible.

The ``documents`` fixture is synthetic word salad, so the language-ID
heuristic's value lies in its semantics (marker-hit argmax with a
deterministic tie-break), not in recovering the fixture's ``lang``
column — scores and argmax are oracle-checked, which is what verifies
the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_gcp_spark.schemas import load_testdata

#: Marker (stopword) lists per language — deliberately tiny; language ID
#: by stopword hit-rate is the standard cheap heuristic (fastText-style
#: n-gram models would be the production upgrade, via a pandas_udf).
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "es": ("el", "la", "de", "que", "y", "los", "una", "por"),
    "de": ("der", "die", "und", "das", "ein", "nicht", "mit", "ist"),
    "fr": ("le", "la", "et", "les", "des", "une", "est", "pas"),
}

_PUNCT = r"[.,;:!?]"
_DIGIT = "[0-9]"


def _marker_pattern(lang: str) -> str:
    return r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"


def marker_ready(c):
    """lower + collapse every non-``[a-z0-9_]`` run to one space, so
    marker counting happens over pure ASCII — where Java's and RE2's
    ``\\b`` agree. They diverge on non-ASCII letters (Java's word
    boundary can be Unicode-aware, RE2's never is), so counting markers
    directly on unicode text made the engines disagree by ±1 around
    accented/emoji-adjacent words (r9 unicode sweep). Identity on the
    ASCII fixtures. Oracle twin: :data:`_D_MARKERIZE`."""
    from pyspark.sql import functions as F

    return F.regexp_replace(F.lower(c), r"[^a-z0-9_]+", " ")


#: DuckDB twin of :func:`marker_ready` — format with the text expr
_D_MARKERIZE = "regexp_replace(lower({t}), '[^a-z0-9_]+', ' ', 'g')"


# ---------------------------------------------------------------------------
# Builders (Spark side)
# ---------------------------------------------------------------------------


def with_text_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counts + quality signals as appended columns.

    - ``n_tokens``: whitespace tokenization.
    - ``est_bpe_tokens``: the chars/4 rule of thumb for BPE vocabularies
      (integer arithmetic so it mirrors exactly).
    - ``punct_ratio`` / ``digit_ratio`` / ``stopword_ratio``: the
      standard cheap quality signals.
    - ``quality_score``: linear combination in [0,1]-ish used for
      corpus filtering; deterministic double arithmetic.
    """
    # NULL ≡ '' at the text boundary (r8; VERIFY_DEGENERATE.md): a NULL
    # document metric-izes as the empty document (n_chars 0, n_tokens 1)
    # instead of NULL-poisoning every downstream cumsum — the
    # bucket-decomposed budget cumsum is NOT equivalent to the oracle's
    # single window when NULL token counts can make a frame all-NULL.
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t).cast("bigint")
    n_tokens = F.size(F.split(F.trim(t), r"\s+")).cast("bigint")
    punct = F.regexp_count(t, F.lit(_PUNCT)).cast("bigint")
    digits = F.regexp_count(t, F.lit(_DIGIT)).cast("bigint")
    stop = F.regexp_count(marker_ready(t), F.lit(_marker_pattern("en"))).cast("bigint")
    # nullif: an empty document (n_chars = 0) made these divisions
    # THROW under ANSI (Spark 4 default and the driver's vanilla
    # session); NULL is exactly DuckDB's division-by-zero result, so
    # the oracle strings are unchanged. n_tokens cannot be 0 (split of
    # the empty string is ['']) but is guarded for symmetry — a future
    # tokenizer swap must not resurrect the crash.
    punct_ratio = punct / F.nullif(n_chars, F.lit(0))
    digit_ratio = digits / F.nullif(n_chars, F.lit(0))
    stop_ratio = stop / F.nullif(n_tokens, F.lit(0))
    quality = (
        F.lit(0.4) * F.least(n_tokens / F.lit(64.0), F.lit(1.0))
        + F.lit(0.3) * F.least(stop_ratio * 4.0, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 10.0, F.lit(1.0)))
    )
    return df.select(
        "*",
        n_chars.alias("n_chars_calc"),
        n_tokens.alias("n_tokens"),
        F.expr(f"(length(coalesce({text_col}, '')) + 3) div 4")
        .cast("bigint")
        .alias("est_bpe_tokens"),
        punct.alias("punct_count"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality_score"),
    )


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-hit language ID: per-language hit counts + argmax with a
    deterministic first-wins tie-break (the LANG_MARKERS key order)."""
    # NULL ≡ '' (r8 text boundary): a NULL document scores 0 on every
    # language and classifies 'und' in BOTH engines — without the
    # coalesce the oracle's CASE falls through NULL comparisons to the
    # ELSE branch and labels NULL text 'fr'.
    lowered = marker_ready(F.coalesce(F.col(text_col), F.lit("")))
    scores = {
        lang: F.regexp_count(lowered, F.lit(_marker_pattern(lang))).cast("bigint")
        for lang in LANG_MARKERS
    }
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[lang] for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # first language in order wins ties
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    return df.select(
        "*",
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        pred.alias("lang_pred"),
    )


#: GPT-2-style pretokenizer, restricted to RE2-compatible constructs
#: (no lookahead — DuckDB's regex engine is RE2; Java regex accepts the
#: same subset, so ONE pattern serves both engines): contraction
#: suffixes, space-prefixed letter runs, space-prefixed digit runs,
#: space-prefixed punctuation runs, whitespace runs.
BPE_PRETOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9']+|\s+"


def with_bpe_pretokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append BPE-ish pretoken counts: ``n_pretokens`` (pieces matched
    by the GPT-2-style pretokenizer over lowercased text — the unit BPE
    merges operate on, and a much better LLM-token estimate than
    chars/4) plus ``chars_per_pretoken``. All regexp_count — JVM-side,
    scan-speed."""
    t = F.lower(F.col(text_col))
    n_pre = F.regexp_count(t, F.lit(BPE_PRETOKEN_PATTERN)).cast("bigint")
    # try_divide: a zero-pretoken doc (empty text) has no defined ratio —
    # NULL, matching DuckDB's double 0/0 (ANSI `/` would raise instead;
    # r10 blanktext sweep)
    return df.select(
        "*",
        n_pre.alias("n_pretokens"),
        F.try_divide(F.length(t).cast("double"), n_pre.cast("double")).alias(
            "chars_per_pretoken"
        ),
    )


def with_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprints:

    - ``fp_exact``: md5 of whitespace-normalized lowercased text (exact
      dedup key).
    - ``fp_bag``: md5 of the sorted distinct token bag — invariant to
      word order and repetition (near-dup blocking key).
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    tokens = F.array_sort(F.array_distinct(F.split(norm, " ")))
    return df.select(
        "*",
        F.md5(norm).alias("fp_exact"),
        F.md5(F.array_join(tokens, " ")).alias("fp_bag"),
    )


# ---------------------------------------------------------------------------
# Driver-testdata wiring + DuckDB oracles
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, ("documents",))["documents"]


def text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_text_metrics(_docs(spark, sf_dir))


def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_language_id(_docs(spark, sf_dir))


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_fingerprints(_docs(spark, sf_dir))


def text_bpe_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_bpe_pretokens(_docs(spark, sf_dir)).select(
        "doc_id", "n_pretokens", "chars_per_pretoken"
    )


def _rc(expr: str, pattern: str) -> str:
    """DuckDB regexp-count idiom."""
    return f"len(regexp_extract_all({expr}, '{pattern}'))"


_METRICS_ORACLE = f"""
WITH b AS (
  SELECT *,
    CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars_calc,
    CAST(len(regexp_split_to_array(trim(coalesce(text, '')), '\\s+'))
         AS BIGINT) AS n_tokens,
    CAST({_rc("coalesce(text, '')", _PUNCT)} AS BIGINT) AS punct_count,
    CAST({_rc("coalesce(text, '')", _DIGIT)} AS BIGINT) AS digit_count,
    CAST({_rc(_D_MARKERIZE.format(t="coalesce(text, '')"), _marker_pattern('en'))} AS BIGINT) AS stop_hits
  FROM documents
)
SELECT
  doc_id, text, lang, source, n_chars,
  n_chars_calc, n_tokens,
  CAST((length(coalesce(text, '')) + 3) // 4 AS BIGINT) AS est_bpe_tokens,
  punct_count,
  punct_count / n_chars_calc AS punct_ratio,
  digit_count / n_chars_calc AS digit_ratio,
  stop_hits / n_tokens AS stopword_ratio,
  0.4 * least(n_tokens / 64.0, 1.0)
    + 0.3 * least((stop_hits / n_tokens) * 4.0, 1.0)
    + 0.3 * (1.0 - least((punct_count / n_chars_calc) * 10.0, 1.0))
    AS quality_score
FROM b
"""

_LANGID_ORACLE = f"""
WITH s AS (
  SELECT *,
    {", ".join(
        "CAST(%s AS BIGINT) AS score_%s"
        % (_rc(_D_MARKERIZE.format(t="coalesce(text, '')"), _marker_pattern(lang)), lang)
        for lang in LANG_MARKERS
    )}
  FROM documents
)
SELECT *,
  CASE
    WHEN greatest(score_en, score_es, score_de, score_fr) = 0 THEN 'und'
    WHEN score_en = greatest(score_en, score_es, score_de, score_fr) THEN 'en'
    WHEN score_es = greatest(score_en, score_es, score_de, score_fr) THEN 'es'
    WHEN score_de = greatest(score_en, score_es, score_de, score_fr) THEN 'de'
    ELSE 'fr'
  END AS lang_pred
FROM s
"""

_FINGERPRINT_ORACLE = """
WITH n AS (
  SELECT *, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id, text, lang, source, n_chars,
  md5(norm) AS fp_exact,
  md5(array_to_string(list_sort(list_distinct(string_split(norm, ' '))), ' '))
    AS fp_bag
FROM n
"""

def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation: confusion matrix of predicted vs labeled
    language plus per-cell recall within the labeled class — the
    accept/retrain gauge for the cheap classifier tier (the number you
    check before trusting `lang_pred` to drive per-language filters
    like `corpus_length_filter`). One extra aggregation over
    :func:`with_language_id`'s projection — the scan does all the
    regex work, the matrix is (|langs|+1)² cells."""
    pred = with_language_id(_docs(spark, sf_dir))
    cells = pred.groupBy("lang", "lang_pred").agg(
        F.count("*").alias("n_docs")
    )
    totals = cells.groupBy("lang").agg(F.sum("n_docs").alias("n_lang"))
    return cells.join(totals, "lang").select(
        "lang",
        "lang_pred",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("n_lang").cast("double")).alias(
            "frac_of_lang"
        ),
    )


_CONFUSION_ORACLE = f"""
WITH pred AS ({_LANGID_ORACLE}),
cells AS (
  SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM pred GROUP BY lang, lang_pred
),
totals AS (
  SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS n_lang FROM cells GROUP BY lang
)
SELECT c.lang, c.lang_pred, c.n_docs,
       CAST(c.n_docs AS DOUBLE) / CAST(t.n_lang AS DOUBLE) AS frac_of_lang
FROM cells c JOIN totals t USING (lang)
"""


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability signals for quality filtering: per document, word
    count, vowel-group syllable proxy, syllables-per-word, and the
    fraction of long (≥7-letter) words — the cheap complexity features
    readability formulas (Flesch/Dale–Chall) build on and corpus
    filters threshold directly (very low syllable density ⇒ word-salad
    or code; very high long-word fraction ⇒ boilerplate/legalese).
    Pure regexp_count column math, RE2-safe shared patterns, one scan.
    """
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    lower = F.lower(F.col("text"))
    n_words = F.regexp_count(lower, F.lit(r"[a-z]+")).cast("bigint")
    n_syll = F.regexp_count(lower, F.lit(r"[aeiouy]+")).cast("bigint")
    n_long = F.regexp_count(lower, F.lit(r"\b[a-z]{7,}\b")).cast("bigint")
    # nullif: a document with NO [a-z] runs (digits-only, punctuation,
    # non-Latin scripts) has n_words = 0, and a plain double division
    # THROWS under ANSI (Spark 4 default and the driver's vanilla
    # session) — DuckDB's double/0 is NULL, so the guard IS the
    # oracle's semantics (same class as the cosine/weighted-sample
    # guards; the fixtures never reach it, degenerate-input test does)
    nw = F.nullif(n_words, F.lit(0)).cast("double")
    return docs.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        n_syll.alias("n_syllables"),
        (n_syll.cast("double") / nw).alias("syllables_per_word"),
        (n_long.cast("double") / nw).alias("long_word_frac"),
    )


_READABILITY_ORACLE = r"""
SELECT doc_id, lang,
  CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n_words,
  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
    AS n_syllables,
  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)
    / len(regexp_extract_all(lower(text), '[a-z]+')) AS syllables_per_word,
  CAST(len(regexp_extract_all(lower(text), '\b[a-z]{7,}\b')) AS DOUBLE)
    / len(regexp_extract_all(lower(text), '[a-z]+')) AS long_word_frac
FROM documents
"""


# The pattern is shared verbatim: it is deliberately RE2-compatible, and
# single-quotes are doubled for the SQL literal.
_BPE_ORACLE = f"""
WITH p AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(lower(text),
      '{BPE_PRETOKEN_PATTERN.replace("'", "''")}')) AS BIGINT) AS n_pretokens,
    CAST(length(lower(text)) AS DOUBLE) AS n_chars_d
  FROM documents
)
SELECT doc_id, n_pretokens,
       n_chars_d / CAST(n_pretokens AS DOUBLE) AS chars_per_pretoken
FROM p
"""

QUERIES = {
    "text_metrics": text_metrics,
    "text_language_id": text_language_id,
    "lang_confusion_matrix": lang_confusion_matrix,
    "text_readability": text_readability,
    "doc_fingerprint": doc_fingerprint,
    "text_bpe_pretokenize": text_bpe_pretokenize,
}

ORACLES = {
    "text_metrics": _METRICS_ORACLE,
    "text_language_id": _LANGID_ORACLE,
    "lang_confusion_matrix": _CONFUSION_ORACLE,
    "text_readability": _READABILITY_ORACLE,
    "doc_fingerprint": _FINGERPRINT_ORACLE,
    "text_bpe_pretokenize": _BPE_ORACLE,
}
