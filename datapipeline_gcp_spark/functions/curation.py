"""End-to-end corpus curation: the composed training-data cleaning
pipeline every LLM-scale corpus goes through, as ONE declarative plan —

    exact-dedup (keep lowest id)  →  quality scoring  →  language ID
    →  threshold filters  →  curated corpus + per-doc metrics

Each stage is a building block proven elsewhere in this package
(`dedup.exact`, `text.with_text_metrics`, `text.with_language_id`);
this module demonstrates — and oracle-checks — their composition,
because a real pipeline runs them fused, not as separate jobs: Catalyst
collapses the whole chain into scan → window(fp) → project/filter, so
the corpus is read ONCE and only survivors reach the final projection.

Scale shape: one shuffle on the content fingerprint (the dedup window),
everything else is per-row column arithmetic at scan speed. The quality
and language thresholds are the corpus-policy dials; both the kept rows
AND their scores are in the output so downstream can re-filter without
recomputing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipeline_gcp_spark.functions.dedup import (
    _FIXTURE_SQL,
    neardup_fixture,
    normalized,
)
from datapipeline_gcp_spark.functions.text import (
    LANG_MARKERS,
    _D_MARKERIZE,
    _marker_pattern,
    _rc,
    with_language_id,
    with_text_metrics,
)

MIN_QUALITY = 0.5
MIN_TOKENS = 12


def curate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = MIN_QUALITY,
    min_tokens: int = MIN_TOKENS,
) -> DataFrame:
    """Curated corpus: exact duplicates removed (lowest id kept), then
    quality/length gates. Returns survivors with their metrics."""
    fp = docs.withColumn("fp_exact", F.md5(normalized(F.col(text_col))))
    w = Window.partitionBy("fp_exact").orderBy(id_col)
    kept = (
        fp.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    scored = with_language_id(with_text_metrics(kept, text_col), text_col)
    return scored.filter(
        (F.col("quality_score") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
    ).select(
        id_col,
        "lang",
        "lang_pred",
        "n_tokens",
        "n_chars_calc",
        "quality_score",
        "fp_exact",
    )


def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query over the planted-duplicate fixture, so the dedup
    stage provably removes the planted exact copies."""
    return curate(neardup_fixture(spark, sf_dir))


# The oracle composes the same verified fragments: the fixture, the
# dedup window, the metrics expressions (identical trees to
# text._METRICS_ORACLE), and the language argmax.
_CURATION_ORACLE = f"""
WITH fixture AS ({_FIXTURE_SQL}),
fp AS (
  SELECT *, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp_exact
  FROM fixture
),
kept AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp_exact ORDER BY doc_id) AS rn
    FROM fp
  ) WHERE rn = 1
),
m AS (
  SELECT doc_id, lang, fp_exact,
    CAST(length(text) AS BIGINT) AS n_chars_calc,
    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
    CAST({_rc('text', '[.,;:!?]')} AS BIGINT) AS punct_count,
    CAST({_rc(_D_MARKERIZE.format(t='text'), _marker_pattern('en'))} AS BIGINT) AS stop_hits,
    {", ".join(
        f"CAST({_rc(_D_MARKERIZE.format(t='text'), _marker_pattern(lang))} AS BIGINT) AS score_{lang}"
        for lang in LANG_MARKERS
    )}
  FROM kept
),
scored AS (
  SELECT doc_id, lang, n_tokens, n_chars_calc, fp_exact,
    0.4 * least(n_tokens / 64.0, 1.0)
      + 0.3 * least((stop_hits / n_tokens) * 4.0, 1.0)
      + 0.3 * (1.0 - least((punct_count / n_chars_calc) * 10.0, 1.0))
      AS quality_score,
    CASE
      WHEN greatest(score_en, score_es, score_de, score_fr) = 0 THEN 'und'
      WHEN score_en = greatest(score_en, score_es, score_de, score_fr) THEN 'en'
      WHEN score_es = greatest(score_en, score_es, score_de, score_fr) THEN 'es'
      WHEN score_de = greatest(score_en, score_es, score_de, score_fr) THEN 'de'
      ELSE 'fr'
    END AS lang_pred
  FROM m
)
SELECT doc_id, lang, lang_pred, n_tokens, n_chars_calc, quality_score, fp_exact
FROM scored
WHERE quality_score >= {MIN_QUALITY} AND n_tokens >= {MIN_TOKENS}
"""

QUERIES = {"corpus_curation": corpus_curation}
ORACLES = {"corpus_curation": _CURATION_ORACLE}
