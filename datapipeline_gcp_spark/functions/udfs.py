"""The Python extension surface (SURVEY.md §2.8): the reference has no
UDFs; this module documents and tests the engine's three sanctioned
Python extension points with operators that built-in functions
genuinely cannot express:

- scalar ``pandas_udf`` — Unicode NFKC normalization (Spark has no
  normalization builtin; Arrow-vectorized, one Python call per batch).
- grouped-map ``applyInPandas`` — per-group robust z-score
  (median/MAD), awkward as SQL, natural as a per-group pandas frame.
- ``mapInPandas`` — see ``functions.multimodal`` (feature extraction).
- ``applyInPandasWithState`` — see ``streaming.stateful`` (dedup).

Row-at-a-time Python UDFs are deliberately absent: per-row serde in the
hot path is the one pattern that cannot survive 100 TB. All workers are
self-contained closures (no executor package install).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_gcp_spark.determinism import (
    SQL_EVENTS_NANSAFE,
    nan_to_null,
    qround,
    sql_qround,
)
from datapipeline_gcp_spark.schemas import load_testdata


def with_nfkc_normalized(
    df: DataFrame, text_col: str = "text", out_col: str = "text_nfkc"
) -> DataFrame:
    """Append ``out_col``: NFKC-normalized, whitespace-collapsed text.

    NFKC folds compatibility forms (full-width chars, ligatures,
    non-breaking spaces) — a standard corpus-cleaning pass before
    tokenization/dedup, with no Spark builtin equivalent.
    """

    @F.pandas_udf("string")
    def nfkc(s: pd.Series) -> pd.Series:
        # Vectorized pandas .str pipeline (guide §4.2: hand whole batches
        # to native-loop string kernels, never a Python lambda per row):
        # .str.normalize is unicodedata.normalize applied in pandas' C
        # map loop; replace/strip use the same `re` \s semantics (Unicode
        # whitespace) and argument-free strip as the previous per-row
        # body. None propagates as missing through every .str op and
        # crosses Arrow back as NULL.
        return s.str.normalize("NFKC").str.replace(
            r"\s+", " ", regex=True
        ).str.strip()

    return df.withColumn(out_col, nfkc(F.col(text_col)))


def robust_zscore_per_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "robust_z",
) -> DataFrame:
    """Per-group robust z-score: (x - median) / (1.4826 · MAD), with a
    zero-MAD fallback to 0.0. Grouped-map pandas: each group arrives as
    one frame; output schema = input + ``out_col``.

    Scale note: one shuffle on the group key, and a group must fit in a
    worker's memory — the same contract as any grouped-map; for
    million-row groups switch to a two-pass windowed approximation
    (percentile_approx) instead.
    """
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} double"

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype(float)
        # a NULL measure arrives as NaN in the float64 block (Arrow
        # has no NaN/NULL distinction after .astype(float)); pandas
        # median() skips NaN, matching the NULL-skipping oracle, and
        # the masked rows leave as genuine NULLs via the nullable
        # Float64 dtype (r8 nanvalues boundary)
        mask = v.isna()
        med = v.median()
        mad = (v - med).abs().median()
        scale = 1.4826 * mad
        scores = pd.Series(0.0, index=pdf.index) if scale == 0 else ((v - med) / scale)
        # Vectorized NULL masking (guide §4.2): build the nullable
        # Float64 block straight from the score buffer + NULL bitmap —
        # same values the previous per-row list comprehension produced,
        # minus the Python loop over every row of the group (the loop is
        # the part that cannot survive million-row groups; the
        # FloatingArray constructor is also the lowest-overhead option
        # for the many-tiny-groups regime, measured vs where()+astype).
        pdf[out_col] = pd.arrays.FloatingArray(
            np.ascontiguousarray(scores.to_numpy(dtype="float64")),
            mask.to_numpy(),
        )
        return pdf

    return df.groupBy(*group_cols).applyInPandas(per_group, schema=out_schema)


def robust_zscore_builtin(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "robust_z",
) -> DataFrame:
    """The two-pass BUILT-IN twin of :func:`robust_zscore_per_group` —
    same statistic, zero Python: pass 1 aggregates the exact per-group
    median (``percentile(0.5)``), pass 2 aggregates the MAD over
    ``abs(x − median)``, then one keyed join computes the score.

    This is the huge-group fallback the grouped-map docstring promises:
    no group ever materializes in one worker's memory — both passes are
    partial+final hash aggregates, every shuffle keys on the group
    columns (one partitioning reused across both passes and the final
    join), and the whole plan stays in codegen. The pandas variant
    remains registered as the sanctioned extension-point demo; this one
    is what production should call (measured 3.7 s → 1.05 s at sf0.1,
    and the gap widens with group size — the pandas path additionally
    breaks outright when one group outgrows a worker)."""
    def _nullsafe_join(left: DataFrame, right: DataFrame) -> DataFrame:
        # eqNullSafe (<=>): the stats come from a groupBy, where a NULL
        # group key IS a group — an equi-join would drop its rows from
        # the scored output (r8 nullkeys sweep; the grouped-map twin
        # keeps them, and the two variants share one oracle). <=> keys
        # still hash-join, so the plan shape is unchanged.
        r = right
        cond = None
        for c in group_cols:
            r = r.withColumnRenamed(c, f"__{c}")
            this = left[c].eqNullSafe(F.col(f"__{c}"))
            cond = this if cond is None else (cond & this)
        return left.join(r, cond).drop(*[f"__{c}" for c in group_cols])

    med = df.groupBy(*group_cols).agg(
        F.percentile(value_col, F.lit(0.5)).alias("_med")
    )
    mad = (
        _nullsafe_join(df, med)
        .groupBy(*group_cols)
        .agg(
            F.percentile(
                F.abs(F.col(value_col) - F.col("_med")), F.lit(0.5)
            ).alias("_mad"),
            F.first("_med").alias("_med"),
        )
    )
    scale = F.lit(1.4826) * F.col("_mad")
    # NULL measure → NULL score in EVERY branch: without the leading
    # isNull arm, a NULL row in a zero-MAD group would score 0.0 here
    # while the grouped-map twin masks it to NULL (ADVICE r8) — the
    # divide branch already propagates NULL on its own.
    return _nullsafe_join(df, mad).withColumn(
        out_col,
        F.when(F.col(value_col).isNull(), F.lit(None).cast("double"))
        .when(scale == 0, F.lit(0.0))
        .otherwise((F.col(value_col) - F.col("_med")) / scale),
    ).drop("_med", "_mad")


# ---------------------------------------------------------------------------
# Registered queries — both now oracle-checked:
#
# - robust z-score is fully SQL-expressible with DuckDB's median()/mad().
#   The engines' medians can differ by 1 ulp on even-count groups
#   (numpy averages the two middles as (a+b)/2; quantile interpolation
#   computes a + 0.5*(b-a)) and that ulp is amplified by the (x-median)
#   cancellation, so both sides round to 6 dp — far above the ulp noise,
#   far below anything a user of a z-score cares about.
# - NFKC has no DuckDB twin (SQL cannot express Unicode normalization),
#   so the gate's comparison is RESTRICTED TO ROWS WHERE THE TWIN IS
#   FAITHFUL: all-ASCII text, where NFKC is the identity and the oracle
#   reduces to whitespace-collapse + trim. The restriction is part of
#   the query contract on BOTH sides — the engine declares the filter
#   after the UDF but Catalyst correctly pushes it below (it touches
#   only `text`), so the gate compares exactly the faithful rows. The
#   ASCII predicate is the byte==codepoint-count test
#   `octet_length(text) = length(text)` (identical semantics in Spark
#   and DuckDB; NULL text drops on both sides). The NFKC folding itself
#   (full-width forms, ligatures, NBSP) is pinned by unit tests against
#   unicodedata — the gate checks the UDF plumbing, not Unicode in SQL.
#   (VERDICT r9 #7: this replaces an ASCII-identity oracle that was
#   silently wrong on non-ASCII corpora — the unicode degenerate sweep
#   now passes with the limitation encoded, not explained in prose.)
# ---------------------------------------------------------------------------

def _ascii_only() -> Column:
    """TRUE iff text is pure ASCII: UTF-8 byte count == codepoint count.

    Built lazily — Spark 4 Column construction needs an active session,
    so a module-level Column would crash any import (pytest collection,
    tooling) that happens before ``SparkSession`` exists.
    """
    return F.octet_length("text") == F.length("text")


def udf_nfkc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    return (
        with_nfkc_normalized(docs)
        .filter(_ascii_only())
        .select("doc_id", "text_nfkc")
    )


def udf_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_testdata(spark, sf_dir, ("events",))["events"]
    out = robust_zscore_per_group(
        ev.select("user_id", "event_id", nan_to_null("value").alias("value")),
        ["user_id"],
        "value",
    )
    return out.select(
        "user_id", "event_id", "value", qround("robust_z", 6).alias("robust_z")
    )


_NFKC_ORACLE = r"""
SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS text_nfkc
FROM documents
WHERE strlen(text) = length(text)
"""

_ZSCORE_ORACLE = f"""
WITH stats AS (
  SELECT user_id, median(value) AS med_v, mad(value) AS mad_v
  FROM {SQL_EVENTS_NANSAFE} GROUP BY user_id
)
SELECT e.user_id, e.event_id, e.value,
  (floor((CASE WHEN e.value IS NULL THEN NULL
             WHEN 1.4826 * s.mad_v = 0 THEN 0.0
             ELSE (e.value - s.med_v) / (1.4826 * s.mad_v) END) * 1e6 + 0.5)
   / 1e6) AS robust_z
FROM {SQL_EVENTS_NANSAFE} e
JOIN stats s ON e.user_id IS NOT DISTINCT FROM s.user_id
"""
# ^ the leading value-IS-NULL arm mirrors both engine variants' rule
#   "NULL measure → NULL score" in the zero-MAD branch too (ADVICE r8:
#   without it the THEN 0.0 would score missing measures in constant
#   groups)
# ^ IS NOT DISTINCT FROM: the statistic is GROUPED — a NULL user_id is
#   a group (both engine variants score those rows), and a USING join
#   would silently drop its rows from the output (r8 nullkeys sweep)

def robust_zscore_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same statistic as ``udf_robust_zscore``, built-ins only — shares
    that query's oracle SQL verbatim (the strongest possible equivalence
    statement: one oracle, two execution strategies, identical hashes)."""
    ev = load_testdata(spark, sf_dir, ("events",))["events"]
    out = robust_zscore_builtin(
        ev.select("user_id", "event_id", nan_to_null("value").alias("value")),
        ["user_id"],
        "value",
    )
    return out.select(
        "user_id", "event_id", "value", qround("robust_z", 6).alias("robust_z")
    )


QUERIES = {
    "udf_nfkc_normalize": udf_nfkc_normalize,
    "udf_robust_zscore": udf_robust_zscore,
    "robust_zscore_twopass": robust_zscore_twopass,
}
ORACLES: dict[str, str] = {
    "udf_nfkc_normalize": _NFKC_ORACLE,
    "udf_robust_zscore": _ZSCORE_ORACLE,
    "robust_zscore_twopass": _ZSCORE_ORACLE,
}
