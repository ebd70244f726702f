"""Distributed BPE merge training — the vocabulary-learning step of an
LLM tokenizer pipeline, run as an iterative Spark job.

Standard byte-pair-encoding training: start from the word-frequency
table with words split into characters, then repeatedly (a) count
adjacent symbol pairs weighted by word frequency, (b) take the most
frequent pair (deterministic tie-break: freq DESC, then pair
lexicographically), (c) merge that pair everywhere. The learned merge
list IS the tokenizer artifact (`functions/text.py` BPE pretokenizer
consumes such vocabularies downstream).

Spark-first shape: the loop state is the distinct-WORD table (word
spelled as space-separated symbols + its corpus frequency) — corpus
size drops out after the first aggregation, so at 100 TB each round
touches only the vocabulary (millions of rows, not the corpus). Per
round: one explode+hash-aggregate over the vocab for pair counts, one
`TakeOrderedAndProject`-backed argmax whose single row is collected
(metadata-scale driver traffic, same policy as the PageRank convergence
scalar), one literal `replace` projection. The state is
`localCheckpoint`ed every round so round N's job does not re-execute
rounds 1..N-1.

Merge application uses 3 passes of leftmost-non-overlapping literal
``replace`` on the symbol string (``' a b '`` → ``' ab '``). Both
engines implement `replace` with identical scan semantics, so the
transform is bitwise cross-engine reproducible; for runs of a
self-overlapping pair (``a a a a``) the grouping can differ from the
strict left-greedy formulation while the merged multiset is identical —
a documented, deterministic variant.

Oracle: the SAME algorithm unrolled as chained SQL CTEs (generated from
the same Python loop — one source of truth for round count and
tie-break), run by DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_gcp_spark.schemas import load_testdata

#: merge rounds learned by the registered query (tiny fixture vocab —
#: production would run thousands of rounds with the same loop)
N_MERGES = 8
#: replace passes per merge — ≥2 reaches the fixpoint for boundary-
#: sharing occurrences; 3 for margin. MUST match the oracle.
_PASSES = 3


def _word_symbols(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(s, freq): each distinct word as ' c h a r s ' with its corpus
    frequency — the only corpus-scale aggregation in the algorithm."""
    w = F.col("w")
    return (
        docs.select(F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"))
        .filter(w != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .select(
            F.concat(
                F.lit(" "), F.array_join(F.split(w, ""), " "), F.lit(" ")
            ).alias("s"),
            "freq",
        )
    )


def bpe_train(docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """Learn up to ``n_merges`` BPE merges; returns the merge table
    (round, a, b, merged, pair_freq) — ``n_merges`` rows, or fewer if
    the corpus runs out of adjacent pairs first (every word contracted
    to a single symbol, or an empty corpus): real tokenizer trainers
    stop at exhaustion, and the pre-fix ``collect()[0]`` raised a bare
    IndexError there instead — found by the empty-input robustness
    probe (tests/test_properties.py)."""
    spark = docs.sparkSession
    words = _word_symbols(docs).localCheckpoint()
    merges: list[tuple] = []
    for r in range(1, n_merges + 1):
        # materialize the symbol split in its own projection (r14): the
        # inline form re-evaluated split(trim(s)) once per element via
        # the lambda's element_at — O(len²) splitting per word per round
        # (the dedup.shingles / quality.py trap)
        t = F.col("_t")
        pairs = words.withColumn(
            "_t", F.split(F.trim(F.col("s")), " ")
        ).select(
            "freq",
            F.explode(
                F.transform(
                    F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
                    lambda x, i: F.struct(
                        x.alias("a"), F.element_at(t, i + 2).alias("b")
                    ),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("pf"))
            .orderBy(F.desc("pf"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:  # pair space exhausted — stop early, keep merges
            break
        best = top[0]
        merges.append((r, best.a, best.b, best.a + best.b, int(best.pf)))
        s = F.col("s")
        pat = F.lit(f" {best.a} {best.b} ")
        rep = F.lit(f" {best.a}{best.b} ")
        for _ in range(_PASSES):
            s = F.replace(s, pat, rep)
        words = words.select(s.alias("s"), "freq").localCheckpoint()
    return spark.createDataFrame(
        merges, "round bigint, a string, b string, merged string, pair_freq bigint"
    )


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    return bpe_train(docs)


def _oracle(n_merges: int = N_MERGES) -> str:
    """The identical algorithm as chained CTEs for DuckDB."""

    def repl(r: int) -> str:
        s = "s"
        for _ in range(_PASSES):
            s = (
                f"replace({s}, (SELECT ' '||a||' '||b||' ' FROM b{r}),"
                f" (SELECT ' '||a||b||' ' FROM b{r}))"
            )
        return s

    # MATERIALIZED is load-bearing: p{r} and w{r} each reference
    # w{r-1}, so inlined CTEs would expand w0 2^n times.
    ctes = [
        """w0 AS MATERIALIZED (
  SELECT ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s,
         CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY 1
)"""
    ]
    for r in range(1, n_merges + 1):
        ctes.append(
            f"""p{r} AS (
  SELECT t[i] AS a, t[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS pf
  FROM (SELECT string_split(trim(s), ' ') AS t, freq FROM w{r - 1}),
       UNNEST(range(1, len(t))) AS u(i)
  GROUP BY 1, 2
),
b{r} AS MATERIALIZED (SELECT a, b, pf FROM p{r} ORDER BY pf DESC, a, b LIMIT 1),
w{r} AS MATERIALIZED (SELECT {repl(r)} AS s, freq FROM w{r - 1})"""
        )
    selects = [
        f"SELECT CAST({r} AS BIGINT) AS round, a, b, a || b AS merged, pf AS pair_freq FROM b{r}"
        for r in range(1, n_merges + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


QUERIES = {
    "bpe_train_merges": bpe_train_merges,
}

ORACLES = {
    "bpe_train_merges": _oracle(),
}
