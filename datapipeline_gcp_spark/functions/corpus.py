"""Corpus-level training-data operations: eval-contamination detection,
context-window chunking, deterministic stratified sampling, vocabulary
construction.

These are the pipeline steps between "clean documents" and "training
batches" in an LLM data pipeline (the reference stops at warehouse
aggregation — `modeling_tables/business_layer/*.sql` — because a SQL
warehouse has nowhere to run them; they are engine-native here):

- **contamination_check**: fraction of an eval document's word
  n-grams that appear anywhere in the train split — the standard
  test-set-leak detector (n-gram overlap contamination, as popularized
  by GPT-3/PaLM data cards). Shuffle-joins the exploded eval shingles
  against the train shingle set on the shingle hash: at 100 TB neither
  side is broadcastable, and a hash-partitioned join on the shingle is
  exactly what AQE handles; the train side is pre-deduplicated
  (distinct) so the join input is minimal.
- **doc_chunking**: fixed-size sliding token windows (size 64,
  stride 48) — context-length packing. Pure array expressions
  (split → sequence → slice → posexplode), whole-stage codegen, one
  generator per row, no shuffle at all.
- **stratified_sample**: per-language Bernoulli sampling by md5 hash
  threshold — deterministic, engine-independent, reproducible across
  reruns and engines (``df.sample`` is neither), with the inverse
  sampling weight carried for unbiased downstream estimation. A pure
  filter: no shuffle, fully pushed down.
- **vocab_topk**: document-frequency vocabulary, top 500 tokens with
  deterministic (df DESC, token ASC) tie-break — partial+final hash
  aggregate then ``TakeOrderedAndProject`` (no global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipeline_gcp_spark.functions.dedup import (
    _D_BH,
    _D_NORM,
    P,
    base_hash,
    d_shingles_sql,
    grams_of,
    normalized,
    with_shingles,
)
from datapipeline_gcp_spark.determinism import qround, sql_qround
from datapipeline_gcp_spark.schemas import load_testdata

CONTAM_NGRAM = 5
CHUNK_SIZE, CHUNK_STRIDE = 64, 48
VOCAB_K = 500
#: per-mille keep rates per language stratum (md5-hash Bernoulli)
SAMPLE_RATES = {"en": 300, "de": 700, "fr": 700}
SAMPLE_DEFAULT_RATE = 500


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, ("documents",))["documents"]


# ---------------------------------------------------------------------------
# Contamination
# ---------------------------------------------------------------------------


def contamination_check(
    eval_df: DataFrame, train_df: DataFrame, n: int = CONTAM_NGRAM
) -> DataFrame:
    """Per eval document: how many of its distinct word ``n``-grams
    occur in ANY train document. Returns (doc_id, n_shingles, n_hit,
    contamination).

    Both sides are spread across the cluster before shingling: the
    per-row shingle+md5 work is expression-heavy, and a small parquet
    arrives as ONE input split which would serialize it on a single
    core (measured 27 s → ~3 s at sf0.1). At real scale the source is
    already many splits and the repartition is ~free relative to the
    shingle explode it feeds.
    """
    par = eval_df.sparkSession.sparkContext.defaultParallelism
    eval_df = eval_df.repartition(par, "doc_id")
    train_df = train_df.repartition(par, "doc_id")
    ev = (
        with_shingles(eval_df, "text", n)
        .select("doc_id", F.explode_outer("sh").alias("s"))
        .select("doc_id", base_hash(F.col("s")).alias("h"))
    )
    train = (
        with_shingles(train_df, "text", n)
        .select(F.explode_outer("sh").alias("s"))
        .select(base_hash(F.col("s")).alias("h"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        ev.join(train, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("hit").alias("n_hit"),
        )
        .withColumn(
            "contamination", F.col("n_hit").cast("double") / F.col("n_shingles")
        )
    )


def contamination_eval_vs_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered split: every 10th document is the 'eval' set, the rest
    'train'. The fixture corpus shares no 5-grams across documents, so
    planted contamination comes from the deterministic overlap the
    generator put into same-source documents (if any) — the oracle
    checks the numbers, the unit test checks a planted copy is flagged
    at contamination 1.0."""
    docs = _docs(spark, sf_dir)
    return contamination_check(
        docs.filter(F.col("doc_id") % 10 == 0),
        docs.filter(F.col("doc_id") % 10 != 0),
    )


_CONTAM_ORACLE = f"""
WITH ev AS (
  SELECT doc_id,
         (CAST(concat('0x', substr(md5(s.sh),1,15)) AS BIGINT) % 1000000007) AS h
  FROM documents, unnest({d_shingles_sql(CONTAM_NGRAM)}) AS s(sh)
  WHERE doc_id % 10 = 0
),
train AS (
  SELECT DISTINCT
         (CAST(concat('0x', substr(md5(s.sh),1,15)) AS BIGINT) % 1000000007) AS h
  FROM documents, unnest({d_shingles_sql(CONTAM_NGRAM)}) AS s(sh)
  WHERE doc_id % 10 <> 0
)
SELECT ev.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT(train.h) AS BIGINT) AS n_hit,
       CAST(COUNT(train.h) AS DOUBLE) / COUNT(*) AS contamination
FROM ev LEFT JOIN train ON ev.h = train.h
GROUP BY ev.doc_id
"""


# ---------------------------------------------------------------------------
# Chunking
# ---------------------------------------------------------------------------


def chunk_documents(
    df: DataFrame, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Sliding token windows: chunk ``i`` covers tokens
    [i*stride, i*stride + size). Every token is covered; the last chunk
    may be short. Returns (doc_id, chunk_idx, chunk_text, chunk_tokens).
    """
    # materialize the split once; n_tok and the chunk index are derived
    # from the projected column, not from per-column re-splits
    toked = df.select(
        "doc_id", F.split(normalized(F.col("text")), " ").alias("toks")
    )
    n = F.size(F.col("toks"))
    idx = F.sequence(F.lit(0), F.floor((n - 1) / stride).cast("int"))
    chunks = toked.select(
        "doc_id",
        "toks",
        n.alias("n_tok"),
        F.posexplode(idx).alias("_p", "chunk_idx"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.concat_ws(
            " ", F.slice(F.col("toks"), F.col("chunk_idx") * stride + 1, size)
        ).alias("chunk_text"),
        F.least(F.lit(size), F.col("n_tok") - F.col("chunk_idx") * stride)
        .cast("long")
        .alias("chunk_tokens"),
    )


def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(_docs(spark, sf_dir))


_CHUNK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split({_D_NORM}, ' ') AS t FROM documents
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       array_to_string(t[i*{CHUNK_STRIDE}+1 : i*{CHUNK_STRIDE}+{CHUNK_SIZE}], ' ')
         AS chunk_text,
       CAST(least({CHUNK_SIZE}, len(t) - i*{CHUNK_STRIDE}) AS BIGINT)
         AS chunk_tokens
FROM toks, unnest(generate_series(0, (len(t)-1)//{CHUNK_STRIDE})) AS u(i)
"""


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------

PACK_BUDGET = 2048
PACK_SHARDS = 64


def pack_chunks(
    chunks: DataFrame, budget: int = PACK_BUDGET, shards: int = PACK_SHARDS
) -> DataFrame:
    """Contiguous sequence packing: assign chunks (in deterministic
    (doc_id, chunk_idx) order) to fixed token-budget bins — the step
    that turns variable-length chunks into uniform training sequences.

    Bin id = ``floor(running_token_total_before_chunk / budget)``
    (concat-then-split packing: a chunk may straddle a bin boundary;
    the trainer's loader handles the split, this operator decides
    placement). The running total is a window cumsum with an explicit
    ROWS frame — but windowed *within a hash shard*, never globally: a
    global packing order would funnel 100 TB through one partition.
    Shards pack independently (doc_id-hashed, so a document's chunks
    stay together in order); integer token math makes the result exact
    in any engine. Returns (shard, doc_id, chunk_idx, chunk_tokens,
    offset_in_shard, bin_id).
    """
    from pyspark.sql import Window

    # md5-derived shard (engine-shared hash; see base_hash)
    shard = base_hash(F.col("doc_id").cast("string")) % shards
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        chunks.withColumn("shard", shard.cast("long"))
        .select(
            "shard",
            "doc_id",
            "chunk_idx",
            "chunk_tokens",
            F.coalesce(F.sum("chunk_tokens").over(w), F.lit(0))
            .cast("long")
            .alias("offset_in_shard"),
        )
        .withColumn("bin_id", F.expr(f"offset_in_shard DIV {budget}"))
    )


def corpus_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_chunks(chunk_documents(_docs(spark, sf_dir)))


_PACK_ORACLE_TMPL = """
WITH chunks AS ({chunk_oracle}),
sharded AS (
  SELECT *,
         (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)
          % 1000000007) % PACK_SHARDS_SLOT AS shard
  FROM chunks
),
packed AS (
  SELECT shard, doc_id, chunk_idx, chunk_tokens,
         CAST(COALESCE(SUM(chunk_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id, chunk_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS offset_in_shard
  FROM sharded
)
SELECT shard, doc_id, chunk_idx, chunk_tokens, offset_in_shard,
       offset_in_shard // PACK_BUDGET_SLOT AS bin_id
FROM packed
"""

_PACK_ORACLE = (
    _PACK_ORACLE_TMPL.replace("PACK_SHARDS_SLOT", str(PACK_SHARDS))
    .replace("PACK_BUDGET_SLOT", str(PACK_BUDGET))
    .format(chunk_oracle=_CHUNK_ORACLE)
)


# ---------------------------------------------------------------------------
# Stratified sampling
# ---------------------------------------------------------------------------


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    rates: dict[str, int] | None = None,
    default_rate: int = SAMPLE_DEFAULT_RATE,
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff
    ``md5int(doc_id) % 1000 < rate[stratum]`` (rates in per-mille).
    Hash-threshold sampling is reproducible across engines, reruns and
    repartitioning — unlike ``DataFrame.sample`` — and adds a
    ``sample_weight`` = 1000/rate column so downstream aggregates can
    Horvitz-Thompson re-weight. Returns (doc_id, stratum, bucket,
    sample_weight)."""
    rates = SAMPLE_RATES if rates is None else rates
    rate = F.lit(default_rate)
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(rate)
    bucket = base_hash(F.col("doc_id").cast("string")) % 1000
    return (
        df.withColumn("bucket", bucket)
        .withColumn("rate", rate)
        .filter(F.col("bucket") < F.col("rate"))
        .select(
            "doc_id",
            F.col(strata_col).alias("stratum"),
            F.col("bucket").cast("long").alias("bucket"),
            # nullif: a rate of 0 ("drop this stratum") keeps no rows,
            # but under ANSI the bare division crashes at PLAN time —
            # constant folding evaluates 1000.0/0 when the rate chain
            # folds to a literal (hypothesis property test)
            (
                F.lit(1000.0)
                / F.nullif(F.col("rate").cast("double"), F.lit(0.0))
            ).alias("sample_weight"),
        )
    )


def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_sample(_docs(spark, sf_dir))


def _rate_case() -> str:
    whens = " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in sorted(SAMPLE_RATES.items())
    )
    return f"(CASE {whens} ELSE {SAMPLE_DEFAULT_RATE} END)"


_SAMPLE_ORACLE = f"""
SELECT doc_id,
       lang AS stratum,
       CAST((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)
             % 1000000007) % 1000 AS BIGINT) AS bucket,
       1000.0 / {_rate_case()} AS sample_weight
FROM documents
WHERE (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)
       % 1000000007) % 1000 < {_rate_case()}
"""


# ---------------------------------------------------------------------------
# Vocabulary
# ---------------------------------------------------------------------------


def vocab_topk(df: DataFrame, k: int = VOCAB_K) -> DataFrame:
    """Top-``k`` tokens by document frequency (distinct documents
    containing the token), ties broken by token text — deterministic.
    Token multiset per doc is deduplicated *before* the global
    aggregate (array_distinct inside the row), so the shuffled explode
    carries each (doc, token) once."""
    toks = df.select(
        "doc_id",
        F.explode_outer(F.array_distinct(F.split(normalized(F.col("text")), " "))).alias(
            "token"
        ),
    )
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("token"))
        .limit(k)
    )


def corpus_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_topk(_docs(spark, sf_dir))


_VOCAB_ORACLE = f"""
SELECT token, CAST(COUNT(*) AS BIGINT) AS doc_freq
FROM (
  SELECT doc_id, u.token
  FROM (SELECT doc_id, list_distinct(string_split({_D_NORM}, ' ')) AS t
        FROM documents), unnest(t) AS u(token)
)
GROUP BY token
ORDER BY doc_freq DESC, token
LIMIT {VOCAB_K}
"""


# ---------------------------------------------------------------------------
# Vocabulary encoding
# ---------------------------------------------------------------------------


def encode_with_vocab(docs: DataFrame, vocab: DataFrame) -> DataFrame:
    """Token→id encoding against a ranked vocabulary (OOV → 0).

    The vocabulary (≤ VOCAB_K rows) is folded into ONE map value and
    broadcast — the corpus side is a pure per-row ``transform`` with a
    JVM map lookup per token: **no shuffle of the corpus at all**. The
    alternative shape (explode tokens → join vocab → re-aggregate by
    position) keeps every expression in codegen but shuffles the entire
    exploded corpus twice; at 100 TB the no-shuffle map-side encode wins
    by far. Returns (doc_id, token_ids [csv string — driver-hashable],
    n_tokens, n_oov).

    ``vocab`` must carry (token, token_id); ids are 1-based so 0 can
    mean out-of-vocabulary.
    """
    vmap = vocab.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("token"), F.col("token_id")))
        ).alias("vmap")
    )
    tokens = F.split(normalized(F.col("text")), " ")
    ids = F.transform(
        tokens, lambda t: F.coalesce(F.element_at(F.col("vmap"), t), F.lit(0))
    )
    return (
        docs.crossJoin(F.broadcast(vmap))
        .select("doc_id", ids.alias("ids"))
        .select(
            "doc_id",
            F.concat_ws(",", F.transform(F.col("ids"), lambda x: x.cast("string")))
            .alias("token_ids"),
            F.size("ids").cast("long").alias("n_tokens"),
            F.size(F.filter(F.col("ids"), lambda x: x == 0))
            .cast("long")
            .alias("n_oov"),
        )
    )


def ranked_vocab(df: DataFrame, k: int = VOCAB_K) -> DataFrame:
    """vocab_topk + dense 1-based ids. The row_number window runs on the
    ≤k-row vocabulary result (single partition by construction — it is
    post-limit, not corpus-scale)."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col("doc_freq").desc(), F.col("token"))
    return vocab_topk(df, k).select(
        "token", F.row_number().over(w).cast("long").alias("token_id")
    )


def corpus_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    # one encoding per LOGICAL document: exact duplicate storage rows
    # (r9 dupkeys — batch-layer redelivery) collapse at the boundary,
    # mirrored by the oracle's SELECT DISTINCT source. The vocab side
    # needs no dedup — its doc_freq already counts DISTINCT doc_ids.
    return encode_with_vocab(docs.distinct(), ranked_vocab(docs))


_ENCODE_ORACLE = f"""
WITH vocab AS (
  SELECT token,
         row_number() OVER (ORDER BY doc_freq DESC, token) AS token_id
  FROM ({_VOCAB_ORACLE})
),
toks AS (
  SELECT doc_id, string_split({_D_NORM}, ' ') AS t
  FROM (SELECT DISTINCT * FROM documents) documents
),
pos AS (
  SELECT doc_id, u.i AS ord, t[u.i] AS token
  FROM toks, unnest(generate_series(1, len(t))) AS u(i)
),
enc AS (
  SELECT pos.doc_id, pos.ord, COALESCE(vocab.token_id, 0) AS tid
  FROM pos LEFT JOIN vocab ON pos.token = vocab.token
)
SELECT doc_id,
       array_to_string(list(tid ORDER BY ord), ',') AS token_ids,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) FILTER (tid = 0) AS BIGINT) AS n_oov
FROM enc
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Repetition (Gopher-style duplicate n-gram fraction)
# ---------------------------------------------------------------------------

REP_NGRAM = 3


def repetition_metrics(df: DataFrame, n: int = REP_NGRAM) -> DataFrame:
    """Gopher-rule repetition signal: the fraction of a document's
    positional ``n``-grams that occur more than once within the document
    (machine-generated / boilerplate text scores high). Per doc:
    explode the gram MULTISET (not the distinct set), count per gram,
    then sum instances of duplicated grams over the total — two hash
    aggregates, both keyed under doc_id so the second reuses the
    first's partitioning. Returns (doc_id, n_grams, dup_gram_frac)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    toked = (
        df.repartition(par, "doc_id")
        .select("doc_id", F.split(normalized(F.col("text")), " ").alias("toks"))
        .select("doc_id", F.explode_outer(grams_of(F.col("toks"), n)).alias("g"))
    )
    per_gram = toked.groupBy("doc_id", "g").agg(F.count("*").alias("cnt"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_grams"),
        (
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).cast(
                "double"
            )
            / F.sum("cnt")
        ).alias("dup_gram_frac"),
    )


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_metrics(_docs(spark, sf_dir))


_REPETITION_ORACLE = f"""
WITH grams AS (
  SELECT doc_id, u.g
  FROM documents, unnest({d_shingles_sql(REP_NGRAM, distinct=False)}) AS u(g)
),
per_gram AS (
  SELECT doc_id, g, COUNT(*) AS cnt FROM grams GROUP BY doc_id, g
)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE) / SUM(cnt)
         AS dup_gram_frac
FROM per_gram
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Unigram language-model scoring (perplexity proxy)
# ---------------------------------------------------------------------------


def unigram_logprob(df: DataFrame) -> DataFrame:
    """Per-document average negative log-likelihood under the corpus's
    own unigram model — the cheap perplexity-proxy quality signal
    (high = unusual token mix). p(t) = term_count(t)/total_terms over
    the whole corpus; score = -(1/n)·Σ ln p(token_i) over the document's
    token SEQUENCE (term frequencies, not distinct).

    Shape: one explode→count aggregate builds the model; the scorer
    joins exploded tokens to it (shuffle on token), then re-aggregates
    per doc. Every token is in-vocabulary by construction (the model is
    the corpus itself), so no smoothing term is needed. The score is
    rounded to 6 dp: ln may differ in the last ulp across libm
    implementations, and the per-group float sum is order-sensitive at
    ~1e-16 relative — both orders of magnitude below the rounding.
    Returns (doc_id, n_terms, avg_neg_logprob)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    toks = df.repartition(par, "doc_id").select(
        "doc_id",
        F.explode_outer(F.split(normalized(F.col("text")), " ")).alias("token"),
    )
    from pyspark.sql import Window

    # total term count rides ON the model as an unbounded window sum —
    # a separate `model.agg(sum)` frame re-executes the whole corpus
    # scan+explode+aggregate a second time (observed in the plan) and
    # adds a nested-loop cross join. The window is single-partition by
    # construction but runs on the vocabulary-sized model, not the
    # corpus, so it is bounded at any scale.
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    model = (
        toks.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .withColumn("total", F.sum("cnt").over(w_all))
    )
    # the model is vocabulary-sized (sublinear in corpus size) —
    # broadcast it so the token stream never shuffles for the join, and
    # the final per-doc aggregate reuses the doc_id partitioning from
    # the repartition above (no third corpus shuffle)
    scored = toks.join(F.broadcast(model), "token").select(
        "doc_id",
        (-F.log(F.col("cnt").cast("double") / F.col("total"))).alias("nll"),
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_terms"),
        qround(F.avg("nll"), 6).alias("avg_neg_logprob"),
    )


def corpus_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return unigram_logprob(_docs(spark, sf_dir))


_UNIGRAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, u.token
  FROM (SELECT doc_id, string_split({_D_NORM}, ' ') AS t FROM documents),
       unnest(t) AS u(token)
),
model AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
total AS (SELECT SUM(cnt) AS total FROM model)
SELECT toks.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       {sql_qround('AVG(-ln(CAST(cnt AS DOUBLE) / total))', 6)} AS avg_neg_logprob
FROM toks JOIN model USING (token), total
GROUP BY toks.doc_id
"""


# ---------------------------------------------------------------------------
# Data card: per-(lang, source) corpus report with rollup subtotals
# ---------------------------------------------------------------------------


def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus 'data card' rollup: document counts and token totals
    per (lang, source) with subtotals per lang and a grand total —
    integer-exact aggregates only, so no decimal plumbing is needed."""
    from datapipeline_gcp_spark.functions.text import with_text_metrics

    docs = with_text_metrics(_docs(spark, sf_dir))
    # ANSI patch-up for Spark's grouping-sets-on-empty deviation (see
    # operators/analytics._grand_total_if_empty): the standard and
    # DuckDB emit the () grand-total row even over zero input rows;
    # Spark's Expand produces nothing. Gated on COUNT(*) = 0 — zero
    # rows on any non-empty corpus, so the hot path is untouched.
    grand_if_empty = (
        docs.agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars_calc").alias("total_chars"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .filter(F.col("n_docs") == 0)
        .select(
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("string").alias("source"),
            "n_docs",
            "total_tokens",
            "total_chars",
            "max_tokens",
            F.lit(1).cast("bigint").alias("g_lang"),
            F.lit(1).cast("bigint").alias("g_source"),
        )
    )
    return (
        docs.rollup("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars_calc").alias("total_chars"),
            F.max("n_tokens").alias("max_tokens"),
            F.grouping("lang").cast("bigint").alias("g_lang"),
            F.grouping("source").cast("bigint").alias("g_source"),
        )
        .unionByName(grand_if_empty)
        .withColumn(
            "avg_tokens",
            # nullif: the empty-corpus grand-total row has n_docs = 0
            # and the division THROWS under ANSI; NULL is DuckDB's
            # NULL/0 on the same row (rollup rows always have n_docs
            # >= 1, so this changes nothing on non-empty input)
            qround(
                F.col("total_tokens").cast("double")
                / F.nullif(F.col("n_docs"), F.lit(0)),
                6,
            ),
        )
    )


# n_tokens mirrors text.py's with_text_metrics: regex \s+ split on the
# trimmed text (NOT a single-space split)
# NULL ≡ '' (r8 text boundary; twin of with_text_metrics' coalesce)
_D_NTOK = "CAST(len(regexp_split_to_array(trim(coalesce(text, '')), '\\s+')) AS BIGINT)"

_DATACARD_ORACLE = f"""
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM({_D_NTOK}) AS BIGINT) AS total_tokens,
       CAST(SUM(length(coalesce(text, ''))) AS BIGINT) AS total_chars,
       CAST(MAX({_D_NTOK}) AS BIGINT) AS max_tokens,
       CAST(CASE WHEN GROUPING(lang) = 1 THEN 1 ELSE 0 END AS BIGINT)
         AS g_lang,
       CAST(CASE WHEN GROUPING(source) = 1 THEN 1 ELSE 0 END AS BIGINT)
         AS g_source,
       {sql_qround('CAST(SUM(' + _D_NTOK + ') AS DOUBLE) / COUNT(*)', 6)} AS avg_tokens
FROM documents
GROUP BY ROLLUP (lang, source)
"""


# ---------------------------------------------------------------------------
# Bigram collocations (PMI)
# ---------------------------------------------------------------------------

COLLOC_MIN_COUNT = 5
COLLOC_TOPK = 100


def collocations(
    docs: DataFrame,
    min_count: int = COLLOC_MIN_COUNT,
    topk: int = COLLOC_TOPK,
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information:
    PMI(x,y) = ln(p(xy) / (p(x)·p(y))) with p(xy) over bigram positions
    and p(x) over token positions. The classic phrase-mining signal
    (high PMI = tokens that co-occur far above chance).

    Shape: two hash aggregations (unigram counts, bigram counts) over
    exploded token streams, then the bigram table joins the unigram
    counts twice (x and y side) — at scale the unigram table is the
    small side and broadcasts. Totals ride in via a 1-row cross join.
    The probability arithmetic runs in DOUBLE with a fixed op order so
    both engines see identical operands; the final ln differs in the
    last ULP between libm builds, so the score is qround'd to 6 dp
    (the repo-standard cross-engine equalizer) BEFORE the top-k sort —
    the rounded score is the ranking key, so the cut is identical in
    both engines."""
    toks = docs.withColumn(
        "t", F.split(normalized(F.col("text")), " ")
    )
    uni = (
        toks.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    tot_uni = uni.agg(F.sum("c").cast("double").alias("n_uni"))
    bi = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2),"
                    " i -> struct(t[i] AS x, t[i + 1] AS y))"
                )
            ).alias("p")
        )
        .select("p.x", "p.y")
        .groupBy("x", "y")
        .agg(F.count("*").alias("c_xy"))
    )
    tot_bi = bi.agg(F.sum("c_xy").cast("double").alias("n_bi"))
    ux = uni.select(F.col("tok").alias("x"), F.col("c").alias("c_x"))
    uy = uni.select(F.col("tok").alias("y"), F.col("c").alias("c_y"))
    scored = (
        bi.filter(F.col("c_xy") >= min_count)
        .join(ux, "x")
        .join(uy, "y")
        .crossJoin(tot_uni)
        .crossJoin(tot_bi)
        .select(
            "x",
            "y",
            "c_xy",
            qround(
                F.log(
                    (F.col("c_xy").cast("double") / F.col("n_bi"))
                    / (
                        (F.col("c_x").cast("double") / F.col("n_uni"))
                        * (F.col("c_y").cast("double") / F.col("n_uni"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "x", "y").limit(topk)


def corpus_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return collocations(_docs(spark, sf_dir))


_PMI_EXPR = sql_qround(
    "ln((CAST(b.c_xy AS DOUBLE) / n_bi)"
    " / ((CAST(ux.c AS DOUBLE) / n_uni) * (CAST(uy.c AS DOUBLE) / n_uni)))",
    6,
)

# DuckDB lists are 1-based (Spark arrays are 0-based) — the generate_series
# bounds differ accordingly but the produced pairs are identical.
_COLLOC_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split({_D_NORM}, ' ') AS t FROM documents
),
uni AS (
  SELECT tok, COUNT(*) AS c
  FROM (SELECT unnest(t) AS tok FROM toks)
  GROUP BY tok
),
tot_uni AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_uni FROM uni),
bi AS (
  SELECT t[i] AS x, t[i + 1] AS y
  FROM toks
  CROSS JOIN LATERAL unnest(generate_series(1, len(t) - 1)) AS g(i)
  WHERE len(t) >= 2
),
bic AS (SELECT x, y, COUNT(*) AS c_xy FROM bi GROUP BY x, y),
tot_bi AS (SELECT CAST(SUM(c_xy) AS DOUBLE) AS n_bi FROM bic)
SELECT b.x, b.y, CAST(b.c_xy AS BIGINT) AS c_xy, {_PMI_EXPR} AS pmi
FROM bic b
JOIN uni ux ON b.x = ux.tok
JOIN uni uy ON b.y = uy.tok
CROSS JOIN tot_uni
CROSS JOIN tot_bi
WHERE b.c_xy >= {COLLOC_MIN_COUNT}
ORDER BY pmi DESC, b.x, b.y
LIMIT {COLLOC_TOPK}
"""


# ---------------------------------------------------------------------------
# TF-IDF (top terms per document)
# ---------------------------------------------------------------------------

TFIDF_TOPK = 3


def tfidf_topk(docs: DataFrame, topk: int = TFIDF_TOPK) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF
    (tf · ln(N/df), raw counts — SURVEY §7 Phase 4's tf-idf column).

    Shape: one aggregation for term frequencies (doc, token), one for
    document frequencies (token), a join between them (df side is
    vocabulary-sized → broadcastable at scale), the corpus size riding
    in via a 1-row cross join, and one per-doc window for the top-k
    cut. The ln differs in the last ULP between libm builds, so the
    score is qround'd (repo-standard) BEFORE ranking; ties break on
    token, so the cut is engine-identical."""
    toks = docs.select(
        "doc_id",
        F.explode_outer(F.split(normalized(F.col("text")), " ")).alias(
            "token"
        ),
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_tbl = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(df_tbl, "token")
        .crossJoin(n_docs)
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            qround(
                F.col("tf").cast("double")
                * F.log(F.col("n_docs") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("doc_id", "rank", "token", "tf", "df", "tfidf")
    )


def corpus_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_topk(_docs(spark, sf_dir))


_TFIDF_EXPR = sql_qround(
    "CAST(tf AS DOUBLE)"
    " * ln((SELECT n_docs FROM n) / CAST(df AS DOUBLE))",
    6,
)

_TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_D_NORM}, ' ')) AS token
  FROM documents
),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, token
),
dfq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfq.df,
         {_TFIDF_EXPR} AS tfidf
  FROM tf JOIN dfq ON tf.token = dfq.token
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, token
  ) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS INT) AS rank, token, tf, df, tfidf
FROM ranked WHERE rank <= {TFIDF_TOPK}
"""


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis)
# ---------------------------------------------------------------------------

WSAMPLE_K = 100


def weighted_sample(
    docs: DataFrame,
    weight_col: str = "n_chars",
    k: int = WSAMPLE_K,
) -> DataFrame:
    """Weighted sample WITHOUT replacement of size k: the
    Efraimidis–Spirakis A-ES scheme — each row gets key = ln(u)/w with
    u uniform in (0,1], and the k largest keys are the sample
    (inclusion probability ∝ weight, exactly the without-replacement
    semantics). This is THE distributed weighted reservoir: keys are
    computed row-locally, and a global top-k needs no shuffle of the
    data — Spark plans TakeOrderedAndProject (per-partition heaps, tiny
    merge at the driver).

    Determinism: u derives from the engine-shared md5 hash
    (``base_hash``+1, so u>0), making the sample a pure function of the
    data — rerun-stable and identical in the DuckDB oracle. The ln is
    libm → key is qround'd before ranking, doc_id breaks ties."""
    u = (base_hash(F.col("doc_id").cast("string")) + 1).cast(
        "double"
    ) / F.lit(float(P))
    # try_divide: weight 0 (an empty document) means "never sample" —
    # a NULL key sorts last under DESC, exactly that semantic, and
    # matches DuckDB's division-by-zero NULL; a bare division THROWS
    # under ANSI
    key = qround(
        F.try_divide(F.log(u), F.col(weight_col).cast("double")), 9
    )
    return (
        docs.select(
            "doc_id",
            "source",
            F.col(weight_col).alias("weight"),
            key.alias("sample_key"),
        )
        .orderBy(F.desc("sample_key"), "doc_id")
        .limit(k)
    )


def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_sample(_docs(spark, sf_dir))


_WS_U = (
    "(CAST((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))"
    " AS BIGINT) % 1000000007) + 1 AS DOUBLE) / 1000000007e0)"
)

_WSAMPLE_ORACLE = f"""
SELECT doc_id, source,
       CAST(n_chars AS BIGINT) AS weight,
       {sql_qround(f'ln({_WS_U}) / CAST(n_chars AS DOUBLE)', 9)}
         AS sample_key
FROM documents
ORDER BY sample_key DESC, doc_id
LIMIT {WSAMPLE_K}
"""


# ---------------------------------------------------------------------------
# Length-outlier filtering (per-language percentile bounds)
# ---------------------------------------------------------------------------

LENGTH_P_LO, LENGTH_P_HI = 0.05, 0.95


def length_outlier_filter(
    df: DataFrame,
    strata_col: str = "lang",
    length_col: str = "n_chars",
    p_lo: float = LENGTH_P_LO,
    p_hi: float = LENGTH_P_HI,
) -> DataFrame:
    """Flag documents whose length falls outside the [p5, p95] band of
    their OWN language — the standard length-outlier cut (truncated
    boilerplate at the short end, concatenation junk at the long end).
    Absolute thresholds misfire across languages (CJK chars ≠ Latin
    chars per token); per-stratum percentiles adapt automatically.

    Returns every row with its stratum bounds and a ``keep`` flag (the
    caller filters — keeping the flag makes the cut auditable). Bounds
    are exact interpolated percentiles rounded at 6 dp on BOTH engines
    so the keep decision can't flip on 1-ulp interpolation differences.
    One aggregate per stratum (few rows, broadcast back), one scan."""
    stats = df.groupBy(strata_col).agg(
        qround(F.percentile(length_col, F.lit(p_lo)), 6).alias("len_lo"),
        qround(F.percentile(length_col, F.lit(p_hi)), 6).alias("len_hi"),
    )
    return df.join(F.broadcast(stats), strata_col).select(
        "doc_id",
        strata_col,
        F.col(length_col),
        "len_lo",
        "len_hi",
        (
            (F.col(length_col) >= F.col("len_lo"))
            & (F.col(length_col) <= F.col("len_hi"))
        ).alias("keep"),
    )


def corpus_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return length_outlier_filter(_docs(spark, sf_dir))


_LENGTH_ORACLE = f"""
WITH stats AS (
  SELECT lang,
         {sql_qround(f'quantile_cont(n_chars, {LENGTH_P_LO})', 6)} AS len_lo,
         {sql_qround(f'quantile_cont(n_chars, {LENGTH_P_HI})', 6)} AS len_hi
  FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_chars, s.len_lo, s.len_hi,
       d.n_chars >= s.len_lo AND d.n_chars <= s.len_hi AS keep
FROM documents d JOIN stats s ON d.lang = s.lang
"""


# ---------------------------------------------------------------------------
# Temperature-scaled source mixture (multilingual/multi-source mixing)
# ---------------------------------------------------------------------------

#: token budget the mixture is solved for (documents-table scale; at real
#: scale this is the training-run token budget, e.g. 15e12)
MIX_BUDGET_TOKENS = 1_000_000
#: mixture temperature α — weights ∝ n^α. α=0.5 (sqrt) both matches
#: common practice (UnifiedQA/mT5 use α∈[0.2,0.7]) and keeps the oracle
#: bitwise: IEEE sqrt is correctly rounded in every engine, while pow's
#: libm rounding is not guaranteed identical across JVM and C runtimes.
MIX_ALPHA_IS_SQRT = True


def mixture_weights(df: DataFrame, budget: int = MIX_BUDGET_TOKENS) -> DataFrame:
    """Temperature-scaled mixing weights per source: w_s ∝ sqrt(n_s)
    where n_s is the source's total token count — the standard upweight
    of low-resource sources when composing a training mixture. Returns
    (source, n_docs, n_tokens, weight, target_tokens, epochs): the token
    budget each source gets under the mixture and how many passes over
    the source that implies (epochs > 1 ⇒ the mixture repeats it).

    Determinism: sqrt(n_s) is floor-quantized to 1e-6 and summed as
    BIGINT (order-free exact reduction — the source count is small, but
    a plain double sum over even 4 values is order-sensitive in the last
    ulp), then each weight is ONE division of two deterministic numbers.
    One corpus aggregate (partial+final, map-side combined); everything
    after runs on the sources-sized table.
    """
    per_src = df.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    qs = F.floor(F.sqrt(F.col("n_tokens").cast("double")) * F.lit(1e6)).cast(
        "bigint"
    )
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    scaled = per_src.withColumn("qs", qs).withColumn(
        "qtotal", F.sum("qs").over(w_all)
    )
    weight = F.col("qs").cast("double") / F.col("qtotal").cast("double")
    return scaled.select(
        "source",
        "n_docs",
        "n_tokens",
        qround(weight, 9).alias("weight"),
        F.floor(weight * F.lit(float(budget))).cast("bigint").alias(
            "target_tokens"
        ),
        qround(
            weight * F.lit(float(budget)) / F.col("n_tokens").cast("double"), 6
        ).alias("epochs"),
    )


def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datapipeline_gcp_spark.functions.text import with_text_metrics

    return mixture_weights(with_text_metrics(_docs(spark, sf_dir)))


#: CTE prefix shared by the mixture oracle and the source-budget oracle
#: (one definition of the temperature-scaled weights, two consumers)
_MIX_CTES = f"""per_src AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM({_D_NTOK}) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
scaled AS (
  SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS qs
  FROM per_src
),
tot AS (SELECT *, SUM(qs) OVER () AS qtotal FROM scaled)"""

_MIXTURE_ORACLE = f"""
WITH {_MIX_CTES}
SELECT source, n_docs, n_tokens,
       {sql_qround('CAST(qs AS DOUBLE) / CAST(qtotal AS DOUBLE)', 9)} AS weight,
       CAST(floor(CAST(qs AS DOUBLE) / CAST(qtotal AS DOUBLE)
                  * {float(MIX_BUDGET_TOKENS)}) AS BIGINT) AS target_tokens,
       {sql_qround(
           'CAST(qs AS DOUBLE) / CAST(qtotal AS DOUBLE) * '
           + str(float(MIX_BUDGET_TOKENS)) + ' / CAST(n_tokens AS DOUBLE)', 6
       )} AS epochs
FROM tot
"""


# ---------------------------------------------------------------------------
# Source budget enforcement (joined against the mixture weights)
# ---------------------------------------------------------------------------

#: leading sort-key granularity for budget admission: the running total
#: shuffles on (source, bucket) — BUDGET_BUCKETS× finer than source
#: alone, so no single reducer owns a whole source's cumsum
BUDGET_BUCKETS = 256


def source_budget_enforce(df: DataFrame) -> DataFrame:
    """Token-count-aware budget enforcement per source: the overall
    budget — 60% of the corpus's total tokens, computed integer-exact
    so enforcement bites identically at every SF — is split by each
    source's :func:`mixture_weights` weight into a per-source
    ``target_tokens``, and documents are admitted greedily — in a
    deterministic pseudo-random order — until the budget fills; the
    rest are cut. This is the step that turns mixture WEIGHTS into an
    actual training SELECTION (VERDICT r4 next-steps #6); under sqrt
    temperature scaling it cuts over-represented sources hardest, which
    is the point.

    Admission order is (bucket, h, doc_id) with h = the engine-shared
    md5 hash of doc_id and bucket = h % BUDGET_BUCKETS. The bucket is
    deliberately the LEADING key: semantically it's still one total
    order the oracle mirrors with a single window cumsum, but the
    execution splits the running total in two exact halves —
    per-(source, bucket) subtotals (metadata cardinality:
    sources × BUDGET_BUCKETS, prefix-summed into each bucket's starting
    offset) plus a within-bucket window cumsum whose partition key is
    (source, bucket), BUDGET_BUCKETS× finer than a per-source window.
    offset + within-bucket == the global ordered cumsum, exactly — no
    single reducer ever sorts a whole source (the 100 TB skew story;
    same decomposition as ``corpus_pack_chunks``'s shard grid).

    Returns the per-source enforcement report: (source, n_docs,
    n_tokens, target_tokens, n_docs_kept, tokens_kept, n_docs_dropped,
    tokens_dropped, fill_pct). A doc is kept iff its running total fits
    entirely (cum ≤ target) — integer comparison, engine-exact."""
    d = (
        df.select("doc_id", "source", "n_tokens")
        .withColumn("h", base_hash(F.col("doc_id").cast("string")))
        .withColumn("bucket", F.col("h") % BUDGET_BUCKETS)
    )
    # ONE corpus aggregate to the (source, bucket) grid — metadata
    # cardinality (sources × BUDGET_BUCKETS); checkpointed because the
    # weights, the global budget, and the bucket offsets all derive
    # from it (without this the plan re-scans and re-tokenizes the
    # corpus once per consumer — measured 4 parquet scans)
    bstats = (
        d.groupBy("source", "bucket")
        .agg(F.sum("n_tokens").alias("btok"))
        .localCheckpoint()
    )
    # mixture weight depends only on each source's token TOTAL, so the
    # pre-aggregated grid feeds it unchanged (weight is the only column
    # consumed)
    mix = mixture_weights(
        bstats.select("source", F.col("btok").alias("n_tokens"))
    ).select("source", "weight")
    bud = bstats.agg(F.sum("btok").alias("ttotal")).select(
        F.floor(
            (F.col("ttotal") * 3).cast("double") / F.lit(5.0)
        )
        .cast("bigint")
        .alias("budget_tokens")
    )
    tgt = (
        mix.crossJoin(F.broadcast(bud))  # 1-row scalar fusion
        .select(
            "source",
            F.floor(
                F.col("weight") * F.col("budget_tokens").cast("double")
            )
            .cast("bigint")
            .alias("target_tokens"),
        )
    )
    wb = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = bstats.select(
        "source",
        "bucket",
        F.coalesce(F.sum("btok").over(wb), F.lit(0)).alias("offset"),
    )
    ww = (
        Window.partitionBy("source", "bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = (
        d.join(F.broadcast(boff), ["source", "bucket"])
        .withColumn("cum", F.col("offset") + F.sum("n_tokens").over(ww))
        .join(F.broadcast(tgt), "source")
        .withColumn("kept", F.col("cum") <= F.col("target_tokens"))
    )
    kept_l = F.col("kept").cast("bigint")
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.max("target_tokens").alias("target_tokens"),
        F.sum(kept_l).alias("n_docs_kept"),
        F.sum(F.col("n_tokens") * kept_l).alias("tokens_kept"),
        F.sum(1 - kept_l).alias("n_docs_dropped"),
        F.sum(F.col("n_tokens") * (1 - kept_l)).alias("tokens_dropped"),
        qround(
            F.sum(F.col("n_tokens") * kept_l).cast("double")
            # greatest(...,1): a target that floors to 0 admits nothing,
            # so fill is exactly 0.0 — without the guard Spark emits
            # NULL where DuckDB emits NaN (engine-artifact hash split)
            / F.greatest(F.max("target_tokens"), F.lit(1)).cast("double"),
            6,
        ).alias("fill_pct"),
    )


def corpus_source_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datapipeline_gcp_spark.functions.text import with_text_metrics

    return source_budget_enforce(with_text_metrics(_docs(spark, sf_dir)))


_BUDGET_ORACLE = f"""
WITH {_MIX_CTES},
bud AS (
  SELECT CAST(floor(CAST(CAST(SUM({_D_NTOK}) AS BIGINT) * 3 AS DOUBLE) / 5.0)
              AS BIGINT) AS budget_tokens
  FROM documents
),
tgt AS (
  SELECT source,
         CAST(floor({sql_qround('CAST(qs AS DOUBLE) / CAST(qtotal AS DOUBLE)', 9)}
                    * CAST(budget_tokens AS DOUBLE)) AS BIGINT) AS target_tokens
  FROM tot CROSS JOIN bud
),
docs AS (
  SELECT doc_id, source, {_D_NTOK} AS n_tokens,
         (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,15))
               AS BIGINT) % {P}) AS h
  FROM documents
),
cum AS (
  SELECT *, h % {BUDGET_BUCKETS} AS bucket,
         SUM(n_tokens) OVER (
           PARTITION BY source
           ORDER BY h % {BUDGET_BUCKETS}, h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM docs
),
flagged AS (
  SELECT c.*, t.target_tokens, c.cum <= t.target_tokens AS kept
  FROM cum c JOIN tgt t USING (source)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(MAX(target_tokens) AS BIGINT) AS target_tokens,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
       CAST(SUM(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept,
       CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_docs_dropped,
       CAST(SUM(CASE WHEN kept THEN 0 ELSE n_tokens END) AS BIGINT) AS tokens_dropped,
       {sql_qround(
           'CAST(SUM(CASE WHEN kept THEN n_tokens ELSE 0 END) AS DOUBLE)'
           ' / CAST(greatest(MAX(target_tokens), 1) AS DOUBLE)', 6
       )} AS fill_pct
FROM flagged
GROUP BY source
"""


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle → training shards
# ---------------------------------------------------------------------------

N_SHARDS = 64
SHUFFLE_EPOCH = 7


def shard_shuffle(
    df: DataFrame, n_shards: int = N_SHARDS, epoch: int = SHUFFLE_EPOCH
) -> DataFrame:
    """Deterministic global shuffle of the corpus into ``n_shards``
    training shards: shard = md5(epoch·id) mod n_shards, within-shard
    order = rank of the same hash. Seeding the hash with the epoch gives
    a DIFFERENT but fully reproducible permutation per epoch — the
    property training pipelines need that ``ORDER BY rand()`` cannot
    give (reruns, engine changes and repartitioning all preserve it).

    Returns (doc_id, shard, pos). Scale shape: the hash is a projection
    (no shuffle); the position is a rank within each shard — one shuffle
    on the shard key. Shard count at real scale is chosen so a shard is
    file-sized (e.g. 100k shards for 100 TB), which also bounds the
    per-shard sort; the 64 here matches the fixture corpus. The hash is
    collision-free on this data and doc_id breaks any residual tie, so
    ``pos`` is total-ordered and the output is engine-independent."""
    h = base_hash(F.concat(F.lit(f"e{epoch}_"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        df.select(
            "doc_id",
            h.alias("h"),
            (h % n_shards).cast("bigint").alias("shard"),
        )
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "shard", "pos")
    )


def corpus_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shard_shuffle(_docs(spark, sf_dir))


def _sql_md5int(expr: str) -> str:
    return (
        f"(CAST(concat('0x', substr(md5({expr}),1,15)) AS BIGINT)"
        " % 1000000007)"
    )


_SHARD_ORACLE = f"""
WITH hashed AS (
  SELECT doc_id,
         {_sql_md5int(f"concat('e{SHUFFLE_EPOCH}_', CAST(doc_id AS VARCHAR))")} AS h
  FROM documents
)
SELECT doc_id,
       CAST(h % {N_SHARDS} AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY h % {N_SHARDS}
                               ORDER BY h, doc_id) AS BIGINT) AS pos
FROM hashed
"""


# ---------------------------------------------------------------------------
# Perplexity buckets (CCNet-style head/middle/tail)
# ---------------------------------------------------------------------------

PPL_P_HEAD, PPL_P_TAIL = 1.0 / 3.0, 2.0 / 3.0


def ppl_buckets(df: DataFrame) -> DataFrame:
    """CCNet-style quality bucketing: score every document with the
    unigram-LM perplexity proxy (:func:`unigram_logprob`), then cut the
    corpus at the 33rd/67th percentile of the score into head (most
    LM-like), middle, tail. Returns (doc_id, avg_neg_logprob, bucket).

    The thresholds are ONE two-value exact-percentile aggregate over the
    scores (broadcast back — two doubles), so bucket assignment is a
    stateless comparison and the corpus never passes through a global
    sort or single-partition window. Scores are already rounded at 6 dp
    by the scorer and the thresholds at 6 dp here, so the cut cannot
    flip on last-ulp interpolation differences."""
    scored = unigram_logprob(df).select("doc_id", "avg_neg_logprob")
    q = F.percentile("avg_neg_logprob", F.lit([PPL_P_HEAD, PPL_P_TAIL]))
    cuts = scored.agg(
        qround(q[0], 6).alias("t_head"), qround(q[1], 6).alias("t_tail")
    )
    return scored.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "avg_neg_logprob",
        F.when(F.col("avg_neg_logprob") <= F.col("t_head"), F.lit("head"))
        .when(F.col("avg_neg_logprob") <= F.col("t_tail"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def corpus_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ppl_buckets(_docs(spark, sf_dir))


_PPL_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, u.token
  FROM (SELECT doc_id, string_split({_D_NORM}, ' ') AS t FROM documents),
       unnest(t) AS u(token)
),
model AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
total AS (SELECT SUM(cnt) AS total FROM model),
scored AS (
  SELECT toks.doc_id,
         {sql_qround('AVG(-ln(CAST(cnt AS DOUBLE) / total))', 6)} AS avg_neg_logprob
  FROM toks JOIN model USING (token), total
  GROUP BY toks.doc_id
),
cuts AS (
  SELECT {sql_qround(f'quantile_cont(avg_neg_logprob, {PPL_P_HEAD!r})', 6)} AS t_head,
         {sql_qround(f'quantile_cont(avg_neg_logprob, {PPL_P_TAIL!r})', 6)} AS t_tail
  FROM scored
)
SELECT doc_id, avg_neg_logprob,
       CASE WHEN avg_neg_logprob <= t_head THEN 'head'
            WHEN avg_neg_logprob <= t_tail THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored, cuts
"""


# ---------------------------------------------------------------------------
# FIM (fill-in-the-middle) sample construction
# ---------------------------------------------------------------------------

_FIM_PRE, _FIM_SUF, _FIM_MID = "<fim_prefix>", "<fim_suffix>", "<fim_middle>"


def fim_transform(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fill-in-the-middle sample construction (the code/infilling
    training transform): pick two deterministic cut points per
    document, split tokens into prefix/middle/suffix, and emit the PSM
    re-ordering ``<fim_prefix>P<fim_suffix>S<fim_middle>M`` so the
    model learns to generate the middle conditioned on both sides.

    Cut points are md5-derived per document (engine-shared hash idiom)
    instead of an RNG, so the transform is reproducible across engines,
    retries, and partitionings — the property that makes epoch-stable
    training data. Pure column math: split, two hashes, three slices,
    one concat; no shuffle at all (embarrassingly parallel over docs)."""
    # NULL ≡ '' at the text boundary (r8; VERIFY_DEGENERATE.md) —
    # without it Spark's NULL-poisoning concat emits a NULL fim_text
    # where DuckDB's NULL-skipping concat emits the bare markers.
    t = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n = F.size(t)
    did = F.col(id_col).cast("string")
    h1 = _md5int_col(F.concat(F.lit("fim1_"), did)) % (n + 1)
    h2 = _md5int_col(F.concat(F.lit("fim2_"), did)) % (n + 1)
    lo, hi = F.least(h1, h2), F.greatest(h1, h2)
    prefix = F.array_join(F.slice(t, 1, lo), " ")
    middle = F.array_join(F.slice(t, lo + 1, hi - lo), " ")
    suffix = F.array_join(F.slice(t, hi + 1, n - hi), " ")
    return df.select(
        id_col,
        n.cast("bigint").alias("n_tokens"),
        lo.cast("bigint").alias("cut_lo"),
        hi.cast("bigint").alias("cut_hi"),
        F.concat(
            F.lit(_FIM_PRE), prefix, F.lit(_FIM_SUF), suffix, F.lit(_FIM_MID), middle
        ).alias("fim_text"),
    )


def _md5int_col(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long") % 1000000007


def corpus_fim_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fim_transform(_docs(spark, sf_dir))


_FIM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t,
         len(string_split(coalesce(text, ''), ' ')) AS n
  FROM documents
),
cuts AS (
  SELECT doc_id, t, n,
         {_sql_md5int("concat('fim1_', CAST(doc_id AS VARCHAR))")} % (n + 1) AS h1,
         {_sql_md5int("concat('fim2_', CAST(doc_id AS VARCHAR))")} % (n + 1) AS h2
  FROM toks
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(LEAST(h1, h2) AS BIGINT) AS cut_lo,
       CAST(GREATEST(h1, h2) AS BIGINT) AS cut_hi,
       concat(
         '{_FIM_PRE}', array_to_string(list_slice(t, 1, LEAST(h1, h2)), ' '),
         '{_FIM_SUF}', array_to_string(list_slice(t, GREATEST(h1, h2) + 1, n), ' '),
         '{_FIM_MID}', array_to_string(
            list_slice(t, LEAST(h1, h2) + 1, GREATEST(h1, h2)), ' ')
       ) AS fim_text
FROM cuts
"""


def corpus_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone composition — the end-of-pipeline artifact a trainer
    actually consumes: hash-split the corpus, keep the train split,
    window it into context chunks, and pack the chunks into
    token-budget bins inside hash shards, yielding the (shard, bin,
    doc, chunk, offset) manifest that maps every training sequence back
    to its source document (provenance — the thing a flat text dump
    loses). Each stage is an already-gate-proven operator
    (`corpus_split_assign`, `doc_chunking`, `corpus_pack_chunks`); this
    entry proves the COMPOSITION end-to-end against one unrolled SQL
    oracle, the same way `corpus_curation` proves the cleaning chain.

    Scale: the split is a pushed-down hash filter (no shuffle); chunking
    is a generator projection; packing is one window per shard — the
    composition adds ZERO shuffles beyond `corpus_pack_chunks` itself.
    """
    from datapipeline_gcp_spark.functions.indexing import split_assign

    train = (
        split_assign(_docs(spark, sf_dir))
        .filter(F.col("split") == "train")
        .drop("split")
    )
    return pack_chunks(chunk_documents(train))


def _manifest_oracle() -> str:
    from datapipeline_gcp_spark.functions.indexing import (
        _SPLIT_SQL_BUCKET,
        TRAIN_UPTO,
    )

    train_chunk = _CHUNK_ORACLE.replace(
        "FROM documents",
        f"FROM (SELECT * FROM documents WHERE {_SPLIT_SQL_BUCKET} < {TRAIN_UPTO})",
        1,
    )
    return (
        _PACK_ORACLE_TMPL.replace("PACK_SHARDS_SLOT", str(PACK_SHARDS))
        .replace("PACK_BUDGET_SLOT", str(PACK_BUDGET))
        .format(chunk_oracle=train_chunk)
    )


def corpus_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mass inequality per source (and corpus-wide): Gini
    coefficient of per-document token counts plus the share of tokens
    held by the longest decile — the balance report curation teams read
    before setting mixture weights and length filters (a source whose
    token mass lives in 10 % of its documents behaves like a much
    smaller source after chunking).

    Gini uses the sorted-index identity ``(2·Σ i·xᵢ)/(n·Σx) − (n+1)/n``
    with a (tokens, doc_id) total order, so every term is an exact
    integer until two final IEEE divisions (qround'd). Each document
    feeds its source scope AND the 'ALL' scope via a 2-element explode
    — one windowed pass over 2N rows, no second scan, no union of
    plans. Scale: windows key on scope (source cardinality); the
    100 TB variant replaces the per-scope sort with the binned
    approximation, same as every exact-sort escape hatch here."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split(normalized(F.col("text")), " "))
        .cast("long")
        .alias("n_tok"),
    )
    scoped = toks.select(
        "doc_id",
        "n_tok",
        F.explode(F.array(F.col("source"), F.lit("ALL"))).alias("scope"),
    )
    w = Window.partitionBy("scope").orderBy("n_tok", "doc_id")
    ranked = scoped.select(
        "scope",
        "n_tok",
        F.row_number().over(w).cast("long").alias("i"),
        F.count("*")
        .over(Window.partitionBy("scope"))
        .cast("long")
        .alias("n"),
    )
    agg = ranked.groupBy("scope").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum(F.col("i") * F.col("n_tok")).alias("iwx"),
        F.sum(
            F.when(
                F.col("i") > F.col("n") * 9 / 10, F.col("n_tok")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("top10_tokens"),
    )
    n = F.col("n_docs").cast("double")
    gini = (
        F.lit(2.0) * F.col("iwx").cast("double")
        / (n * F.col("total_tokens").cast("double"))
        - (n + 1.0) / n
    )
    return agg.select(
        "scope",
        "n_docs",
        "total_tokens",
        qround(gini, 9).alias("gini"),
        qround(
            F.col("top10_tokens").cast("double")
            / F.col("total_tokens").cast("double"),
            9,
        ).alias("top10_share"),
    )


_BALANCE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(string_split({_D_NORM}, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
scoped AS (
  SELECT doc_id, n_tok, u.scope
  FROM toks, UNNEST([source, 'ALL']) AS u(scope)
),
ranked AS (
  SELECT scope, n_tok,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY scope ORDER BY n_tok, doc_id) AS BIGINT) AS i,
         CAST(COUNT(*) OVER (PARTITION BY scope) AS BIGINT) AS n
  FROM scoped
),
agg AS (
  SELECT scope,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         CAST(SUM(i * n_tok) AS BIGINT) AS iwx,
         CAST(SUM(CASE WHEN i > n * 9 / 10 THEN n_tok ELSE 0 END)
              AS BIGINT) AS top10_tokens
  FROM ranked GROUP BY scope
)
SELECT scope, n_docs, total_tokens,
  {sql_qround(
      "2.0 * CAST(iwx AS DOUBLE)"
      " / (CAST(n_docs AS DOUBLE) * CAST(total_tokens AS DOUBLE))"
      " - (CAST(n_docs AS DOUBLE) + 1.0) / CAST(n_docs AS DOUBLE)", 9
  )} AS gini,
  {sql_qround(
      "CAST(top10_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)", 9
  )} AS top10_share
FROM agg
"""


PAD_BATCH = 16
PAD_SHARDS = 32


def padding_waste(
    docs: DataFrame, batch: int = PAD_BATCH, shards: int = PAD_SHARDS
) -> DataFrame:
    """Padding-waste audit for batch construction — the throughput
    metric behind length-bucketed batching: a batch pads every sequence
    to its longest member, so arrival-order batches burn
    ``B·max(len) − Σlen`` pad tokens while length-sorted batches
    mostly eliminate it. Returns one row per strategy
    (arrival | sorted): n_batches, total_tokens, padded_tokens,
    waste_frac — the number that justifies (or kills) adding a sort
    stage to a data loader.

    Batches form WITHIN md5 hash shards, never across the global
    corpus: a global row_number would serialize on one partition, and
    real training shards are batch-local anyway. Both strategies use
    the same shards, differing only in within-shard order (doc_id vs
    (n_tok, doc_id)). Everything is integer math except the final
    waste division — engine-exact.
    """
    toks = docs.select(
        "doc_id",
        F.size(F.split(normalized(F.col("text")), " "))
        .cast("long")
        .alias("n_tok"),
        (base_hash(F.col("doc_id").cast("string")) % shards).alias("shard"),
    )
    out = []
    for strategy, order in (
        ("arrival", [F.col("doc_id")]),
        ("sorted", [F.col("n_tok"), F.col("doc_id")]),
    ):
        w = Window.partitionBy("shard").orderBy(*order)
        # floor-division on both sides: CAST(double AS BIGINT) rounds
        # half-even in DuckDB but truncates in Spark
        batched = toks.withColumn(
            "batch_id",
            F.floor((F.row_number().over(w) - 1) / batch).cast("long"),
        )
        per_batch = batched.groupBy("shard", "batch_id").agg(
            F.count("*").alias("n_in_batch"),
            F.max("n_tok").alias("max_tok"),
            F.sum("n_tok").alias("sum_tok"),
        )
        out.append(
            per_batch.agg(
                F.count("*").alias("n_batches"),
                F.sum("sum_tok").alias("total_tokens"),
                F.sum(F.col("n_in_batch") * F.col("max_tok")).alias(
                    "padded_tokens"
                ),
            ).select(
                F.lit(strategy).alias("strategy"),
                "n_batches",
                "total_tokens",
                "padded_tokens",
            )
        )
    u = out[0].unionAll(out[1])
    return u.select(
        "strategy",
        "n_batches",
        "total_tokens",
        "padded_tokens",
        (
            F.lit(1.0)
            - F.col("total_tokens").cast("double")
            / F.col("padded_tokens").cast("double")
        ).alias("waste_frac"),
    )


def corpus_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    return padding_waste(_docs(spark, sf_dir))


_PAD_TOKS = f"""
  SELECT doc_id,
         CAST(len(string_split({_D_NORM}, ' ')) AS BIGINT) AS n_tok,
         ({_D_BH.format(s="CAST(doc_id AS VARCHAR)")} % {PAD_SHARDS}) AS shard
  FROM documents
"""

_PAD_STRATEGY = """
(
  SELECT '{name}' AS strategy,
         CAST(COUNT(*) AS BIGINT) AS n_batches,
         CAST(SUM(sum_tok) AS BIGINT) AS total_tokens,
         CAST(SUM(n_in_batch * max_tok) AS BIGINT) AS padded_tokens
  FROM (
    SELECT shard, batch_id,
           COUNT(*) AS n_in_batch, MAX(n_tok) AS max_tok,
           SUM(n_tok) AS sum_tok
    FROM (
      SELECT *, CAST((ROW_NUMBER() OVER (
               PARTITION BY shard ORDER BY {order}) - 1) // {batch}
             AS BIGINT) AS batch_id
      FROM toks
    )
    GROUP BY shard, batch_id
  )
)
"""

_PAD_ORACLE = (
    f"WITH toks AS ({_PAD_TOKS}),\n"
    "u AS (\n"
    + _PAD_STRATEGY.format(name="arrival", order="doc_id", batch=PAD_BATCH)
    + "\nUNION ALL\n"
    + _PAD_STRATEGY.format(
        name="sorted", order="n_tok, doc_id", batch=PAD_BATCH
    )
    + """
)
SELECT strategy, n_batches, total_tokens, padded_tokens,
       1.0 - CAST(total_tokens AS DOUBLE) / CAST(padded_tokens AS DOUBLE)
         AS waste_frac
FROM u
"""
)


# ---------------------------------------------------------------------------
# DSIR importance weighting (data selection via importance resampling)
# ---------------------------------------------------------------------------

#: hashed-ngram feature space size — the model table is exactly this
#: many rows, so it broadcasts at ANY corpus scale (DSIR's point: the
#: per-example cost is a bag-of-hashed-ngrams dot product, never an LM)
DSIR_BUCKETS = 1024
DSIR_TOPK = 100
DSIR_TARGET_LANG = "en"


def dsir_select(
    docs: DataFrame,
    target_lang: str = DSIR_TARGET_LANG,
    buckets: int = DSIR_BUCKETS,
    topk: int = DSIR_TOPK,
) -> DataFrame:
    """DSIR data selection (Xie et al., "Data Selection for Language
    Models via Importance Resampling", NeurIPS 2023, public paper):
    score every candidate document by how target-like its hashed-ngram
    profile is, then keep the top-k.

    Here the ``lang = target_lang`` split is the target distribution
    and every other document is the raw pool. Features are hashed
    unigrams+bigrams (the paper's choice) bucketed by the engine-shared
    md5 hash into ``buckets`` cells; both bag-of-ngrams models get
    add-1 smoothing, and a document's log importance weight is
    Σ count(b)·(ln p_target(b) − ln q_raw(b)). The paper resamples
    with Gumbel noise; this deterministic variant takes the top-k by
    weight (doc_id tie-break) so two engines agree bit-for-bit.

    Scale shape: the corpus is scanned twice (once to fit BOTH bucket
    models in a single conditional-count aggregate over ``buckets``
    rows, once to score candidates); the model side of the scoring
    join is ``buckets`` rows and explicitly broadcast, so candidate
    features never shuffle for it — the only corpus-sized exchanges
    are the two hash aggregations. The final cut is
    ``TakeOrderedAndProject`` (distributed partial top-k), never a
    global sort; the rank window runs on the ≤ ``topk`` surviving
    rows. Per-bucket log-ratios are qround'd at 9 dp so both engines
    sum an identical addend multiset; the per-doc sum is qround'd at
    6 dp (repo-standard float discipline, see
    :func:`~datapipeline_gcp_spark.determinism.qround`).

    Returns ``(rank, doc_id, n_grams, log_weight)`` for the selected
    top-k candidates.
    """
    is_target = F.col("lang").eqNullSafe(F.lit(target_lang))
    # materialize the token split in its own projection (CollapseProject
    # keeps it: the alias is referenced n times by the gram lambdas —
    # see shingles_of's docstring for the measured inline blow-up)
    toks = docs.select(
        "doc_id", "lang", F.split(normalized(F.col("text")), " ").alias("t")
    )
    # explode_outer, not explode: the gram array is provably non-empty,
    # and plain explode's implicit size>0 filter re-evaluates the whole
    # gram expression below the exchange (see minhash_signatures)
    feats = toks.select(
        "doc_id",
        "lang",
        F.explode_outer(
            F.concat(grams_of(F.col("t"), 1), grams_of(F.col("t"), 2))
        ).alias("gram"),
    ).select(
        "doc_id", "lang", (base_hash(F.col("gram")) % buckets).alias("b")
    )

    # both models in ONE corpus aggregate; totals ride on the
    # buckets-sized result as an unbounded window sum (single-partition
    # by construction, but over ≤`buckets` rows — bounded at any scale;
    # a separate .agg() frame would re-run the corpus scan)
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    model = (
        feats.groupBy("b")
        .agg(
            F.count(F.when(is_target, 1)).alias("tcnt"),
            F.count(F.when(~is_target, 1)).alias("qcnt"),
        )
        .withColumn("ttot", F.sum("tcnt").over(w_all))
        .withColumn("qtot", F.sum("qcnt").over(w_all))
        .select(
            "b",
            qround(
                F.log(
                    (F.col("tcnt") + 1).cast("double")
                    / (F.col("ttot") + buckets).cast("double")
                )
                - F.log(
                    (F.col("qcnt") + 1).cast("double")
                    / (F.col("qtot") + buckets).cast("double")
                ),
                9,
            ).alias("lr"),
        )
    )
    cand = (
        feats.filter(~is_target)
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("c"))
    )
    scored = (
        cand.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_grams"),
            qround(
                F.sum(F.col("c").cast("double") * F.col("lr")), 6
            ).alias("log_weight"),
        )
    )
    sel = scored.orderBy(F.desc("log_weight"), "doc_id").limit(topk)
    # rank window is global-order but runs AFTER the top-k cut, on
    # ≤topk rows — not a corpus-sized single-partition window
    w_rank = Window.orderBy(F.desc("log_weight"), "doc_id")
    return sel.withColumn("rank", F.row_number().over(w_rank)).select(
        "rank", "doc_id", "n_grams", "log_weight"
    )


def corpus_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dsir_select(_docs(spark, sf_dir))


_DSIR_LR = sql_qround(
    f"ln(CAST(tcnt + 1 AS DOUBLE) / CAST(ttot + {DSIR_BUCKETS} AS DOUBLE))"
    f" - ln(CAST(qcnt + 1 AS DOUBLE) / CAST(qtot + {DSIR_BUCKETS} AS DOUBLE))",
    9,
)

_DSIR_ORACLE = f"""
WITH f AS (
  SELECT doc_id, lang,
         ({_D_BH.format(s="u.g")} % {DSIR_BUCKETS}) AS b
  FROM documents,
       unnest(list_concat({d_shingles_sql(1, distinct=False)},
                          {d_shingles_sql(2, distinct=False)})) AS u(g)
),
counts AS (
  SELECT b,
         COUNT(*) FILTER (WHERE lang IS NOT DISTINCT FROM '{DSIR_TARGET_LANG}') AS tcnt,
         COUNT(*) FILTER (WHERE lang IS DISTINCT FROM '{DSIR_TARGET_LANG}') AS qcnt
  FROM f GROUP BY b
),
model AS (
  SELECT b, {_DSIR_LR} AS lr
  FROM (SELECT b, tcnt, qcnt,
               SUM(tcnt) OVER () AS ttot,
               SUM(qcnt) OVER () AS qtot
        FROM counts)
),
cand AS (
  SELECT doc_id, b, COUNT(*) AS c
  FROM f WHERE lang IS DISTINCT FROM '{DSIR_TARGET_LANG}'
  GROUP BY doc_id, b
),
scored AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_grams,
         {sql_qround("SUM(CAST(c AS DOUBLE) * lr)", 6)} AS log_weight
  FROM cand JOIN model USING (b)
  GROUP BY doc_id
)
SELECT CAST(rank AS INT) AS rank, doc_id, n_grams, log_weight
FROM (SELECT *, row_number() OVER (ORDER BY log_weight DESC, doc_id) AS rank
      FROM scored)
WHERE rank <= {DSIR_TOPK}
"""


QUERIES = {
    "corpus_fim_split": corpus_fim_split,
    "corpus_padding_waste": corpus_padding_waste,
    "corpus_balance_report": corpus_balance_report,
    "corpus_training_manifest": corpus_training_manifest,
    "contamination_eval_vs_train": contamination_eval_vs_train,
    "corpus_collocations": corpus_collocations,
    "corpus_tfidf_topk": corpus_tfidf_topk,
    "corpus_weighted_sample": corpus_weighted_sample,
    "corpus_unigram_logprob": corpus_unigram_logprob,
    "text_repetition": text_repetition,
    "corpus_datacard": corpus_datacard,
    "corpus_vocab_encode": corpus_vocab_encode,
    "corpus_pack_chunks": corpus_pack_chunks,
    "doc_chunking": doc_chunking,
    "corpus_stratified_sample": corpus_stratified_sample,
    "corpus_vocab_topk": corpus_vocab_topk,
    "corpus_length_filter": corpus_length_filter,
    "corpus_mixture_weights": corpus_mixture_weights,
    "corpus_source_budget": corpus_source_budget,
    "corpus_shard_shuffle": corpus_shard_shuffle,
    "corpus_ppl_buckets": corpus_ppl_buckets,
    "corpus_dsir_select": corpus_dsir_select,
}

ORACLES = {
    "corpus_fim_split": _FIM_ORACLE,
    "corpus_padding_waste": _PAD_ORACLE,
    "corpus_balance_report": _BALANCE_ORACLE,
    "corpus_training_manifest": _manifest_oracle(),
    "contamination_eval_vs_train": _CONTAM_ORACLE,
    "corpus_collocations": _COLLOC_ORACLE,
    "corpus_tfidf_topk": _TFIDF_ORACLE,
    "corpus_weighted_sample": _WSAMPLE_ORACLE,
    "corpus_unigram_logprob": _UNIGRAM_ORACLE,
    "text_repetition": _REPETITION_ORACLE,
    "corpus_datacard": _DATACARD_ORACLE,
    "corpus_vocab_encode": _ENCODE_ORACLE,
    "corpus_pack_chunks": _PACK_ORACLE,
    "doc_chunking": _CHUNK_ORACLE,
    "corpus_stratified_sample": _SAMPLE_ORACLE,
    "corpus_vocab_topk": _VOCAB_ORACLE,
    "corpus_length_filter": _LENGTH_ORACLE,
    "corpus_mixture_weights": _MIXTURE_ORACLE,
    "corpus_source_budget": _BUDGET_ORACLE,
    "corpus_shard_shuffle": _SHARD_ORACLE,
    "corpus_ppl_buckets": _PPL_ORACLE,
    "corpus_dsir_select": _DSIR_ORACLE,
}
