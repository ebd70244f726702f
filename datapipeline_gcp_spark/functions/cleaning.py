"""Document cleaning: PII scrubbing and C4-style line-level filtering.

Two standard pre-training corpus steps the reference's warehouse-side
pipeline has no equivalent for (beyond-parity surface, same tier as
dedup/similarity — see COVERAGE.md "Beyond-parity"):

- **PII redaction** (`redact_pii`): regexp replacement of emails, phone
  numbers, and IPv4 addresses with typed placeholder tags, plus per-doc
  match counts. Patterns are RE2-compatible (no lookaround/backrefs) so
  the SAME pattern strings run on Spark's Java regex and DuckDB's RE2 —
  the oracle shares them verbatim.
- **Line-level quality filter** (`c4_line_filter`): the C4 recipe's
  line rules — keep a line only if it has >= `MIN_LINE_WORDS` words,
  ends in terminal punctuation, and contains no blocked word; report
  kept/total counts and the cleaned text.

Everything is built-in column expressions (JVM-side, no Python in the
loop). The per-line lambdas iterate O(tokens/8) elements per document —
bounded and tiny, unlike the per-token aggregation loops this repo
rewrote into codegen form (see SCALE.md); the token array is
materialized in its own projection first so lambda substitution can't
re-split per element.

The synthetic ``documents`` fixture is lowercase word salad with no
punctuation or digits, so the registered queries deterministically PLANT
realistic structure first (doc_id-keyed emails/phones/IPs; 8-token lines
with arithmetic punctuation) and then clean it — both the planting and
the cleaning are mirrored exactly in the DuckDB oracle, so counts are
nonzero and every value is hash-checked. Library functions accept any
text column, planted or real.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_gcp_spark.functions.dedup import normalized
from datapipeline_gcp_spark.schemas import load_testdata

# RE2- and Java-compatible patterns, shared verbatim with the oracle.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

MIN_LINE_WORDS = 5
LINE_TOKENS = 8
BLOCKED_WORD = "slow"  # stand-in for the C4 badword list; occurs in the fixture


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ips) match counts for a text column."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)),
        F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0)),
        F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), 0)),
    )


def redact_pii(text: Column) -> Column:
    """Replace every email/IPv4/phone match with a typed tag.

    Email runs first (its local part may contain digits and dots that
    the IP pattern could otherwise claim); the remaining two are
    disjoint with each other and with the tags.
    """
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def with_pii_redaction(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append n_emails/n_phones/n_ips counts and a ``clean_text`` column."""
    e, p, i = pii_counts(F.col(text_col))
    return df.select(
        "*",
        e.alias("n_emails"),
        p.alias("n_phones"),
        i.alias("n_ips"),
        redact_pii(F.col(text_col)).alias("clean_text"),
    )


def _planted(doc_id: Column, text: Column) -> Column:
    """Deterministically splice PII into the synthetic fixture text:
    doc_id % 3 == 0 gets an email, % 5 == 0 a 555 phone number,
    % 7 == 0 an RFC-1918 IP — all derived from doc_id so the oracle
    rebuilds the identical string."""
    email = F.when(
        doc_id % 3 == 0,
        F.concat(F.lit(" contact user"), doc_id.cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        doc_id % 5 == 0,
        F.concat(F.lit(" call 555-0"), F.lpad((doc_id % 1000).cast("string"), 3, "0")),
    ).otherwise(F.lit(""))
    ip = F.when(
        doc_id % 7 == 0,
        F.concat(
            F.lit(" from 10.0."),
            (doc_id % 256).cast("string"),
            F.lit("."),
            ((doc_id * 3) % 256).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(text, email, phone, ip)


def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    planted = docs.select(
        "doc_id", _planted(F.col("doc_id"), F.col("text")).alias("text")
    )
    return with_pii_redaction(planted).select(
        "doc_id", "n_emails", "n_phones", "n_ips", "clean_text"
    )


_D_PLANTED = """
text
|| CASE WHEN doc_id % 3 = 0
        THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        ELSE '' END
|| CASE WHEN doc_id % 5 = 0
        THEN ' call 555-0' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
        ELSE '' END
|| CASE WHEN doc_id % 7 = 0
        THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
             || '.' || CAST((doc_id * 3) % 256 AS VARCHAR)
        ELSE '' END
"""

_PII_ORACLE = f"""
WITH planted AS (
  SELECT doc_id, {_D_PLANTED} AS text FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones,
       len(regexp_extract_all(text, '{IPV4_RE}')) AS n_ips,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{IPV4_RE}', '<IP>', 'g'),
         '{PHONE_RE}', '<PHONE>', 'g') AS clean_text
FROM planted
"""


# ---------------------------------------------------------------------------
# C4-style line filtering
# ---------------------------------------------------------------------------


def line_filter(
    df: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    lines_col: str = "lines",
    min_words: int = MIN_LINE_WORDS,
    blocked_word: str = BLOCKED_WORD,
) -> DataFrame:
    """C4 line rules over an ``array<string>`` lines column: a line
    survives iff it has >= ``min_words`` whitespace words, ends with
    terminal punctuation (``.``/``!``/``?``), and does not contain
    ``blocked_word``. Returns per-doc totals, kept counts, the kept
    fraction, and the space-joined cleaned text."""
    keep = lambda ln: (  # noqa: E731 — shared between kept/clean
        (F.size(F.split(ln, " ")) >= min_words)
        & ln.rlike(r"[.!?]$")
        & ~ln.rlike(rf"\b{blocked_word}\b")
    )
    lines = F.col(lines_col)
    kept = F.filter(lines, keep)
    return df.select(
        doc_id_col,
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        # try_divide: a zero-line document has no defined kept fraction —
        # NULL, matching DuckDB's division-by-zero; a bare division
        # THROWS under ANSI (Spark 4 default)
        F.try_divide(
            F.size(kept).cast("double"), F.size(lines).cast("double")
        ).alias("kept_frac"),
        F.array_join(kept, " ").alias("clean_text"),
    )


def _with_planted_lines(docs: DataFrame) -> DataFrame:
    """Chop each fixture document into 8-token lines and give line *i*
    of document *d* a terminal '.' iff (d + i) % 3 != 0 — deterministic
    arithmetic the oracle reproduces. The final partial line (< 8
    tokens) exercises the min-words rule; undotted lines exercise the
    punctuation rule; the fixture's own vocabulary ("slow" occurs
    naturally) exercises the badword rule."""
    toked = docs.select(
        "doc_id", F.split(normalized(F.col("text")), " ").alias("toks")
    )
    n = F.size(F.col("toks"))
    line_count = F.ceil(n.cast("double") / LINE_TOKENS).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), F.greatest(line_count, F.lit(1)) - 1),
        lambda i: F.concat(
            F.array_join(F.slice(F.col("toks"), i * LINE_TOKENS + 1, LINE_TOKENS), " "),
            F.when((F.col("doc_id") + i) % 3 != 0, F.lit(".")).otherwise(F.lit("")),
        ),
    )
    return toked.select("doc_id", lines.alias("lines"))


def text_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    return line_filter(_with_planted_lines(docs))


# NULL ≡ '' — twin of dedup._D_NORM's coalesce (r8 text boundary)
_D_TOKS = (
    "string_split(lower(regexp_replace(trim(coalesce(text, '')), '\\s+', ' ', 'g')), ' ')"
)

_LINE_ORACLE = f"""
WITH toked AS (
  SELECT doc_id, {_D_TOKS} AS toks FROM documents
),
lined AS (
  SELECT doc_id,
         list_transform(
           generate_series(0, greatest(CAST(ceil(len(toks) / {LINE_TOKENS}e0) AS INT), 1) - 1),
           i -> array_to_string(list_slice(toks, i * {LINE_TOKENS} + 1, i * {LINE_TOKENS} + {LINE_TOKENS}), ' ')
                || CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END
         ) AS lines
  FROM toked
),
kept AS (
  SELECT doc_id, lines,
         list_filter(lines, ln ->
           len(string_split(ln, ' ')) >= {MIN_LINE_WORDS}
           AND regexp_matches(ln, '[.!?]$')
           AND NOT regexp_matches(ln, '\\b{BLOCKED_WORD}\\b')
         ) AS keep_lines
  FROM lined
)
SELECT doc_id,
       len(lines) AS n_lines,
       len(keep_lines) AS n_kept,
       CAST(len(keep_lines) AS DOUBLE) / CAST(len(lines) AS DOUBLE) AS kept_frac,
       COALESCE(array_to_string(keep_lines, ' '), '') AS clean_text
FROM kept
"""


# ---------------------------------------------------------------------------
# Per-domain caps (web corpus curation)
# ---------------------------------------------------------------------------

DOMAIN_CAP = 20
URL_HOST_RE = r"https://([^/]+)/"


def cap_per_key(
    df: DataFrame, key_col: str, order_col: str, cap: int = DOMAIN_CAP
) -> DataFrame:
    """Keep at most ``cap`` rows per ``key_col``, chosen by ascending
    ``order_col`` (deterministic — never "first N encountered", which
    depends on partitioning). One shuffle on the key; the row_number
    window needs no global sort.

    Scale note: a hot key's rows all land on one task. That is inherent
    to exact per-key capping; at 100 TB pre-filter obvious over-cap keys
    with an approximate count first, or raise
    ``spark.sql.shuffle.partitions`` so one hot host doesn't dominate a
    partition's runtime. The cap itself discards the excess immediately,
    so downstream stages see bounded per-key volume."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def web_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant a URL per document (three hot domains via doc_id % 4 == 0,
    a long tail of fifty), extract the host with the shared regex, and
    report per-host totals against the cap — the hot hosts exceed it,
    the tail does not, so both branches are exercised and hash-checked."""
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    domain_id = F.when(
        F.col("doc_id") % 4 == 0, F.col("doc_id") % 3
    ).otherwise(F.col("doc_id") % 50)
    url = F.concat(
        F.lit("https://www.site"),
        domain_id.cast("string"),
        F.lit(".example/p/"),
        F.col("doc_id").cast("string"),
    )
    hosted = docs.select(
        "doc_id", F.regexp_extract(url, URL_HOST_RE, 1).alias("host")
    )
    from pyspark.sql.window import Window

    rn = F.row_number().over(Window.partitionBy("host").orderBy("doc_id"))
    return (
        hosted.withColumn("rn", rn)
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("rn") <= DOMAIN_CAP).cast("int"))
            .cast("bigint")
            .alias("n_kept"),
            F.max(
                F.when(F.col("rn") <= DOMAIN_CAP, F.col("doc_id"))
            ).alias("max_kept_doc_id"),
        )
    )


_DOMAIN_ORACLE = f"""
WITH hosted AS (
  SELECT doc_id,
         regexp_extract(
           'https://www.site'
           || CAST(CASE WHEN doc_id % 4 = 0 THEN doc_id % 3
                        ELSE doc_id % 50 END AS VARCHAR)
           || '.example/p/' || CAST(doc_id AS VARCHAR),
           '{URL_HOST_RE}', 1) AS host
  FROM documents
),
ranked AS (
  SELECT doc_id, host,
         row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rn
  FROM hosted
)
SELECT host,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rn <= {DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       MAX(CASE WHEN rn <= {DOMAIN_CAP} THEN doc_id END) AS max_kept_doc_id
FROM ranked
GROUP BY host
"""


# ---------------------------------------------------------------------------
# Boilerplate line removal (document-frequency rule)
# ---------------------------------------------------------------------------

BOILER_MIN_DOCS = 5
BOILER_HEADER = "subscribe to our newsletter today for updates."


def boilerplate_line_scores(
    df: DataFrame,
    doc_id_col: str = "doc_id",
    lines_col: str = "lines",
    min_docs: int = BOILER_MIN_DOCS,
) -> DataFrame:
    """Corpus-level boilerplate detection: a line is boilerplate when it
    occurs in ≥ ``min_docs`` DISTINCT documents (site headers, cookie
    banners, license blurbs — the lines C4/RefinedWeb-style pipelines
    strip by document frequency, which no single-document rule can
    catch). Returns (doc_id, n_lines, n_boiler_lines, boiler_frac).

    Scale shape: explode to one row per (doc, line) — line-count
    cardinality, same as every tokenizing op — then one hash aggregate
    on the line for the distinct-doc count, a semi-join of the flagged
    lines back (AQE broadcasts: the boilerplate set is tiny by
    definition), and a per-doc count. All three shuffles partial-
    aggregate; nothing is quadratic."""
    lines = F.col(lines_col)
    exploded = df.select(doc_id_col, F.explode_outer(lines).alias("line"))
    boiler = (
        exploded.groupBy("line")
        .agg(F.countDistinct(doc_id_col).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("line")
    )
    tot = df.select(doc_id_col, F.size(lines).alias("n_lines"))
    hits = (
        exploded.join(boiler, "line")
        .groupBy(doc_id_col)
        .agg(F.count("*").alias("n_boiler_lines"))
    )
    return tot.join(hits, doc_id_col, "left").select(
        doc_id_col,
        "n_lines",
        F.coalesce(F.col("n_boiler_lines"), F.lit(0).cast("long")).alias(
            "n_boiler_lines"
        ),
        # nullif: a zero-line document (empty lines array) made the
        # fraction THROW under ANSI — same class as line_filter's
        # kept_frac guard; NULL is DuckDB's division-by-zero. The
        # registered fixture always plants >= 1 line, so this is a
        # latent generic-helper crash, not an oracle change.
        (
            F.coalesce(F.col("n_boiler_lines"), F.lit(0)).cast("double")
            / F.nullif(F.col("n_lines").cast("double"), F.lit(0.0))
        ).alias("boiler_frac"),
    )


def text_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture: the planted-lines documents, with a shared header line
    prepended to every 4th document — the cross-document repeat the
    frequency rule must flag (and per-doc word salad it must not)."""
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    lined = _with_planted_lines(docs)
    with_header = lined.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.array(F.lit(BOILER_HEADER)), F.col("lines")),
        )
        .otherwise(F.col("lines"))
        .alias("lines"),
    )
    return boilerplate_line_scores(with_header)


_BOILER_ORACLE = f"""
WITH toked AS (
  SELECT doc_id, {_D_TOKS} AS toks FROM documents
),
lined AS (
  SELECT doc_id,
         list_transform(
           generate_series(0, greatest(CAST(ceil(len(toks) / {LINE_TOKENS}e0) AS INT), 1) - 1),
           i -> array_to_string(list_slice(toks, i * {LINE_TOKENS} + 1, i * {LINE_TOKENS} + {LINE_TOKENS}), ' ')
                || CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END
         ) AS lines
  FROM toked
),
withhdr AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN list_prepend('{BOILER_HEADER}', lines)
              ELSE lines END AS lines
  FROM lined
),
x AS (SELECT doc_id, unnest(lines) AS line FROM withhdr),
boiler AS (
  SELECT line FROM x GROUP BY line
  HAVING COUNT(DISTINCT doc_id) >= {BOILER_MIN_DOCS}
),
tot AS (SELECT doc_id, len(lines) AS n_lines FROM withhdr),
hits AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_boiler_lines
  FROM x JOIN boiler USING (line) GROUP BY doc_id
)
SELECT t.doc_id, t.n_lines,
       COALESCE(h.n_boiler_lines, 0) AS n_boiler_lines,
       CAST(COALESCE(h.n_boiler_lines, 0) AS DOUBLE)
         / CAST(t.n_lines AS DOUBLE) AS boiler_frac
FROM tot t LEFT JOIN hits h ON t.doc_id = h.doc_id
"""


def text_encoding_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-damage scan — the ingest QC that catches mojibake
    before it poisons tokenizers: per document, counts of C0/C1
    control characters (tab/newline excluded), U+FFFD replacement
    characters (the fingerprint of a wrong-charset decode), and
    non-ASCII code points, plus a keep flag. Pure regexp_count column
    math over one scan; the patterns are RE2-safe and shared verbatim
    with the oracle."""
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    ctrl = F.regexp_count(
        F.col("text"), F.lit(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
    ).cast("bigint")
    repl = F.regexp_count(F.col("text"), F.lit("�")).cast("bigint")
    nonascii = F.regexp_count(F.col("text"), F.lit(r"[^\x00-\x7f]")).cast(
        "bigint"
    )
    return docs.select(
        "doc_id",
        "lang",
        ctrl.alias("n_control"),
        repl.alias("n_replacement"),
        nonascii.alias("n_nonascii"),
        ((ctrl == 0) & (repl == 0)).alias("keep"),
    )


_ENCODING_ORACLE = r"""
SELECT doc_id, lang,
  CAST(len(regexp_extract_all(text,
       '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]')) AS BIGINT) AS n_control,
  CAST(len(regexp_extract_all(text, '�')) AS BIGINT) AS n_replacement,
  CAST(len(regexp_extract_all(text, '[^\x00-\x7f]')) AS BIGINT) AS n_nonascii,
  (len(regexp_extract_all(text, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]')) = 0
   AND len(regexp_extract_all(text, '�')) = 0) AS keep
FROM documents
"""


QUERIES = {
    "text_encoding_anomalies": text_encoding_anomalies,
    "text_pii_redaction": text_pii_redaction,
    "text_line_filter": text_line_filter,
    "web_domain_caps": web_domain_caps,
    "text_boilerplate_lines": text_boilerplate_lines,
}

ORACLES = {
    "text_encoding_anomalies": _ENCODING_ORACLE,
    "text_pii_redaction": _PII_ORACLE,
    "text_line_filter": _LINE_ORACLE,
    "web_domain_caps": _DOMAIN_ORACLE,
    "text_boilerplate_lines": _BOILER_ORACLE,
}
