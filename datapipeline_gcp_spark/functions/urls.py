"""URL canonicalization + dedup-by-URL — the pre-content dedup stage
every web corpus runs before MinHash (VERDICT r4 next-steps #6).

Real crawl corpora carry the same page under many URL spellings (scheme
case, ``www.`` prefix, default ports, trailing slashes, tracking
params, fragments, query-param order). Canonicalizing and grouping by
the canonical URL collapses those BEFORE any content hashing — it is
corpus-linear (pure column expressions + one hash aggregate), so it
runs first and shrinks everything downstream.

The driver testdata has no URL column, so the registered query derives
deterministic messy URLs from ``documents`` (source + doc_id through
the repo's engine-shared md5 hash, ``functions.dedup.base_hash`` —
same derivation in the DuckDB oracle), then exercises the REAL
operator, :func:`canonicalize_url`, on them. Six variant spellings per
page cover the canonicalization rules; ``doc_id % PAGES_PER_SOURCE``
maps several documents to one canonical page so the dedup actually
collapses groups.

Canonical form: ``https://<host><path>[?<query>]`` with
- scheme lowered, ``http`` folded into ``https`` (crawl-dedup
  convention: the two schemes serve the same page),
- host lowered, leading ``www.`` stripped, default ports ``:443``/
  ``:80`` stripped,
- fragment stripped (never sent to the server),
- trailing slashes stripped from the path,
- tracking params (``utm_*``, ``ref=``) dropped, remaining query
  params sorted by byte order.

Scale: no joins, no windows — one projection chain (all codegen'd
string/regex/array ops, RE2-safe patterns) and one aggregate keyed on
canonical_url. At 100 TB the aggregate is the only shuffle and its key
cardinality is the page count, not the row count. Reference parity:
the reference has no URL stage (its corpus was relational,
``/root/reference/modeling_tables``); this extends the LLM-pipeline
surface the same way dedup/similarity modules do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_gcp_spark.functions.dedup import _D_BH, base_hash
from datapipeline_gcp_spark.schemas import load_testdata

#: canonical pages per source — several documents map to one page, so
#: dedup-by-URL has real groups to collapse at every SF
PAGES_PER_SOURCE = 7
#: number of messy spelling variants exercised (CASE arms below)
N_VARIANTS = 6

# regexes shared (verbatim) by the Spark columns and the DuckDB oracle;
# all RE2-safe: no backrefs, no lookaround
_RE_SCHEME = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_RE_HOST = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_RE_PATH = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
_RE_QUERY = "\\?([^#]*)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL column (module docstring rules). Pure
    built-in column ops — regexp extracts for the parts, an array
    filter+sort for the query params — so the whole thing stays inside
    whole-stage codegen."""
    u = F.regexp_replace(url, "#.*", "")  # fragment first
    scheme = F.lower(F.regexp_extract(u, _RE_SCHEME, 1))
    scheme = F.when(scheme == "http", F.lit("https")).otherwise(scheme)
    host = F.lower(F.regexp_extract(u, _RE_HOST, 1))
    host = F.regexp_replace(host, "^www\\.", "")
    host = F.regexp_replace(host, ":(443|80)$", "")
    path = F.regexp_replace(F.regexp_extract(u, _RE_PATH, 1), "/+$", "")
    params = F.filter(
        F.split(F.regexp_extract(u, _RE_QUERY, 1), "&"),
        lambda x: (x != "")
        & ~x.startswith("utm_")
        & ~x.startswith("ref="),
    )
    query = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )


def _sql_canonicalize(expr: str) -> str:
    """DuckDB twin of :func:`canonicalize_url` (same regexes, same
    filter/sort semantics — list_sort is byte-order like array_sort on
    ascii)."""
    u = f"regexp_replace({expr}, '#.*', '')"
    scheme = (
        f"CASE WHEN lower(regexp_extract({u}, '{_RE_SCHEME}', 1)) = 'http' "
        f"THEN 'https' ELSE lower(regexp_extract({u}, '{_RE_SCHEME}', 1)) END"
    )
    host = (
        f"regexp_replace(regexp_replace(lower(regexp_extract({u}, "
        f"'{_RE_HOST}', 1)), '^www\\.', ''), ':(443|80)$', '')"
    )
    path = f"regexp_replace(regexp_extract({u}, '{_RE_PATH}', 1), '/+$', '')"
    # coalesce: DuckDB's array_to_string([]) is NULL where Spark's
    # array_join([]) is '' — pin the Spark semantics
    query = (
        f"coalesce(array_to_string(list_sort(list_filter(string_split("
        f"regexp_extract({u}, '{_RE_QUERY}', 1), '&'), x -> x <> '' AND "
        f"NOT starts_with(x, 'utm_') AND NOT starts_with(x, 'ref='))), '&'), '')"
    )
    return (
        f"({scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {query} = '' THEN '' ELSE '?' || {query} END)"
    )


def with_raw_url(df: DataFrame) -> DataFrame:
    """documents + a deterministic messy ``raw_url``: page =
    doc_id % PAGES_PER_SOURCE, spelling variant = md5-derived hash of
    the doc_id (``base_hash`` — engine-shared, so the oracle derives
    the identical URL)."""
    page = (F.col("doc_id") % PAGES_PER_SOURCE).cast("string")
    v = base_hash(F.concat(F.lit("url_"), F.col("doc_id").cast("string"))) % N_VARIANTS
    base = F.concat(F.col("source"), F.lit(".example.com/p/"), page)
    upper_base = F.concat(
        F.upper(F.col("source")), F.lit(".EXAMPLE.COM/p/"), page
    )
    raw = (
        F.when(v == 0, F.concat(F.lit("https://"), base))
        .when(v == 1, F.concat(F.lit("https://WWW."), upper_base))
        .when(
            v == 2,
            F.concat(
                F.lit("https://"),
                F.col("source"),
                F.lit(".example.com:443/p/"),
                page,
                F.lit("/"),
            ),
        )
        .when(v == 3, F.concat(F.lit("https://"), base, F.lit("?utm_source=feed&ref=rss")))
        .when(v == 4, F.concat(F.lit("http://"), base, F.lit("#sec-2")))
        .otherwise(F.concat(F.lit("https://www."), base, F.lit("?b=2&a=1&utm_campaign=x")))
    )
    return df.withColumn("raw_url", raw)


def url_dedup_report(df: DataFrame) -> DataFrame:
    """Group documents by canonical URL: (canonical_url, n_docs,
    n_spellings, keep_doc_id) — min-doc_id survivorship, the same
    convention as ``dedup_exact``. One hash aggregate; the two distinct
    counts fuse into it (n_spellings counts DISTINCT raw spellings so
    the report shows how much the canonicalizer actually collapsed)."""
    return (
        df.withColumn("canonical_url", canonicalize_url(F.col("raw_url")))
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("raw_url").alias("n_spellings"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def docs_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    return url_dedup_report(with_raw_url(docs.select("doc_id", "source")))


# _D_BH: the single-sourced md5 base-hash SQL twin of base_hash — a
# local copy could drift from the Spark side independently
_RAW_URL = f"""
CASE ({_D_BH.format(s="concat('url_', CAST(doc_id AS VARCHAR))")} % {N_VARIANTS})
  WHEN 0 THEN 'https://' || source || '.example.com/p/' || page
  WHEN 1 THEN 'https://WWW.' || upper(source) || '.EXAMPLE.COM/p/' || page
  WHEN 2 THEN 'https://' || source || '.example.com:443/p/' || page || '/'
  WHEN 3 THEN 'https://' || source || '.example.com/p/' || page || '?utm_source=feed&ref=rss'
  WHEN 4 THEN 'http://' || source || '.example.com/p/' || page || '#sec-2'
  ELSE 'https://www.' || source || '.example.com/p/' || page || '?b=2&a=1&utm_campaign=x'
END
"""

_URL_DEDUP_ORACLE = f"""
WITH raw AS (
  SELECT doc_id, {_RAW_URL} AS raw_url
  FROM (SELECT doc_id, source,
               CAST(doc_id % {PAGES_PER_SOURCE} AS VARCHAR) AS page
        FROM documents)
)
SELECT {_sql_canonicalize('raw_url')} AS canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_spellings,
       MIN(doc_id) AS keep_doc_id
FROM raw
GROUP BY 1
"""

#: fixture doc_ids at/above this are planted mirror-site copies
#: (``functions.dedup.neardup_fixture``) — their URLs get a distinct
#: host, the way a real mirror lives on its own domain
MIRROR_ID_FLOOR = 500_000


def dedup_url_content_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged web-dedup cascade with per-source attrition accounting —
    the order every real crawl pipeline runs: cheap URL-canonical dedup
    FIRST (collapses re-crawls of the same page), exact content
    fingerprint dedup SECOND (catches cross-host mirrors the URL stage
    can't), near-dup (MinHash et al., registered separately) third.
    The funnel report is what a data team reads to see where volume
    goes: (source, n_raw, n_after_url, n_after_content, retained_pct).

    Runs on the planted-duplicate fixture (``neardup_fixture``): mirror
    copies (doc_id ≥ MIRROR_ID_FLOOR) get a ``<source>-mirror`` host,
    so they survive the URL stage (different domain = different
    canonical URL) and the exact-content stage must catch them — while
    the near-variants (perturbed text) correctly survive BOTH stages,
    pinning the boundary between exact and near dedup. Attribution uses
    the fixture's original source column.

    Scale: two content-cardinality hash aggregates (canonical_url,
    fingerprint), two id-keyed survivor joins, then group-cardinality
    report joins — corpus-linear, no windows, no pairwise work."""
    from datapipeline_gcp_spark.functions.dedup import (
        neardup_fixture,
        normalized,
    )

    docs = neardup_fixture(spark, sf_dir)
    host_src = F.when(
        F.col("doc_id") >= MIRROR_ID_FLOOR,
        F.concat(F.col("source"), F.lit("-mirror")),
    ).otherwise(F.col("source"))
    d = docs.select(
        "doc_id", F.col("source").alias("src"), "text", host_src.alias("source")
    )
    canon = with_raw_url(d).withColumn(
        "cu", canonicalize_url(F.col("raw_url"))
    )
    kept1 = canon.groupBy("cu").agg(F.min("doc_id").alias("doc_id"))
    s1 = canon.select("doc_id", "src", "text").join(kept1, "doc_id")
    kept2 = (
        s1.select("doc_id", F.md5(normalized(F.col("text"))).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    s2 = s1.select("doc_id", "src").join(kept2.select("doc_id"), "doc_id")
    from datapipeline_gcp_spark.determinism import qround

    report = (
        docs.groupBy(F.col("source").alias("src"))
        .agg(F.count("*").alias("n_raw"))
        .join(
            s1.groupBy("src").agg(F.count("*").alias("n_after_url")),
            "src",
            "left",
        )
        .join(
            s2.groupBy("src").agg(F.count("*").alias("n_after_content")),
            "src",
            "left",
        )
    )
    return report.select(
        F.col("src").alias("source"),
        "n_raw",
        F.coalesce(F.col("n_after_url"), F.lit(0)).alias("n_after_url"),
        F.coalesce(F.col("n_after_content"), F.lit(0)).alias(
            "n_after_content"
        ),
        qround(
            F.coalesce(F.col("n_after_content"), F.lit(0)).cast("double")
            / F.col("n_raw").cast("double"),
            6,
        ).alias("retained_pct"),
    )


def _funnel_oracle() -> str:
    from datapipeline_gcp_spark.determinism import sql_qround
    from datapipeline_gcp_spark.functions.dedup import _D_NORM, _FIXTURE_SQL

    return f"""
WITH fixture AS ({_FIXTURE_SQL}),
d AS (
  SELECT doc_id, source AS src, text,
         CASE WHEN doc_id >= {MIRROR_ID_FLOOR}
              THEN source || '-mirror' ELSE source END AS source
  FROM fixture
),
raw AS (
  SELECT doc_id, src, text, {_RAW_URL} AS raw_url
  FROM (SELECT *, CAST(doc_id % {PAGES_PER_SOURCE} AS VARCHAR) AS page FROM d)
),
canon AS (
  SELECT doc_id, src, text, {_sql_canonicalize('raw_url')} AS cu FROM raw
),
kept1 AS (SELECT MIN(doc_id) AS doc_id FROM canon GROUP BY cu),
s1 AS (SELECT c.doc_id, c.src, c.text FROM canon c JOIN kept1 USING (doc_id)),
kept2 AS (
  SELECT MIN(doc_id) AS doc_id
  FROM (SELECT doc_id, md5({_D_NORM}) AS fp FROM s1) GROUP BY fp
),
s2 AS (SELECT s1.src FROM s1 JOIN kept2 USING (doc_id)),
agg AS (
  SELECT f.source AS src,
         CAST(COUNT(*) AS BIGINT) AS n_raw
  FROM fixture f GROUP BY 1
),
a1 AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n_after_url FROM s1 GROUP BY 1),
a2 AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n_after_content FROM s2 GROUP BY 1)
SELECT agg.src AS source, n_raw,
       CAST(COALESCE(n_after_url, 0) AS BIGINT) AS n_after_url,
       CAST(COALESCE(n_after_content, 0) AS BIGINT) AS n_after_content,
       {sql_qround(
           'CAST(COALESCE(n_after_content, 0) AS DOUBLE)'
           ' / CAST(n_raw AS DOUBLE)', 6
       )} AS retained_pct
FROM agg LEFT JOIN a1 USING (src) LEFT JOIN a2 USING (src)
"""


QUERIES = {
    "docs_url_dedup": docs_url_dedup,
    "dedup_url_content_funnel": dedup_url_content_funnel,
}
ORACLES = {
    "docs_url_dedup": _URL_DEDUP_ORACLE,
    "dedup_url_content_funnel": _funnel_oracle(),
}
