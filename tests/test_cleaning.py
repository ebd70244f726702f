"""Semantic tests for document cleaning (PII scrub, C4 line filter) —
the oracle check proves Spark ≡ DuckDB on the fixture; these prove the
rules fire correctly on crafted inputs with known answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipeline_gcp_spark.functions import cleaning

from tests.conftest import SF_SMOKE


def test_pii_redaction_counts_and_tags(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@corp.example.org or bob@ex.io thanks"),
            (2, "call 555-0142 or 555-9999 from host 192.168.1.20 now"),
            (3, "no pii here at all"),
            (4, "version 1.2.3.4 is an ip-shaped string"),
        ],
        ["doc_id", "text"],
    )
    out = cleaning.with_pii_redaction(df).toPandas().set_index("doc_id")
    assert out.loc[1, "n_emails"] == 2 and out.loc[1, "n_phones"] == 0
    assert "jane" not in out.loc[1, "clean_text"]
    assert out.loc[1, "clean_text"].count("<EMAIL>") == 2
    assert out.loc[2, "n_phones"] == 2 and out.loc[2, "n_ips"] == 1
    assert "<PHONE>" in out.loc[2, "clean_text"]
    assert "<IP>" in out.loc[2, "clean_text"]
    assert out.loc[3, ["n_emails", "n_phones", "n_ips"]].sum() == 0
    assert out.loc[3, "clean_text"] == "no pii here at all"
    # dotted version strings DO match the simple IPv4 shape — documents
    # the deliberate precision tradeoff of regex-only detection
    assert out.loc[4, "n_ips"] == 1


def test_pii_email_redacted_before_ip_can_claim_digits(spark):
    df = spark.createDataFrame([(1, "x1.2.3.4@ex.io ping 1.2.3.4")], ["doc_id", "text"])
    out = cleaning.with_pii_redaction(df).toPandas()
    # the email (whose local part is ip-shaped) became <EMAIL>, the bare
    # address became <IP> — order of application matters and is pinned
    assert out.clean_text[0] == "<EMAIL> ping <IP>"


def test_line_filter_rules(spark):
    df = spark.createDataFrame(
        [
            # 6 words, dotted, clean -> kept
            (1, ["alpha beta gamma delta epsilon zeta."]),
            # short line (4 words) -> dropped
            (2, ["one two three four."]),
            # no terminal punctuation -> dropped
            (3, ["alpha beta gamma delta epsilon zeta"]),
            # blocked word -> dropped even though long and dotted
            (4, ["alpha beta slow delta epsilon zeta."]),
            # mixed: one of each
            (
                5,
                [
                    "alpha beta gamma delta epsilon zeta.",
                    "too short.",
                    "alpha beta slow delta epsilon zeta.",
                ],
            ),
        ],
        ["doc_id", "lines"],
    )
    out = cleaning.line_filter(df).toPandas().set_index("doc_id")
    assert out.loc[1, "n_kept"] == 1
    assert out.loc[2, "n_kept"] == 0
    assert out.loc[3, "n_kept"] == 0
    assert out.loc[4, "n_kept"] == 0
    assert out.loc[5, "n_kept"] == 1 and out.loc[5, "n_lines"] == 3
    assert out.loc[5, "clean_text"] == "alpha beta gamma delta epsilon zeta."
    assert abs(out.loc[5, "kept_frac"] - 1 / 3) < 1e-12


def test_registered_line_filter_plants_all_three_rules(spark):
    out = cleaning.text_line_filter(spark, SF_SMOKE).toPandas()
    # every doc is split into ceil(tokens/8) lines
    assert (out.n_lines >= 1).all()
    # the arithmetic punctuation rule makes ~1/3 of lines undotted, so
    # no document keeps everything unless it is tiny; overall the filter
    # must both keep and drop a substantial number of lines
    assert out.n_kept.sum() > 0
    assert (out.n_lines - out.n_kept).sum() > 0
    assert ((out.n_kept <= out.n_lines) & (out.kept_frac <= 1.0)).all()


def test_registered_pii_counts_follow_doc_id_arithmetic(spark):
    out = cleaning.text_pii_redaction(spark, SF_SMOKE).toPandas()
    assert (out.n_emails == (out.doc_id % 3 == 0).astype(int)).all()
    assert (out.n_phones == (out.doc_id % 5 == 0).astype(int)).all()
    assert (out.n_ips == (out.doc_id % 7 == 0).astype(int)).all()
    redacted = out[out.doc_id % 3 == 0]
    assert redacted.clean_text.str.contains("<EMAIL>").all()
    assert not out.clean_text.str.contains("@").any()


def test_cap_per_key_keeps_lowest_order_rows(spark):
    df = spark.createDataFrame(
        [(k, i) for k in ["a", "b"] for i in range(10)] + [("c", 0)],
        ["host", "doc_id"],
    )
    out = cleaning.cap_per_key(df, "host", "doc_id", cap=3).toPandas()
    by_host = out.groupby("host").doc_id.apply(sorted).to_dict()
    assert by_host == {"a": [0, 1, 2], "b": [0, 1, 2], "c": [0]}
    # determinism: repartitioned input gives the identical kept set
    out2 = cleaning.cap_per_key(df.repartition(7), "host", "doc_id", cap=3).toPandas()
    assert sorted(map(tuple, out2.values.tolist())) == sorted(
        map(tuple, out.values.tolist())
    )


def test_web_domain_caps_hot_vs_tail(spark):
    out = cleaning.web_domain_caps(spark, SF_SMOKE).toPandas().set_index("host")
    hot = out.loc[["www.site0.example", "www.site1.example", "www.site2.example"]]
    # the three hot domains blow past the cap and get truncated
    assert (hot.n_docs > cleaning.DOMAIN_CAP).all()
    assert (hot.n_kept == cleaning.DOMAIN_CAP).all()
    tail = out.drop(hot.index)
    # the long tail stays under the cap and is untouched
    assert (tail.n_kept == tail.n_docs).all()
    assert (out.n_kept <= out.n_docs).all()


def test_boilerplate_lines_crafted(spark):
    """The document-frequency rule flags lines shared by >= min_docs
    docs and nothing else; per-doc counts follow exactly."""
    hdr = "shared header line."
    rows = [(i, [hdr, f"unique content line {i}."]) for i in range(6)]
    rows.append((99, ["only unique text here."]))
    df = spark.createDataFrame(rows, "doc_id bigint, lines array<string>")
    out = cleaning.boilerplate_line_scores(df, min_docs=5).toPandas()
    shared = out[out.doc_id < 6]
    assert (shared.n_boiler_lines == 1).all()
    assert (shared.n_lines == 2).all()
    assert (shared.boiler_frac == 0.5).all()
    solo = out[out.doc_id == 99]
    assert (solo.n_boiler_lines == 0).all() and (solo.boiler_frac == 0.0).all()


def test_boilerplate_threshold_binds(spark):
    """A line shared by fewer than min_docs docs must NOT be flagged."""
    hdr = "almost shared line."
    rows = [(i, [hdr]) for i in range(4)]  # 4 < min_docs=5
    df = spark.createDataFrame(rows, "doc_id bigint, lines array<string>")
    out = cleaning.boilerplate_line_scores(df, min_docs=5).toPandas()
    assert (out.n_boiler_lines == 0).all()


def test_length_outlier_filter_crafted(spark):
    """Per-stratum bounds: an outlier in one language is judged by its
    OWN language's distribution, not the global one."""
    from datapipeline_gcp_spark.functions.corpus import length_outlier_filter

    rows = [(i, "en", 100 + i) for i in range(100)]          # en: 100..199
    rows += [(1000 + i, "de", 10_000 + i) for i in range(100)]  # de: 10000..
    rows.append((5000, "en", 10_050))  # long for en, normal for de
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, n_chars bigint")
    out = length_outlier_filter(df).toPandas()
    # the en outlier is dropped even though its length is ordinary in de
    assert out.loc[out.doc_id == 5000, "keep"].iloc[0] == False  # noqa: E712
    # bulk of each stratum survives
    en = out[(out.lang == "en") & (out.doc_id != 5000)]
    de = out[out.lang == "de"]
    assert en.keep.mean() > 0.85 and de.keep.mean() > 0.85
    # bounds are per-stratum
    assert en.len_hi.iloc[0] < de.len_lo.iloc[0]
