"""Semantic tests for the training-data operators: the oracle check
proves Spark ≡ DuckDB; these prove the algorithms actually do their job
(planted duplicates are found, features are correct, stubs fail loudly)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from datapipeline_gcp_spark.functions import dedup, multimodal, similarity, text

from tests.conftest import SF_SMOKE


def test_exact_dedup_finds_planted_copies(spark):
    groups = dedup.dedup_exact(spark, SF_SMOKE).toPandas()
    planted = (groups["n_copies"] == 2).sum()
    # every 7th doc got an exact copy
    n_docs = (groups["n_copies"] >= 1).count()
    assert planted > 0
    assert groups["n_copies"].max() == 2
    # kept id is always the original (lowest) id
    assert (groups.loc[groups.n_copies == 2, "keep_doc_id"] < 500_000).all()


def test_minhash_lsh_recall_on_planted_neardups(spark):
    pairs = dedup.dedup_minhash_lsh(spark, SF_SMOKE).toPandas()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    planted = set(docs.loc[docs.doc_id % 10 == 0, "doc_id"])
    found = set()
    for _, r in pairs.iterrows():
        if r.doc_b == r.doc_a + 1_000_000:
            found.add(int(r.doc_a))
    recall = len(found & planted) / max(len(planted), 1)
    assert recall >= 0.9, f"LSH recall {recall} too low for 4-token-suffix dups"
    # near-dup pairs score high on signature agreement
    # (a, a+500000) with a < 500000 — i.e., original vs its exact copy;
    # diff==500000 alone also matches copy-vs-nearcopy pairs like
    # (500280, 1000280), which are NOT identical texts
    exact_pairs = pairs[(pairs.doc_b == pairs.doc_a + 500_000) & (pairs.doc_a < 500_000)]
    assert (exact_pairs.sig_match_frac == 1.0).all()


def test_incremental_dedup_matches_planted_and_skips_fresh(spark):
    """Index-vs-batch LSH: planted near/exact copies in the new batch
    match their corpus source; fresh (novel-text) docs match nothing."""
    pairs = dedup.dedup_incremental(spark, SF_SMOKE).toPandas()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    ids = set(docs.doc_id)
    # every exact copy (%13, +3M) must hit exactly its source with frac 1.0
    exact_src = {i for i in ids if i % 13 == 0}
    exact_hits = pairs[pairs.new_doc.between(3_000_000, 3_999_999)]
    hit_map = {int(r.new_doc) - 3_000_000 for _, r in exact_hits.iterrows()
               if r.corpus_doc == r.new_doc - 3_000_000}
    assert hit_map == exact_src
    assert (exact_hits[exact_hits.corpus_doc == exact_hits.new_doc - 3_000_000]
            .sig_match_frac == 1.0).all()
    # near copies (%5, +2M) recall their source at >=0.9
    near_src = {i for i in ids if i % 5 == 0}
    near_found = {int(r.new_doc) - 2_000_000 for _, r in
                  pairs[pairs.new_doc.between(2_000_000, 2_999_999)].iterrows()
                  if r.corpus_doc == r.new_doc - 2_000_000}
    assert len(near_found & near_src) / max(len(near_src), 1) >= 0.9
    # fresh docs (+4M) are false-positive-free
    assert (pairs.new_doc < 4_000_000).all()
    # asymmetry: corpus docs never appear on the new side
    assert pairs.new_doc.min() >= 2_000_000


def test_persisted_lsh_index_matches_direct_incremental(spark):
    """build_lsh_index → probe_lsh_index across two batches gives the
    same pairs as the direct (recompute-everything) incremental op —
    the index table is a faithful, reusable stand-in for the corpus."""
    from datapipeline_gcp_spark.functions.dedup import (
        build_lsh_index, incremental_fixture, incremental_neardup_pairs,
        probe_lsh_index,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS scratch")
    spark.sql("DROP TABLE IF EXISTS scratch.lsh_index")
    existing, new = incremental_fixture(spark, SF_SMOKE)
    build_lsh_index(existing, "scratch.lsh_index", n_buckets=8)

    direct = incremental_neardup_pairs(existing, new).toPandas()
    # split the batch in two and probe the SAME index twice — no
    # corpus-side recomputation between batches
    b1 = new.filter(F.col("doc_id") % 2 == 0)
    b2 = new.filter(F.col("doc_id") % 2 == 1)
    via_index = pytest.importorskip("pandas").concat(
        [
            probe_lsh_index(spark, "scratch.lsh_index", b1).toPandas(),
            probe_lsh_index(spark, "scratch.lsh_index", b2).toPandas(),
        ]
    )
    key = ["new_doc", "corpus_doc", "sig_match_frac"]
    got = sorted(map(tuple, via_index[key].itertuples(index=False)))
    want = sorted(map(tuple, direct[key].itertuples(index=False)))
    assert got == want


def test_substring_dup_scores_semantics(spark):
    """Exact copies are 100% duplicated windows; near copies (suffix
    added) score high but below the pure-copy region; counts are
    internally consistent."""
    scores = dedup.dedup_substring(spark, SF_SMOKE).toPandas()
    assert (scores.n_dup_windows <= scores.n_windows).all()
    assert ((scores.dup_frac >= 0) & (scores.dup_frac <= 1)).all()
    exact = scores[scores.doc_id.between(500_000, 999_999)]
    assert len(exact) > 0 and (exact.dup_frac == 1.0).all()
    near = scores[scores.doc_id >= 1_000_000]
    assert len(near) > 0 and (near.dup_frac > 0.2).all()
    # long near copies: the shared prefix dominates their window set
    near_long = near[near.n_windows >= 20]
    assert len(near_long) > 0 and (near_long.dup_frac > 0.75).all()
    # a source with only full 8-token windows (>=9 tokens) is a verbatim
    # prefix of its near copy, so EVERY window recurs: dup_frac exactly 1
    src_ids = {i - 1_000_000 for i in near.doc_id}
    srcs = scores[scores.doc_id.isin(src_ids) & (scores.n_windows >= 2)]
    assert len(srcs) > 0 and (srcs.dup_frac == 1.0).all()


def test_simhash_hamming_zero_for_exact_copies(spark):
    pairs = dedup.dedup_simhash(spark, SF_SMOKE).toPandas()
    exact = pairs[(pairs.doc_b - pairs.doc_a == 500_000) & (pairs.doc_a < 500_000)]
    assert len(exact) > 0
    assert (exact.hamming == 0).all()


def test_ngram_jaccard_scores_planted_pairs_high(spark):
    pairs = dedup.dedup_ngram_jaccard(spark, SF_SMOKE).toPandas()
    near = pairs[(pairs.doc_b - pairs.doc_a) == 1_000_000]
    exact = pairs[(pairs.doc_b - pairs.doc_a == 500_000) & (pairs.doc_a < 500_000)]
    assert (exact.jaccard == 1.0).all()
    # a 4-token suffix dilutes short docs more — bound the floor, check
    # the bulk is high
    assert len(near) > 0 and (near.jaccard > 0.6).all()
    assert near.jaccard.median() > 0.85


def test_bruteforce_topk_matches_numpy(spark):
    """Independent ground truth: numpy cosine top-k for one query."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").toPandas()
    mat = np.array(emb.embedding.tolist(), dtype=np.float64)
    ids = emb.vec_id.to_numpy()
    q = mat[ids == 0][0]
    scores = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    scores[ids == 0] = -np.inf
    want = set(ids[np.argsort(-np.round(scores, 9))][:10])
    got = similarity.ann_bruteforce_topk(spark, SF_SMOKE).toPandas()
    got0 = set(got.loc[got.query_id == 0, "vec_id"])
    assert got0 == want


def test_lsh_topk_is_subset_of_bucket_and_scores_match_bruteforce(spark):
    bf = similarity.ann_bruteforce_topk(spark, SF_SMOKE).toPandas()
    lsh = similarity.ann_lsh_topk(spark, SF_SMOKE).toPandas()
    merged = lsh.merge(bf, on=["query_id", "vec_id"], suffixes=("_lsh", "_bf"))
    # every LSH result's score agrees with the brute-force score
    assert (merged.score_lsh == merged.score_bf).all()


def test_ivf_topk_scores_match_bruteforce_and_recall_reasonable(spark):
    bf = similarity.ann_bruteforce_topk(spark, SF_SMOKE).toPandas()
    ivf = similarity.ann_ivf_topk(spark, SF_SMOKE).toPandas()
    # every IVF result scores identically to brute force for that pair
    merged = ivf.merge(bf, on=["query_id", "vec_id"], suffixes=("_ivf", "_bf"))
    assert (merged.score_ivf == merged.score_bf).all()
    # probing 4/32 cells must recover a meaningful share of the true top-k
    hits = len(merged)
    assert hits / len(bf) > 0.2, f"IVF recall {hits}/{len(bf)} too low"
    # full result shape: k rows per query
    assert (ivf.groupby("query_id").size() == 10).all()


def test_bpe_pretokens_bounds(spark):
    pdf = text.text_bpe_pretokenize(spark, SF_SMOKE).toPandas()
    met = text.text_metrics(spark, SF_SMOKE).toPandas()
    j = pdf.merge(met[["doc_id", "n_tokens", "n_chars_calc"]], on="doc_id")
    # at least one piece per whitespace token; never more than n_chars
    assert (j.n_pretokens >= j.n_tokens).all()
    assert (j.n_pretokens <= j.n_chars_calc).all()
    assert (j.chars_per_pretoken > 0).all()


def test_cosine_neardup_finds_perturbed_copies(spark):
    pairs = similarity.embedding_cosine_neardup(spark, SF_SMOKE).toPandas()
    assert len(pairs) > 0
    # planted pairs (vec, vec+100000) dominate and score near 1
    planted = pairs[(pairs.vec_b - pairs.vec_a) == 100_000]
    assert len(planted) > 0
    assert (planted.score > 0.99).all()


def test_corpus_curation_drops_planted_copies_and_low_quality(spark):
    from datapipeline_gcp_spark.functions import curation, dedup

    out = curation.corpus_curation(spark, SF_SMOKE).toPandas()
    fixture = dedup.neardup_fixture(spark, SF_SMOKE)
    n_fixture = fixture.count()
    # every planted exact copy (+500000 ids) must be deduped away —
    # its original shares the fingerprint and has the lower id
    assert not ((out.doc_id >= 500_000) & (out.doc_id < 1_000_000)).any()
    # filters actually bite but don't wipe the corpus
    assert 0 < len(out) < n_fixture
    assert (out.quality_score >= curation.MIN_QUALITY).all()
    assert (out.n_tokens >= curation.MIN_TOKENS).all()


def test_label_centroids_match_numpy(spark):
    cent = similarity.embedding_label_centroids(spark, SF_SMOKE).toPandas()
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").toPandas()
    lbl = emb.label.iloc[0]
    mat = np.array(emb.loc[emb.label == lbl, "embedding"].tolist(), dtype=np.float64)
    want = np.floor(mat * (1 << 20)).sum(axis=0) / len(mat) / (1 << 20)
    got = cent[cent.label == lbl].sort_values("d").centroid.to_numpy()
    assert np.allclose(got, np.round(want, 9), atol=1e-9)
    assert (cent[cent.label == lbl].n_vectors == len(mat)).all()


def test_text_quality_score_bounds(spark):
    pdf = text.text_metrics(spark, SF_SMOKE).toPandas()
    assert ((pdf.quality_score >= 0) & (pdf.quality_score <= 1.0)).all()
    assert (pdf.n_tokens > 0).all()
    assert (pdf.n_chars_calc == pdf.n_chars).all()  # fixture consistency


def test_feature_extract_math(spark):
    # library API: array-returning feature vector
    feats = multimodal.extract_features(
        multimodal.assets_from_documents(spark, SF_SMOKE)
    ).toPandas()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    row = feats[feats.asset_id == 0].iloc[0]
    buf = np.frombuffer(docs.loc[docs.doc_id == 0, "text"].iloc[0].encode(), np.uint8)
    assert row.byte_len == buf.size
    assert row.mean_byte == pytest.approx(float(buf.mean()))
    assert len(row.feature) == 8
    assert sum(row.feature) == pytest.approx(1.0)
    # registered (driver-gate) projection: scalar f0..f7 mirror the array
    reg = multimodal.multimodal_feature_extract(spark, SF_SMOKE).toPandas()
    rrow = reg[reg.asset_id == 0].iloc[0]
    assert [rrow[f"f{i}"] for i in range(8)] == pytest.approx(
        [round(v, 9) for v in row.feature]
    )


def test_real_decoder_stub_raises(spark):
    with pytest.raises(NotImplementedError, match="register_decoder"):
        multimodal.decode_payload("image", b"\x89PNG", fake=False)
    multimodal.register_decoder("image", lambda b: np.frombuffer(b, np.uint8) * 2)
    try:
        out = multimodal.decode_payload("image", b"\x01\x02", fake=False)
        assert list(out) == [2, 4]
    finally:
        multimodal._DECODERS.clear()


def test_connected_components_on_known_graph(spark):
    from datapipeline_gcp_spark.functions import clusters

    # two components: {1,2,3,4} (a chain) and {10,11}; 20-21-22 a triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["doc_a", "doc_b"],
    )
    cc = clusters.connected_components(edges).toPandas()
    comp = dict(zip(cc.node, cc.component))
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[10] == comp[11] == 10
    assert comp[20] == comp[21] == comp[22] == 20
    assert len(cc) == 9


def test_connected_components_falls_back_past_max_iter(spark):
    """r8 (VERDICT r7 #6): a chain whose diameter exceeds max_iter no
    longer raises — label propagation hands off to star contraction and
    still returns the exact component map."""
    from datapipeline_gcp_spark.functions import clusters

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9, 0, -1)], ["doc_a", "doc_b"]
    )
    # chain of diameter 9 cannot settle in 1 round of min-propagation
    comp = {
        (r["node"], r["component"])
        for r in clusters.connected_components(edges, max_iter=1).collect()
    }
    assert comp == {(i, 1) for i in range(1, 11)}


def test_incremental_components_merges_and_matches_full_cc(spark):
    from datapipeline_gcp_spark.functions import clusters

    # yesterday: components {1,2,3} and {10,11,12}; {40,41}
    old_edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (40, 41)], ["doc_a", "doc_b"]
    )
    comp_old = clusters.connected_components(old_edges)
    # today: 100 joins component 10's LEAF (12); (3, 11) BRIDGES the two
    # big old components through non-root nodes; 50-51 is a brand-new
    # standalone pair; {40,41} is untouched
    new_edges = spark.createDataFrame(
        [(12, 100), (3, 11), (50, 51)], ["doc_a", "doc_b"]
    )
    inc = clusters.incremental_components(comp_old, new_edges).toPandas()
    comp = dict(zip(inc.node, inc.component))
    # merged component takes the global min label across BOTH old stars
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == comp[12] == comp[100] == 1
    assert comp[50] == comp[51] == 50
    assert comp[40] == comp[41] == 40
    # star-contraction shortcut == full CC over the accumulated edges
    full = clusters.connected_components(
        old_edges.unionAll(new_edges)
    ).toPandas()
    assert dict(zip(full.node, full.component)) == comp


def test_cluster_summary_elects_minimum_and_sizes(spark):
    from datapipeline_gcp_spark.functions import clusters

    edges = spark.createDataFrame([(5, 6), (6, 7), (30, 31)], ["doc_a", "doc_b"])
    out = clusters.cluster_summary(clusters.connected_components(edges)).toPandas()
    s5 = out[out.component == 5]
    assert set(s5.doc_id) == {5, 6, 7} and (s5.cluster_size == 3).all()
    assert set(s5.loc[s5.keep_flag == 1, "doc_id"]) == {5}
    s30 = out[out.component == 30]
    assert set(s30.doc_id) == {30, 31} and (s30.cluster_size == 2).all()


def test_chunking_covers_all_tokens_and_overlaps(spark):
    from datapipeline_gcp_spark.functions import corpus

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(100))), (2, "a b c")],
        ["doc_id", "text"],
    )
    out = corpus.chunk_documents(df, size=64, stride=48).toPandas()
    d1 = out[out.doc_id == 1].sort_values("chunk_idx")
    # 100 tokens, stride 48 -> chunks at 0, 48, 96
    assert list(d1.chunk_idx) == [0, 1, 2]
    assert list(d1.chunk_tokens) == [64, 52, 4]
    # overlap: chunk 1 starts at token 48, chunk 0 ends at token 63
    assert d1.iloc[1].chunk_text.split()[0] == "t48"
    assert d1.iloc[0].chunk_text.split()[-1] == "t63"
    # short doc: single short chunk
    d2 = out[out.doc_id == 2]
    assert len(d2) == 1 and d2.iloc[0].chunk_tokens == 3


def test_contamination_flags_planted_copy(spark):
    from datapipeline_gcp_spark.functions import corpus

    base = " ".join(f"w{i}" for i in range(30))
    train = spark.createDataFrame(
        [(1, base), (2, "completely different text about other things entirely")],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(10, base), (11, "nothing here overlaps with any training document at all")],
        ["doc_id", "text"],
    )
    out = corpus.contamination_check(ev, train).toPandas().set_index("doc_id")
    assert out.loc[10, "contamination"] == 1.0
    assert out.loc[11, "contamination"] == 0.0


def test_stratified_sample_rates_and_determinism(spark):
    from datapipeline_gcp_spark.functions import corpus

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "xx") for i in range(2000)],
        ["doc_id", "lang"],
    )
    a = corpus.stratified_sample(df).toPandas()
    b = corpus.stratified_sample(df.repartition(7)).toPandas()
    # reproducible regardless of partitioning
    assert sorted(a.doc_id) == sorted(b.doc_id)
    en = a[a.stratum == "en"]
    xx = a[a.stratum == "xx"]
    # en rate 300/1000, default 500/1000; binomial tolerance
    assert 0.25 < len(en) / 1000 < 0.35
    assert 0.45 < len(xx) / 1000 < 0.55
    assert (en.sample_weight == 1000.0 / 300).all()
    assert (xx.sample_weight == 2.0).all()


def test_vocab_topk_orders_by_doc_freq_then_token(spark):
    from datapipeline_gcp_spark.functions import corpus

    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "apple cherry"), (3, "banana apple")],
        ["doc_id", "text"],
    )
    out = corpus.vocab_topk(df, k=2).toPandas()
    # apple in 3 docs (multiset deduped per doc), banana in 2
    assert list(out.token) == ["apple", "banana"]
    assert list(out.doc_freq) == [3, 2]


def test_vocab_encode_ids_and_oov(spark):
    from datapipeline_gcp_spark.functions import corpus

    docs = spark.createDataFrame(
        [(1, "apple banana"), (2, "apple durian")], ["doc_id", "text"]
    )
    vocab = spark.createDataFrame(
        [("apple", 1), ("banana", 2)], ["token", "token_id"]
    )
    out = corpus.encode_with_vocab(docs, vocab).toPandas().set_index("doc_id")
    assert out.loc[1, "token_ids"] == "1,2" and out.loc[1, "n_oov"] == 0
    # durian is OOV -> id 0
    assert out.loc[2, "token_ids"] == "1,0" and out.loc[2, "n_oov"] == 1
    assert (out.n_tokens == 2).all()


def test_pack_chunks_offsets_and_bins(spark):
    from datapipeline_gcp_spark.functions import corpus

    chunks = spark.createDataFrame(
        [(1, 0, 64), (1, 1, 64), (1, 2, 10), (2, 0, 30)],
        ["doc_id", "chunk_idx", "chunk_tokens"],
    )
    out = corpus.pack_chunks(chunks, budget=100, shards=1).toPandas()
    out = out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    # single shard: offsets are the running total in (doc_id, chunk_idx) order
    assert list(out.offset_in_shard) == [0, 64, 128, 138]
    assert list(out.bin_id) == [0, 0, 1, 1]
    assert (out.shard == 0).all()


def test_pack_chunks_shard_locality(spark):
    from datapipeline_gcp_spark.functions import corpus

    chunks = spark.createDataFrame(
        [(d, i, 50) for d in range(20) for i in range(3)],
        ["doc_id", "chunk_idx", "chunk_tokens"],
    )
    out = corpus.pack_chunks(chunks, budget=120, shards=4).toPandas()
    # a document's chunks all land in one shard, in order
    for d, grp in out.groupby("doc_id"):
        assert grp.shard.nunique() == 1
        g = grp.sort_values("chunk_idx")
        assert list(g.offset_in_shard) == sorted(g.offset_in_shard)
    # offsets within a shard are gapless (each chunk is 50 tokens)
    for s, grp in out.groupby("shard"):
        assert sorted(grp.offset_in_shard) == [50 * i for i in range(len(grp))]


def test_verified_pairs_subset_of_candidates_with_true_jaccard(spark):
    from datapipeline_gcp_spark.functions import dedup

    pairs = dedup.dedup_verified(spark, SF_SMOKE).toPandas()
    # exact copies: jaccard exactly 1.0 and full signature agreement
    exact = pairs[(pairs.doc_b - pairs.doc_a == 500_000) & (pairs.doc_a < 500_000)]
    assert len(exact) > 0
    assert (exact.jaccard == 1.0).all() and (exact.sig_match_frac == 1.0).all()
    # every surviving pair really clears the verify threshold
    assert (pairs.jaccard >= 0.5).all()


def test_scd1_upsert_semantics(spark):
    from datapipeline_gcp_spark.operators import maintenance

    cur = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["k", "name", "bal"]
    )
    upd = spark.createDataFrame(
        [(2, "b2", 25.0), (3, "c", 30.0)], ["k", "name", "bal"]
    )
    out = maintenance.scd1_upsert(cur, upd, ["k"]).toPandas().set_index("k")
    assert out.loc[1, "op"] == "keep" and out.loc[1, "name"] == "a"
    assert out.loc[2, "op"] == "update" and out.loc[2, "name"] == "b2"
    assert out.loc[3, "op"] == "insert" and out.loc[3, "bal"] == 30.0
    assert len(out) == 3  # key-distinct union


def test_scd2_history_versions(spark):
    from datapipeline_gcp_spark.operators import maintenance

    cur = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["k", "name", "bal"]
    )
    upd = spark.createDataFrame([(2, "b2", 25.0)], ["k", "name", "bal"])
    out = maintenance.scd2_history(cur, upd, ["k"]).toPandas()
    k2 = out[out.k == 2].sort_values("is_current")
    # updated key: one closed version (old values) + one open (new values)
    assert len(k2) == 2
    closed, opened = k2.iloc[0], k2.iloc[1]
    assert closed["name"] == "b"
    assert closed["is_current"] == 0 and closed["valid_to"] is not None
    assert opened["name"] == "b2" and opened["is_current"] == 1
    # untouched key: single open version
    k1 = out[out.k == 1]
    assert len(k1) == 1 and k1.iloc[0]["is_current"] == 1


def test_quantize_int8_bounds_and_reconstruction(spark):
    from datapipeline_gcp_spark.functions import similarity

    emb = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    out = similarity.quantize_int8(emb).toPandas().set_index("vec_id")
    q1 = [int(v) for v in out.loc[1, "q_csv"].split(",")]
    # max-magnitude element maps to ±127; all within range
    assert q1[1] == -127 and all(-127 <= v <= 127 for v in q1)
    # 0.5 = half of amax -> 63.5 rounds away from zero to 64
    assert q1[0] == 64
    # per-dim reconstruction error bounded by scale/2
    scale = out.loc[1, "scale"]
    assert out.loc[1, "recon_rmse"] <= scale / 2 + 1e-12
    # zero vector: all zeros, zero scale, zero error
    assert out.loc[2, "q_csv"] == "0,0,0,0"
    assert out.loc[2, "scale"] == 0.0 and out.loc[2, "recon_rmse"] == 0.0


def test_unigram_logprob_rare_tokens_score_higher(spark):
    from datapipeline_gcp_spark.functions import corpus

    common = "the cat sat on the mat"
    docs = spark.createDataFrame(
        [(i, common) for i in range(9)] + [(9, "zyx wvu tsr qpo nml kji")],
        ["doc_id", "text"],
    )
    out = corpus.unigram_logprob(docs).toPandas().set_index("doc_id")
    # the all-rare doc must score strictly above every common doc
    assert out.loc[9, "avg_neg_logprob"] > out.drop(9).avg_neg_logprob.max()
    assert (out.n_terms == 6).all()


def test_datacard_rollup_totals_consistent(spark):
    from datapipeline_gcp_spark.functions import corpus
    from tests.conftest import SF_SMOKE

    card = corpus.corpus_datacard(spark, SF_SMOKE).toPandas()
    grand = card[(card.g_lang == 1) & (card.g_source == 1)]
    leaves = card[(card.g_lang == 0) & (card.g_source == 0)]
    assert len(grand) == 1
    assert grand.iloc[0].n_docs == leaves.n_docs.sum()
    assert grand.iloc[0].total_tokens == leaves.total_tokens.sum()


def test_histogram_covers_all_events_and_bins_in_range(spark):
    from datapipeline_gcp_spark.operators import analytics
    from tests.conftest import SF_SMOKE

    hist = analytics.events_histogram(spark, SF_SMOKE).toPandas()
    ev_counts = (
        analytics.load_testdata(spark, SF_SMOKE, ("events",))["events"]
        .groupBy("event_type")
        .count()
        .toPandas()
        .set_index("event_type")["count"]
    )
    for et, grp in hist.groupby("event_type"):
        assert grp.n_events.sum() == ev_counts[et]
        assert grp.bin.min() >= 0 and grp.bin.max() <= analytics.N_BINS - 1
        # the max element lands in the folded last bin
        assert analytics.N_BINS - 1 in set(grp.bin)


def test_fuzzy_match_pairs_distance_semantics(spark):
    from datapipeline_gcp_spark.operators import relational

    df = spark.createDataFrame(
        [
            (1, 1, "smith"),
            (1, 2, "smyth"),   # distance 1 from smith
            (1, 3, "smithee"), # distance 2 from smith
            (2, 4, "smith"),   # other block: never paired with block 1
        ],
        ["block", "id", "name"],
    )
    out = relational.fuzzy_match_pairs(
        df, ["block"], "id", "name", max_distance=1
    ).toPandas()
    assert set(zip(out.id_a, out.id_b)) == {(1, 2)}
    assert list(out.distance) == [1]
    # d=2 takes the block-quadratic fallback path and reaches smithee
    out2 = relational.fuzzy_match_pairs(
        df, ["block"], "id", "name", max_distance=2
    ).toPandas()
    got = {(a, b): d for a, b, d in zip(out2.id_a, out2.id_b, out2.distance)}
    assert got == {(1, 2): 1, (1, 3): 2}  # smyth->smithee is 3 edits


def test_repetition_flags_repeated_text(spark):
    from datapipeline_gcp_spark.functions import corpus

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),          # all grams identical
            (2, "one two three four five six seven"),      # no repeats
        ],
        ["doc_id", "text"],
    )
    out = corpus.repetition_metrics(docs).toPandas().set_index("doc_id")
    assert out.loc[1, "dup_gram_frac"] == 1.0
    assert out.loc[2, "dup_gram_frac"] == 0.0
    # 6 tokens -> 4 positional 3-grams; 7 tokens -> 5
    assert out.loc[1, "n_grams"] == 4 and out.loc[2, "n_grams"] == 5


def test_mixture_weights_sum_and_monotonicity(spark):
    """Weights sum to ~1; temperature scaling upweights small sources:
    a source with 4× the tokens gets <4× the weight (sqrt → exactly
    2×), and epochs are budget/weighted-tokens consistent."""
    from datapipeline_gcp_spark.functions import corpus

    df = spark.createDataFrame(
        [(0, "a", 400), (1, "b", 100)], ["doc_id", "source", "n_tokens"]
    )
    rows = {r["source"]: r for r in corpus.mixture_weights(df, budget=1000).collect()}
    assert abs(rows["a"]["weight"] + rows["b"]["weight"] - 1.0) < 1e-6
    # sqrt scaling: 400 vs 100 tokens → weight ratio exactly 2, not 4
    assert abs(rows["a"]["weight"] / rows["b"]["weight"] - 2.0) < 1e-6
    for r in rows.values():
        assert abs(r["epochs"] - r["weight"] * 1000 / r["n_tokens"]) < 1e-5


def test_shard_shuffle_partition_and_epoch_properties(spark):
    """Positions are 1..shard_size within each shard; the permutation is
    reproducible under repartitioning and CHANGES with the epoch."""
    from datapipeline_gcp_spark.functions import corpus

    df = spark.createDataFrame([(i,) for i in range(500)], ["doc_id"])
    a = corpus.shard_shuffle(df, n_shards=8).toPandas()
    b = corpus.shard_shuffle(df.repartition(7), n_shards=8).toPandas()
    assert sorted(map(tuple, a.values.tolist())) == sorted(
        map(tuple, b.values.tolist())
    )
    for _, grp in a.groupby("shard"):
        assert sorted(grp.pos) == list(range(1, len(grp) + 1))
    c = corpus.shard_shuffle(df, n_shards=8, epoch=8).toPandas()
    merged = a.merge(c, on="doc_id", suffixes=("_a", "_c"))
    assert (
        (merged.shard_a != merged.shard_c) | (merged.pos_a != merged.pos_c)
    ).any()


def test_ppl_buckets_cover_corpus_in_thirds(spark):
    """Every document lands in exactly one bucket and the three buckets
    are each roughly a third of the corpus (exact-percentile cuts)."""
    from datapipeline_gcp_spark.functions import corpus
    from tests.conftest import SF_CORRECTNESS

    out = corpus.corpus_ppl_buckets(spark, SF_CORRECTNESS).toPandas()
    n = len(out)
    sizes = out.bucket.value_counts()
    assert set(sizes.index) == {"head", "middle", "tail"}
    for b in ("head", "middle", "tail"):
        assert 0.2 < sizes[b] / n < 0.47, (b, sizes[b] / n)


def test_semantic_dedup_drops_planted_copies_only(spark):
    """SemDeDup: every dropped vector must be a planted copy (the
    natural corpus has no pair above τ=0.9), and cell-bounded recall on
    the planted copies stays ≥ 0.9."""
    out = similarity.dedup_semantic(spark, SF_SMOKE).toPandas()
    dropped = set(out.loc[~out.keep, "vec_id"])
    planted = set(out.loc[out.vec_id >= 100_000, "vec_id"])
    assert dropped, "no planted copy was dropped"
    assert dropped <= planted, f"false positives: {sorted(dropped - planted)[:5]}"
    assert len(dropped) / len(planted) >= 0.9


def test_semantic_dedup_keeps_the_lower_id_of_each_pair(spark):
    """The keep rule is keep-first-by-id: a planted copy's SOURCE
    (lower id) must never be dropped."""
    out = similarity.dedup_semantic(spark, SF_SMOKE).toPandas()
    sources = set(out.loc[~out.keep, "vec_id"] - 100_000)
    kept = set(out.loc[out.keep, "vec_id"])
    assert sources <= kept


def test_bm25_self_similar_docs_rank_first(spark):
    """A doc sharing most of a query doc's vocabulary must outrank
    docs sharing a stopword: check the top hit shares more terms than
    the bottom hit for every query."""
    from datapipeline_gcp_spark.functions.retrieval import retrieval_bm25_topk

    out = retrieval_bm25_topk(spark, SF_SMOKE).toPandas()
    assert (out.groupby("query_id")["rank"].min() == 1).all()
    for qid, grp in out.groupby("query_id"):
        g = grp.sort_values("rank")
        assert g.bm25.is_monotonic_decreasing
        assert g.n_terms.iloc[0] >= g.n_terms.iloc[-1] - 2  # top hit matches broadly


def test_kmeans_inertia_decreases_with_iterations(spark):
    """Lloyd's invariant: total inertia after 2 iterations ≤ after 1."""
    from datapipeline_gcp_spark.functions.kmeans import kmeans_clusters
    from datapipeline_gcp_spark.schemas import load_testdata

    emb = load_testdata(spark, SF_SMOKE, ("embeddings",))["embeddings"]
    i1 = kmeans_clusters(emb, n_iter=1).agg(F.sum("inertia")).first()[0]
    i2 = kmeans_clusters(emb, n_iter=2).agg(F.sum("inertia")).first()[0]
    n1 = kmeans_clusters(emb, n_iter=1).agg(F.sum("n_members")).first()[0]
    n2 = kmeans_clusters(emb, n_iter=2).agg(F.sum("n_members")).first()[0]
    assert n1 == n2  # every vector assigned in both runs
    assert i2 <= i1 + 1e-9


def test_hard_negatives_never_return_query_label(spark):
    out = similarity.mining_hard_negatives(spark, SF_SMOKE).toPandas()
    assert (out.query_label != out.neg_label).all()
    assert (out.groupby("query_id").size() == similarity.TOP_K).all()


def test_padding_waste_sorted_never_worse(spark):
    """Length-sorted batching must not pad more than arrival batching
    (same shards, same batch size — sorting only tightens batches)."""
    from datapipeline_gcp_spark.functions.corpus import corpus_padding_waste

    out = corpus_padding_waste(spark, SF_SMOKE).toPandas().set_index("strategy")
    assert out.loc["sorted", "padded_tokens"] <= out.loc["arrival", "padded_tokens"]
    assert out.loc["sorted", "total_tokens"] == out.loc["arrival", "total_tokens"]


def test_expectations_all_pass_on_clean_fixture(spark):
    """The driver fixture satisfies every constraint — violations must
    be exactly zero (a nonzero count means the check itself is wrong)."""
    from datapipeline_gcp_spark.operators.maintenance import table_expectations

    out = table_expectations(spark, SF_SMOKE).toPandas()
    assert len(out) == 5
    assert (out.n_violations == 0).all() and out.passed.all()


def test_ivf_cell_stats_cover_whole_corpus(spark):
    from datapipeline_gcp_spark.functions.similarity import ann_ivf_cell_stats

    out = ann_ivf_cell_stats(spark, SF_SMOKE).toPandas()
    assert abs(out.frac_corpus.sum() - 1.0) < 1e-9
    assert (out.avg_cos <= 1.0 + 1e-9).all()
    # every vector is somewhere: sum of members == corpus size
    n = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    assert out.n_members.sum() == n


def test_training_manifest_provenance_is_complete(spark):
    """Every train-split doc with ≥1 token appears in the manifest, and
    offsets within a shard are gapless."""
    from datapipeline_gcp_spark.functions.corpus import corpus_training_manifest

    out = corpus_training_manifest(spark, SF_SMOKE).toPandas()
    for _, g in out.groupby("shard"):
        g = g.sort_values("offset_in_shard")
        expected = g.chunk_tokens.cumsum().shift(fill_value=0)
        assert (g.offset_in_shard.values == expected.values).all()


def test_active_users_monotonic_windows(spark):
    """DAU ≤ WAU ≤ MAU on every day; stickiness in (0, 1]."""
    from datapipeline_gcp_spark.operators.analytics import events_active_users

    out = events_active_users(spark, SF_SMOKE).toPandas()
    assert (out.dau <= out.wau).all() and (out.wau <= out.mau).all()
    assert ((out.stickiness > 0) & (out.stickiness <= 1)).all()


def test_markov_rows_are_distributions(spark):
    from datapipeline_gcp_spark.operators.analytics import (
        events_markov_transitions,
    )

    out = events_markov_transitions(spark, SF_SMOKE).toPandas()
    sums = out.groupby("event_type").p.sum()
    assert ((sums - 1.0).abs() < 1e-6).all()


def test_priority_drift_shares_sum_to_one(spark):
    from datapipeline_gcp_spark.operators.analytics import (
        orders_priority_drift,
    )

    out = orders_priority_drift(spark, SF_SMOKE).toPandas()
    sums = out.groupby("month").share.sum()
    assert ((sums - 1.0).abs() < 1e-6).all()
    base = out.groupby("o_orderpriority").baseline.first().sum()
    assert abs(base - 1.0) < 1e-6


def test_phash_groups_contain_planted_copies(spark):
    """Every planted copy (id ≥ 3M) must share its hash group with its
    source, and keep-first always keeps the source."""
    from datapipeline_gcp_spark.functions.multimodal import (
        multimodal_phash_dedup,
    )

    out = multimodal_phash_dedup(spark, SF_SMOKE).toPandas()
    planted = out[out.asset_id >= 3_000_000]
    assert len(planted) > 0
    assert (planted.n_same >= 2).all()
    assert (~planted.keep).all()  # the lower-id source wins
