"""The finite-vector boundary's NULL arms (ADVICE r8): a NULL embedding
or any NULL component counts as an absent vector in BOTH engines. The
driver fixtures plant NaN components (nanvalues variant) but never
NULLs, so pin the designed rule here with planted rows."""

from __future__ import annotations

import duckdb

from datapipeline_gcp_spark.functions.similarity import _D_FIN, finite_vectors

#: (vec_id, embedding, keep?)
_CASES = [
    (1, [1.0, 2.0], True),
    (2, None, False),  # NULL vector
    (3, [1.0, None], False),  # NULL component
    (4, [float("nan"), 2.0], False),  # NaN component
    (5, [float("inf"), 2.0], False),  # Inf component
    (6, [], True),  # empty vector is finite (no bad component)
]


def test_spark_and_duckdb_drop_identically(spark):
    df = spark.createDataFrame(
        [(i, e) for i, e, _ in _CASES], "vec_id long, embedding array<float>"
    )
    got = {r.vec_id for r in finite_vectors(df).collect()}
    want = {i for i, _, keep in _CASES if keep}
    assert got == want

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[])"
    )
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?)",
        [(i, e) for i, e, _ in _CASES],
    )
    oracle = {
        r[0]
        for r in con.execute(
            f"SELECT vec_id FROM embeddings WHERE {_D_FIN}"
        ).fetchall()
    }
    assert oracle == want


def test_differing_payload_duplicate_id_fails_the_gate_deterministically(spark):
    """ADVICE r9: the identity-dedup contract (duplicate vec_ids carry
    identical payloads) is enforced by the GATE, not by the engine —
    but the failure must be deterministic, not a flake that depends on
    which survivor dropDuplicates happens to keep. Plant the violating
    case: the engine keeps exactly ONE of the two differing rows
    (either one), the full-row-distinct oracle keeps BOTH, so the row
    counts diverge no matter the survivor."""
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (1, [9.0, 9.0]), (2, [3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    engine = finite_vectors(df).collect()
    assert len(engine) == 2  # one survivor for id 1, plus id 2
    assert {r.vec_id for r in engine} == {1, 2}

    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[])")
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?)",
        [(1, [1.0, 2.0]), (1, [9.0, 9.0]), (2, [3.0, 4.0])],
    )
    n_oracle = con.execute(
        "SELECT COUNT(*) FROM (SELECT DISTINCT * FROM embeddings) "
        f"WHERE {_D_FIN}"
    ).fetchone()[0]
    assert n_oracle == 3  # both differing payloads survive DISTINCT *
    assert n_oracle != len(engine)  # gate fails on rows, deterministically


def test_finite_vectors_names_the_missing_id_column(spark):
    """ADVICE r9: a frame without the identity column must fail with
    the dedup contract named in the message, not an AnalysisException
    from deep inside dropDuplicates."""
    import pytest

    df = spark.createDataFrame([([1.0, 2.0],)], "embedding array<float>")
    with pytest.raises(ValueError, match="vec_id"):
        finite_vectors(df)
