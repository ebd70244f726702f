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
