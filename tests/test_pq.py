"""Product quantization (operators/similarity.py): codebook
training, encoding, and ADC top-k search."""

from __future__ import annotations

import numpy as np
import pytest

from serverless_data_lake_spark.operators.similarity import (
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)


def _clustered_corpus(spark, n_clusters=6, per=30, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 4.0
    rows = []
    for i in range(n_clusters * per):
        c = centers[i % n_clusters]
        v = c + 0.15 * rng.randn(dim)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), rows


def test_train_shapes_and_determinism(spark):
    df, _ = _clustered_corpus(spark)
    b1 = train_pq_codebooks(df, "embedding", dim=16, m=4, k=8)
    b2 = train_pq_codebooks(df, "embedding", dim=16, m=4, k=8)
    assert b1.shape == (4, 8, 4)
    np.testing.assert_array_equal(b1, b2)  # seeded + lexsorted sample


def test_train_rejects_bad_params(spark):
    df, _ = _clustered_corpus(spark)
    with pytest.raises(ValueError, match="divisible"):
        train_pq_codebooks(df, "embedding", dim=16, m=5)
    with pytest.raises(ValueError, match="one byte"):
        train_pq_codebooks(df, "embedding", dim=16, m=4, k=1000)


def test_encode_matches_local_argmin(spark):
    df, rows = _clustered_corpus(spark)
    books = train_pq_codebooks(df, "embedding", dim=16, m=4, k=8)
    got = {r.vec_id: list(r.codes) for r in pq_encode(df, "vec_id", "embedding", books).collect()}
    sub = 4
    for i, v in rows[:40]:
        v = np.asarray(v)
        for j in range(4):
            x = v[j * sub : (j + 1) * sub]
            expect = ((books[j] - x) ** 2).sum(-1).argmin()
            assert got[i][j] == expect


def test_adc_topk_recovers_cluster_neighbors(spark):
    """On clustered data the ADC top-k must retrieve same-cluster
    vectors: every query's top-5 (excluding itself at rank 1) shares
    the query's cluster."""
    df, rows = _clustered_corpus(spark)
    books = train_pq_codebooks(df, "embedding", dim=16, m=4, k=16)
    codes = pq_encode(df, "vec_id", "embedding", books)
    queries = spark.createDataFrame(
        [(i, v) for i, v in rows[:4]],
        "query_id long, embedding array<double>",
    )
    out = pq_topk(codes, queries, books, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.approx_sq_dist))
    assert set(by_q) == {0, 1, 2, 3}
    for qid, hits in by_q.items():
        hits.sort()
        assert len(hits) == 5
        # rank 1 is the query itself (distance ~quantization error)
        assert hits[0][1] == qid
        # all hits come from the query's cluster (cluster = id % 6)
        assert all(h[1] % 6 == qid % 6 for h in hits)
        # distances non-decreasing with rank
        ds = [h[2] for h in hits]
        assert ds == sorted(ds)


def test_topk_query_cap_and_id_type(spark, monkeypatch):
    """(r8, VERDICT #5 + ADVICE) the driver-collect of the query side
    is gated at PQ_QUERY_CAP with a loud error, and the query-id type
    is introspected (string ids round-trip, not hardcoded long)."""
    from serverless_data_lake_spark.operators import similarity as sim

    df, rows = _clustered_corpus(spark)
    books = train_pq_codebooks(df, "embedding", dim=16, m=4, k=8)
    codes = pq_encode(df, "vec_id", "embedding", books)

    queries = spark.createDataFrame(
        [(f"q{i}", v) for i, v in rows[:3]],
        "query_id string, embedding array<double>",
    )
    out = pq_topk(codes, queries, books, k=2)
    assert dict(out.dtypes)["query_id"] == "string"
    got = {r.query_id for r in out.collect()}
    assert got == {"q0", "q1", "q2"}

    monkeypatch.setattr(sim, "PQ_QUERY_CAP", 2)
    with pytest.raises(ValueError, match="PQ_QUERY_CAP"):
        pq_topk(codes, queries, books, k=2)


def test_topk_local_cut_matches_full_ranking(spark):
    """The partition-local lexsort cut must be invisible in the
    result: top-k over single-partition codes (no cut can help) ==
    top-k over the same codes split across many partitions."""
    df, rows = _clustered_corpus(spark)
    books = train_pq_codebooks(df, "embedding", dim=16, m=4, k=16)
    codes = pq_encode(df, "vec_id", "embedding", books)
    queries = spark.createDataFrame(
        [(i, v) for i, v in rows[:3]],
        "query_id long, embedding array<double>",
    )
    one = pq_topk(codes.coalesce(1), queries, books, k=7).collect()
    many = pq_topk(codes.repartition(16), queries, books, k=7).collect()
    canon = lambda res: sorted(  # noqa: E731
        (r.query_id, r.rank, r.vec_id, round(r.approx_sq_dist, 9))
        for r in res
    )
    assert canon(one) == canon(many)


def test_compression_ratio(spark):
    """The stored representation is m small ints per vector —
    16 doubles (128 B) -> 4 codes (the at-rest point of PQ)."""
    df, _ = _clustered_corpus(spark)
    books = train_pq_codebooks(df, "embedding", dim=16, m=4, k=8)
    enc = pq_encode(df, "vec_id", "embedding", books)
    row = enc.first()
    assert len(row.codes) == 4
    assert dict(enc.dtypes)["codes"] == "array<smallint>"


def test_topk_query_blocking_invisible(spark, monkeypatch):
    """The r9 query-block memory bound (dist matrix kept under
    KERNEL_BLOCK_ENTRIES) must be invisible in the result: forcing
    one-query blocks produces exactly the unblocked output."""
    import serverless_data_lake_spark.operators.similarity as sim

    df, rows = _clustered_corpus(spark)
    books = train_pq_codebooks(df, "embedding", dim=16, m=4, k=16)
    codes = pq_encode(df, "vec_id", "embedding", books)
    queries = spark.createDataFrame(
        [(i, v) for i, v in rows[:5]],
        "query_id long, embedding array<double>",
    )
    canon = lambda res: sorted(  # noqa: E731
        (r.query_id, r.rank, r.vec_id, round(r.approx_sq_dist, 9))
        for r in res
    )
    unblocked = canon(pq_topk(codes, queries, books, k=4).collect())
    monkeypatch.setattr(sim, "KERNEL_BLOCK_ENTRIES", 1)
    blocked = canon(pq_topk(codes, queries, books, k=4).collect())
    assert blocked == unblocked


def test_all_pairs_row_blocking_invisible(spark, monkeypatch):
    """Same for the all-pairs kernel's left-row blocks: one-row
    blocks == unblocked pair set, bit-identical cosines."""
    import serverless_data_lake_spark.operators.similarity as sim
    from serverless_data_lake_spark.operators.similarity import (
        embedding_all_pairs_numpy,
    )

    df, _ = _clustered_corpus(spark)
    canon = lambda res: sorted(  # noqa: E731
        (r.id_a, r.id_b, r.cosine) for r in res
    )
    unblocked = canon(
        embedding_all_pairs_numpy(df, threshold=0.2).collect()
    )
    monkeypatch.setattr(sim, "KERNEL_BLOCK_ENTRIES", 1)
    blocked = canon(
        embedding_all_pairs_numpy(df, threshold=0.2).collect()
    )
    assert blocked == unblocked and len(unblocked) > 0


def test_topk_precollected_query_rows_identical(spark):
    """The ``query_rows`` fast path (r11 — serving layers that hold
    their query batch driver-side skip the in-call collect) must
    produce byte-identical output to the default collect path, and
    the query cap must apply to pre-collected rows too."""
    from serverless_data_lake_spark.operators import similarity as sim

    df, rows = _clustered_corpus(spark)
    books = train_pq_codebooks(df, "embedding", dim=16, m=4, k=8)
    codes = pq_encode(df, "vec_id", "embedding", books)
    q = df.filter("vec_id < 4").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    qrows = q.collect()
    a = sorted(map(tuple, pq_topk(codes, q, books, k=5).collect()))
    b = sorted(
        map(
            tuple,
            pq_topk(codes, q, books, k=5, query_rows=qrows).collect(),
        )
    )
    assert a == b
    with pytest.raises(ValueError, match="PQ_QUERY_CAP"):
        pq_topk(
            codes, q, books, k=5,
            query_rows=[(i, [0.0] * 16) for i in range(sim.PQ_QUERY_CAP + 1)],
        )


def test_ivf_precollected_query_rows_identical(spark):
    from serverless_data_lake_spark.operators.similarity import (
        ivf_topk,
        train_ivf_centroids,
    )

    df, _rows = _clustered_corpus(spark)
    cents = train_ivf_centroids(df, "embedding", nlist=4)
    q = df.filter("vec_id < 4").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    qrows = q.collect()
    a = sorted(
        map(
            tuple,
            ivf_topk(df, q, dim=16, k=5, nlist=4, nprobe=2,
                     centroids=cents).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            ivf_topk(df, q, dim=16, k=5, nlist=4, nprobe=2,
                     centroids=cents, query_rows=qrows).collect(),
        )
    )
    assert a == b
