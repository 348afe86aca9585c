"""Vector compression (operators/pq.py): SQ8 encode bounds and ADC
ranking vs brute force, PQ exactness on codebook points, recall floor on
clustered data, determinism, and the m-bytes storage claim."""

from __future__ import annotations

import random

import pytest

from cdcrypt.operators.pq import (
    pq_encode,
    pq_topk,
    sq_encode,
    sq_topk,
    sq_train,
    train_pq,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _random_corpus(n, dim, seed=3):
    rng = random.Random(seed)
    return [(i, [rng.uniform(-1, 1) for _ in range(dim)])
            for i in range(n)]


def _brute_topk(rows, qids, k):
    want = {}
    by_id = dict(rows)
    for qi in qids:
        q = by_id[qi]
        scored = sorted(
            ((sum((a - b) ** 2 for a, b in zip(q, v)), i)
             for i, v in rows if i != qi))
        want[qi] = [i for _, i in scored[:k]]
    return want


def test_sq_codes_bounded_and_constant_dim(spark):
    rows = [(i, [float(i), 5.0, -i / 3.0]) for i in range(20)]
    df = _vecs(spark, rows)
    book = sq_train(df)
    assert book["hi"][1] == book["lo"][1] == 5.0
    codes = {r["vec_id"]: r["codes"]
             for r in sq_encode(df, book).collect()}
    for cid, cs in codes.items():
        assert all(0 <= c <= 255 for c in cs)
        assert cs[1] == 0  # constant dimension
    assert codes[0][0] == 0 and codes[19][0] == 255


def test_sq_topk_matches_brute_force_on_random_data(spark):
    # 8-bit grids on 16 dims: quantization error is far below the
    # inter-point spacing of 60 random vectors, so ADC ranking should
    # recover nearly the exact neighbor sets
    rows = _random_corpus(60, 16)
    df = _vecs(spark, rows)
    book = sq_train(df)
    codes = sq_encode(df, book)
    queries = df.where("vec_id < 5")
    got = {}
    for r in sq_topk(codes, queries, book, k=5).collect():
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    want = _brute_topk(rows, list(range(5)), 5)
    hits = sum(len(set(got[q]) & set(want[q])) for q in want)
    assert hits >= 0.8 * 5 * 5, (got, want)


def test_pq_exact_on_codebook_points(spark):
    # corpus vectors ARE (sub)centroid concatenations -> encode is
    # lossless, ADC distance == true squared L2, ranking exact
    rng = random.Random(5)
    m, dsub, k_cent = 2, 4, 8
    subcents = [[[rng.uniform(-1, 1) for _ in range(dsub)]
                 for _ in range(k_cent)] for _ in range(m)]
    rows = []
    for i in range(40):
        v = []
        for j in range(m):
            v.extend(subcents[j][rng.randrange(k_cent)])
        rows.append((i, v))
    df = _vecs(spark, rows)
    book = train_pq(df, m=m, nbits=3, seed=11, n_iter=40)
    codes = pq_encode(df, book)
    queries = df.where("vec_id < 4")
    got = {}
    for r in pq_topk(codes, queries, book, k=3).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["adc"]))
    by_id = dict(rows)
    for qi, lst in got.items():
        q = by_id[qi]
        for rank, ni, adc in lst:
            true = sum((a - b) ** 2 for a, b in zip(q, by_id[ni]))
            # ADC == true distance when vectors sit ON centroids the
            # trained codebook recovered (kmeans on 8 distinct points
            # with 8 centroids converges onto them)
            assert adc == pytest.approx(true, abs=1e-3)


def test_pq_recall_on_clustered_data(spark):
    rng = random.Random(9)
    centers = [[rng.uniform(-5, 5) for _ in range(16)] for _ in range(10)]
    rows = []
    for i in range(200):
        c = centers[i % 10]
        rows.append((i, [x + rng.gauss(0, 0.05) for x in c]))
    df = _vecs(spark, rows)
    book = train_pq(df, m=4, nbits=4, seed=3)
    codes = pq_encode(df, book)
    queries = df.where("vec_id < 5")
    got = {}
    for r in pq_topk(codes, queries, book, k=10).collect():
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    want = _brute_topk(rows, list(range(5)), 10)
    # cluster members are ~identical; PQ must put same-cluster points on top
    hits = sum(len(set(got[q]) & set(want[q])) for q in want)
    assert hits >= 0.6 * 5 * 10, (got, want)


def test_pq_codes_are_m_bytes_and_deterministic(spark):
    rows = _random_corpus(50, 8, seed=1)
    df = _vecs(spark, rows)
    b1 = train_pq(df, m=4, nbits=4, seed=2)
    b2 = train_pq(df, m=4, nbits=4, seed=2)
    assert b1.centroids == b2.centroids
    c1 = {r["vec_id"]: bytes(r["codes"])
          for r in pq_encode(df, b1).collect()}
    c2 = {r["vec_id"]: bytes(r["codes"])
          for r in pq_encode(df, b2).collect()}
    assert c1 == c2
    assert all(len(v) == 4 for v in c1.values())
    with pytest.raises(ValueError, match="divisible"):
        train_pq(df, m=3)


def test_ivfpq_recall_and_determinism(spark):
    rng = random.Random(17)
    centers = [[rng.uniform(-5, 5) for _ in range(16)] for _ in range(8)]
    rows = []
    for i in range(240):
        c = centers[i % 8]
        rows.append((i, [x + rng.gauss(0, 0.05) for x in c]))
    df = _vecs(spark, rows)
    from cdcrypt.operators.pq import ivfpq_topk
    got = {}
    for r in ivfpq_topk(df, df.where("vec_id < 5"), k=10, n_centroids=8,
                        n_probe=2, m=4, nbits=6, seed=4).collect():
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    want = _brute_topk(rows, list(range(5)), 10)
    hits = sum(len(set(got[q]) & set(want[q])) for q in want)
    # tight clusters: the query's own cell holds its true neighbors and
    # residual-PQ separates same-cell points
    assert hits >= 0.6 * 5 * 10, (got, want)
    again = {}
    for r in ivfpq_topk(df, df.where("vec_id < 5"), k=10, n_centroids=8,
                        n_probe=2, m=4, nbits=6, seed=4).collect():
        again.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert got == again
