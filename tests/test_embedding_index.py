"""Persisted embedding sign-LSH index: hyperplane-sign once per vector,
find near-dups of each new ingest batch in O(batch) — the vector analog
of the MinHash index artifact (tests mirror test_minhash_index.py).

Correctness contract verified here: incremental verified pairs over
(index ∪ batch) == the one-shot embedding_neardup_lsh pipeline over ALL
vectors, restricted to pairs involving the batch — including sims and
the hot-bucket cap, which the incremental path applies over UNION bucket
sizes (matched index rows + batch rows == the full-pipeline bucket size
for every bucket the batch touches).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdcrypt.operators.similarity import (
    EmbeddingLSHIndex,
    EmbeddingLSHIndexError,
    append_to_embedding_lsh_index,
    build_embedding_lsh_index,
    embedding_candidates_incremental,
    embedding_neardup_lsh,
)

DIM = 8


def _corpus(spark, n_clusters=6, per_cluster=10, dim=DIM, seed=9):
    """Clusters of near-identical vectors (base + small noise) — planted
    near-dups with known ground truth, ids interleaved across clusters so
    even/odd and mod-3 splits cut through every cluster."""
    rng = np.random.default_rng(seed)
    bases = []
    for _ in range(n_clusters):
        b = rng.standard_normal(dim)
        bases.append(b / np.linalg.norm(b))
    rows = []
    vid = 0
    for _ in range(per_cluster):
        for c in range(n_clusters):
            v = bases[c] + rng.standard_normal(dim) * 0.02
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _pairs(df):
    return {(r["id_a"], r["id_b"]): r["sim"] for r in df.collect()}


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "embidx")


def test_incremental_equals_full_pipeline_filtered(spark, root):
    emb = _corpus(spark)
    old = emb.where("vec_id % 2 = 0")
    new = emb.where("vec_id % 2 = 1")
    build_embedding_lsh_index(old, root)
    inc = embedding_candidates_incremental(spark, root, new,
                                           threshold=0.98,
                                           max_bucket_size=64)
    full = embedding_neardup_lsh(emb, threshold=0.98,
                                 max_bucket_size=64).where(
        "id_a % 2 = 1 OR id_b % 2 = 1")
    assert _pairs(inc) == _pairs(full)
    assert len(_pairs(inc)) > 0


def test_append_then_incremental(spark, root):
    emb = _corpus(spark)
    build_embedding_lsh_index(emb.where("vec_id % 3 = 0"), root)
    idx = append_to_embedding_lsh_index(root, emb.where("vec_id % 3 = 1"))
    assert idx.meta["appends"] == 1
    inc = embedding_candidates_incremental(spark, idx,
                                           emb.where("vec_id % 3 = 2"),
                                           threshold=0.98,
                                           max_bucket_size=64)
    full = embedding_neardup_lsh(emb, threshold=0.98,
                                 max_bucket_size=64).where(
        "id_a % 3 = 2 OR id_b % 3 = 2")
    assert _pairs(inc) == _pairs(full)


def test_hot_bucket_cap_counts_over_union(spark, root):
    """Each side alone is under the cap; the UNION bucket is over it and
    must be dropped — only the genuinely-unique pair survives."""
    rng = np.random.default_rng(3)
    boiler = rng.standard_normal(DIM)
    boiler /= np.linalg.norm(boiler)
    other = rng.standard_normal(DIM)
    other /= np.linalg.norm(other)
    mk = lambda b: [float(x) for x in  # noqa: E731
                    (b + rng.standard_normal(DIM) * 1e-3)]
    old = spark.createDataFrame(
        [(i, mk(boiler)) for i in range(40)] + [(1000, mk(other))],
        "vec_id long, embedding array<double>")
    new = spark.createDataFrame(
        [(2000 + i, mk(boiler)) for i in range(40)] + [(3000, mk(other))],
        "vec_id long, embedding array<double>")
    build_embedding_lsh_index(old, root)
    inc = embedding_candidates_incremental(spark, root, new,
                                           threshold=0.98,
                                           max_bucket_size=64)
    assert set(_pairs(inc)) == {(1000, 3000)}
    # sanity: uncapped, the boilerplate mega-cluster floods the result
    flood = embedding_candidates_incremental(spark, root, new,
                                             threshold=0.98)
    assert flood.count() > 1000


def test_index_side_joins_by_broadcast_not_shuffle(spark, root):
    emb = _corpus(spark)
    build_embedding_lsh_index(emb.where("vec_id < 30"), root)
    inc = embedding_candidates_incremental(spark, root,
                                           emb.where("vec_id >= 30"),
                                           threshold=0.98)
    plan = inc._jdf.queryExecution().executedPlan().toString()
    # the corpus's tagged AND vector components must meet the batch via
    # broadcast hash joins — an index-side shuffle makes ticks O(corpus)
    assert "BroadcastHashJoin" in plan


def test_reopen_and_layout(spark, root):
    emb = _corpus(spark, n_clusters=3, per_cluster=10)
    build_embedding_lsh_index(emb, root, n_bands=4, n_partitions=8)
    idx = EmbeddingLSHIndex(root)   # reopen purely from disk
    assert idx.meta["format"] == "cdcrypt-emblsh/1"
    tagged = idx.read_tagged(spark)
    assert tagged.count() == 30 * 4
    assert set(tagged.columns) == {"vec_id", "band", "bucket", "bpart"}
    # bpart really is the stored partition key (file-level pruning works)
    one = tagged.where("bpart = 3")
    want = tagged.where(
        F.pmod(F.col("band").cast("long") * F.lit(256) + F.col("bucket"),
               F.lit(8)).cast("int") == 3)
    assert one.count() == want.count()
    # exactly one vector copy per id, spread by xxhash64
    vecs = idx.read_vectors(spark)
    assert vecs.count() == 30
    assert set(vecs.columns) == {"vec_id", "embedding", "vpart"}


def test_blas_method_roundtrips(spark, root):
    emb = _corpus(spark)
    build_embedding_lsh_index(emb.where("vec_id % 2 = 0"), root,
                              method="blas")
    inc = embedding_candidates_incremental(
        spark, root, emb.where("vec_id % 2 = 1"), threshold=0.98)
    full = embedding_neardup_lsh(emb, threshold=0.98,
                                 method="blas").where(
        "id_a % 2 = 1 OR id_b % 2 = 1")
    assert _pairs(inc) == _pairs(full)


def test_ann_topk_indexed_matches_exact_on_planted_clusters(spark, root):
    """Same artifact, second query type: multi-band OR probing + exact
    cosine rank. On the planted clusters (near-identical vectors agree on
    almost every hyperplane) the indexed top-k equals brute force."""
    from cdcrypt.operators.similarity import ann_lsh_topk_indexed, cosine_topk
    emb = _corpus(spark)
    build_embedding_lsh_index(emb, root)
    q = emb.where("vec_id < 5")
    exact = {(r.query_id, r.rank): (r.neighbor_id, r.sim)
             for r in cosine_topk(emb, q, k=3).collect()}
    got = {(r.query_id, r.rank): (r.neighbor_id, r.sim)
           for r in ann_lsh_topk_indexed(spark, root, q, k=3).collect()}
    assert got == exact
    assert len(got) == 15  # 5 queries x 3


def test_ann_topk_indexed_sees_appended_vectors(spark, root, tmp_path):
    """Build-on-half + append == build-on-all for the ANN query path."""
    from cdcrypt.operators.similarity import ann_lsh_topk_indexed
    emb = _corpus(spark)
    full_root = str(tmp_path / "full")
    build_embedding_lsh_index(emb, full_root)
    build_embedding_lsh_index(emb.where("vec_id % 2 = 0"), root)
    append_to_embedding_lsh_index(root, emb.where("vec_id % 2 = 1"))
    q = emb.where("vec_id < 5")

    def key(df):
        return {(r.query_id, r.rank): (r.neighbor_id, r.sim)
                for r in df.collect()}

    assert key(ann_lsh_topk_indexed(spark, root, q, k=3)) == \
        key(ann_lsh_topk_indexed(spark, full_root, q, k=3))


def test_not_an_index_raises(tmp_path):
    with pytest.raises(EmbeddingLSHIndexError):
        EmbeddingLSHIndex(str(tmp_path / "nope"))


def test_empty_build_without_dim_is_a_clear_error(spark, root):
    emb = _corpus(spark).where("vec_id < 0")
    with pytest.raises(ValueError, match="pass dim explicitly"):
        build_embedding_lsh_index(emb, root)


def test_verify_lookup_is_candidate_filtered_on_both_sides(spark, root):
    """Both sides of the verify lookup must be candidate-filtered (the
    batch side semi-joins on candidate ids before the broadcast union —
    without it a corpus-sized catch-up batch ships every vector to every
    executor twice). Structural check: every leaf feeding the broadcast
    lookup joins against the candidate-id set, so the join count exceeds
    the unfiltered shape's by one."""
    emb = _corpus(spark)
    build_embedding_lsh_index(emb.where("vec_id % 2 = 0"), root)
    inc = embedding_candidates_incremental(spark, root,
                                           emb.where("vec_id % 2 = 1"),
                                           threshold=0.98)
    plan = inc._jdf.queryExecution().optimizedPlan().toString()
    # probe, cap-window self-join pair, corpus-vec fetch, BATCH-vec fetch,
    # and the two id_a/id_b lookups: the batch fetch is the one the fix
    # added — 6 joins in the optimized plan, 5 in the unfiltered shape
    assert plan.count("Join ") >= 6
    # degenerate batch (zero candidates) stays empty without error
    none = embedding_candidates_incremental(
        spark, root, emb.where("vec_id % 2 = 1"), threshold=1.000001)
    assert none.count() == 0


def test_streamed_ticks_equal_one_shot_pipeline(spark, root):
    """Feed the corpus through 3 ingest ticks; the union of per-tick
    verified pairs must equal the one-shot pipeline over the full corpus
    (uncapped — per-tick caps are AS-OF semantics, see docstring)."""
    from cdcrypt.operators.similarity import embedding_dedup_tick

    emb = _corpus(spark)
    build_embedding_lsh_index(emb.where("vec_id < 0"), root,
                              dim=DIM)  # empty index: dim can't be probed
    got = {}
    for tick in range(3):
        pairs = embedding_dedup_tick(spark, root,
                                     emb.where(f"vec_id % 3 = {tick}"),
                                     threshold=0.98)
        for (a, b), s in _pairs(pairs).items():
            assert (a, b) not in got, "pair emitted twice across ticks"
            got[(a, b)] = s
    want = _pairs(embedding_neardup_lsh(emb, threshold=0.98))
    assert got == want
    assert EmbeddingLSHIndex(root).meta["appends"] == 3


def test_conditional_broadcast_falls_back_above_candidate_budget(spark, root):
    """ADVICE r3: the candidate-proportional vector lookups must not FORCE
    broadcast when the estimated candidate count is huge — a degenerate hot
    bucket then degrades to shuffle joins instead of a broadcast OOM. With
    a zero budget the fallback engages and results are identical."""
    from cdcrypt.operators.similarity import ann_lsh_topk_indexed
    emb = _corpus(spark)
    build_embedding_lsh_index(emb.where("vec_id % 2 = 0"), root)
    batch = emb.where("vec_id % 2 = 1")

    inc = embedding_candidates_incremental(spark, root, batch,
                                           threshold=0.98)
    fb = embedding_candidates_incremental(spark, root, batch,
                                          threshold=0.98,
                                          broadcast_max_candidates=0)
    assert _pairs(fb) == _pairs(inc)
    # and the ANN query type over the same artifact
    q = emb.where("vec_id < 5")
    a = {(r.query_id, r.rank): (r.neighbor_id, r.sim)
         for r in ann_lsh_topk_indexed(spark, root, q, k=3).collect()}
    b = {(r.query_id, r.rank): (r.neighbor_id, r.sim)
         for r in ann_lsh_topk_indexed(spark, root, q, k=3,
                                       broadcast_max_candidates=0).collect()}
    assert a == b
    # opting out of the estimate job entirely keeps the broadcast hints
    off = embedding_candidates_incremental(spark, root, batch,
                                           threshold=0.98,
                                           broadcast_max_candidates=None)
    assert _pairs(off) == _pairs(inc)
