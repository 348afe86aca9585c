"""Training-data operators: document dedup family, similarity search,
text analysis, multimodal plumbing (SURVEY-adjacent ops the engine adds
for large-scale pipeline use)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdcrypt.functions.text import text_stats
from cdcrypt.operators.docdedup import (
    exact_dedup,
    exact_dedup_groups,
    minhash_lsh_candidates,
    ngram_jaccard,
    simhash64,
    simhash_dup_groups,
)
from cdcrypt.operators.multimodal import attach_fake_media, extract_media_features
from cdcrypt.operators.similarity import ann_lsh_topk, cosine_topk

BASE = "the quick brown fox jumps over the lazy dog and runs far away " * 4


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE, "en"),
        (1, BASE, "en"),                      # exact duplicate of 0
        (2, BASE.replace("lazy", "sleepy"), "en"),  # near-duplicate of 0
        (3, "completely different text about spark engines and parquet files "
            "partitioned by bucket for scalable merge upserts " * 3, "en"),
        (4, "日本語のドキュメントです。テスト用のテキスト。", "ja"),
        (5, None, None),                      # null text
        (6, "", "en"),                        # empty text
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_exact_dedup(docs):
    groups = exact_dedup_groups(docs)
    dup = [r for r in groups.collect() if r["n_copies"] > 1]
    assert len(dup) == 1 and dup[0]["keep_id"] == 0 and dup[0]["n_copies"] == 2
    kept = exact_dedup(docs)
    ids = {r["doc_id"] for r in kept.collect()}
    assert 1 not in ids and 0 in ids and 2 in ids  # near-dup survives exact


def test_minhash_lsh_finds_near_dup(docs):
    pairs = {(r["id_a"], r["id_b"]): r["n_shared_bands"]
             for r in minhash_lsh_candidates(docs).collect()}
    assert (0, 1) in pairs  # exact dup: all bands shared
    assert pairs[(0, 1)] == 8
    assert (0, 2) in pairs  # near dup: some bands shared
    assert (0, 3) not in pairs  # unrelated text: no candidate


def test_ngram_jaccard_verify_stage(docs, spark):
    pairs = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], ["id_a", "id_b"])
    j = {(r["id_a"], r["id_b"]): r["jaccard"]
         for r in ngram_jaccard(docs, pairs).collect()}
    assert j[(0, 1)] == 1.0
    assert 0.25 < j[(0, 2)] < 1.0
    assert j[(0, 3)] < 0.05


def test_simhash_clusters_exact_dups(docs):
    fps = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert fps[0] == fps[1]  # identical text -> identical fingerprint
    assert fps[0] != fps[3]
    groups = simhash_dup_groups(docs).collect()
    assert any(g["keep_id"] == 0 and g["n_docs"] >= 2 for g in groups)


def test_text_stats_shapes(docs):
    out = {r["doc_id"]: r for r in text_stats(docs).collect()}
    assert out[0]["lang_guess"] == "en"
    assert out[4]["lang_guess"] == "cjk"
    assert out[0]["n_tokens"] > 40
    assert out[6]["n_tokens"] == 0  # empty string
    assert out[5]["n_chars"] is None  # null passthrough
    assert out[0]["fp64"] == out[1]["fp64"]  # fingerprint matches dup


def test_cosine_topk_self_similarity(spark):
    import numpy as np
    rng = np.random.default_rng(5)
    vecs = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(20)]
    vecs.append((20, vecs[0][1]))  # duplicate vector of id 0
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    top = cosine_topk(emb, emb.where("vec_id = 0"), k=3)
    rows = sorted(top.collect(), key=lambda r: r["rank"])
    assert rows[0]["neighbor_id"] == 20 and rows[0]["sim"] == 1.0
    assert len(rows) == 3 and [r["rank"] for r in rows] == [1, 2, 3]


def test_ann_lsh_recalls_identical_vector(spark):
    import numpy as np
    rng = np.random.default_rng(6)
    vecs = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(50)]
    vecs.append((50, vecs[0][1]))
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    # identical vectors share every LSH bucket -> always candidates
    top = ann_lsh_topk(emb, emb.where("vec_id = 0"), k=3, n_bits=4)
    rows = sorted(top.collect(), key=lambda r: r["rank"])
    assert rows and rows[0]["neighbor_id"] == 50 and rows[0]["sim"] == 1.0


def test_multimodal_feature_extraction(docs):
    media = attach_fake_media(docs.where(F.col("text").isNotNull()))
    feats = {r["doc_id"]: r for r in extract_media_features(media).collect()}
    assert feats[0]["media_type"] == "image/png" and feats[0]["n_frames"] == 1
    assert feats[4]["media_type"] == "audio/wav"
    assert feats[0]["byte_len"] == len(BASE.encode())
    assert len(feats[0]["features"]) == 4
    # deterministic: identical bytes -> identical features
    assert feats[0]["features"] == feats[1]["features"]
    assert feats[6]["n_frames"] == 1 and feats[6]["byte_len"] == 0
