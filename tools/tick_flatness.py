"""Streaming tick-cost flatness evidence (VERDICT r4 item 6).

The persisted-index ticks (minhash_dedup_tick / embedding_dedup_tick)
claim O(batch) cost per tick regardless of corpus size — plan-argued
(broadcast probe of the batch's bucket keys; the corpus side is scanned
in place and never shuffled) but never measured. This tool measures it:
a CONSTANT-size batch is appended for 10 ticks while the indexed corpus
grows ~10x, and the per-tick wall is recorded. Flat wall (last/first
within the noise envelope of this shared host) is the evidence; a wall
growing with corpus size would falsify the O(batch) claim.

Usage: PYTHONPATH=/root/repo python tools/tick_flatness.py
Writes BENCH/tick_flatness_r05.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = ("spark window merge table column vector stream value data small "
         "join filter big group hash customer sort order slow line part "
         "fast row the agg key query a scan batch").split()

N_TICKS = 10
DOC_BATCH = 2_000     # constant per tick; corpus 2k -> 22k (11x)
VEC_BATCH = 1_500     # constant per tick; corpus 1.5k -> 16.5k (11x)
DIM = 64


def _docs(spark, start, n, seed):
    import numpy as np
    rng = np.random.default_rng(seed)
    lens = rng.integers(20, 89, n)
    rows = [(int(start + i),
             " ".join(rng.choice(VOCAB, size=int(lens[i]))))
            for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _vecs(spark, start, n, seed):
    import numpy as np
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, DIM))
    # ~10% planted near-dups of earlier rows IN the batch (small noise
    # keeps cosine > 0.99) so the candidate->exact-verify join carries
    # real mass every tick instead of trivially empty buckets
    n_dup = n // 10
    src = rng.integers(0, n - n_dup, n_dup)
    X[n - n_dup:] = X[src] + rng.standard_normal((n_dup, DIM)) * 0.01
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    rows = [(int(start + i), [float(x) for x in X[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _probe(sec=0.5):
    import hashlib
    h, t0, c = b"x" * 1024, time.monotonic(), 0
    while time.monotonic() - t0 < sec:
        for _ in range(200):
            h = hashlib.sha256(h).digest()
        c += 200
    return round(c / sec / 1e6, 3)


def main():
    from cdcrypt.operators.docdedup import (
        MinHashIndex, build_minhash_index, minhash_dedup_tick,
    )
    from cdcrypt.operators.similarity import (
        EmbeddingLSHIndex, build_embedding_lsh_index, embedding_dedup_tick,
    )
    from cdcrypt.session import get_spark

    spark = get_spark("tickflat", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = "/tmp/cdcrypt_tickflat"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    out = {"n_ticks": N_TICKS, "probe_mhash_per_core": _probe()}

    # ---- minhash (text) ----
    mh_root = os.path.join(work, "mh")
    build_minhash_index(_docs(spark, 0, DOC_BATCH, seed=1), mh_root,
                        n_partitions=16)
    # untimed warmup tick (JIT, python workers) against a throwaway copy
    warm_root = os.path.join(work, "mh_warm")
    shutil.copytree(mh_root, warm_root)
    minhash_dedup_tick(spark, warm_root,
                       _docs(spark, 10_000_000, DOC_BATCH, seed=99)).count()
    ticks = []
    for t in range(N_TICKS):
        batch = _docs(spark, (t + 1) * DOC_BATCH, DOC_BATCH, seed=100 + t)
        t0 = time.monotonic()
        pairs = minhash_dedup_tick(spark, mh_root, batch)
        n_pairs = pairs.count()
        wall = round(time.monotonic() - t0, 3)
        corpus = (t + 2) * DOC_BATCH
        ticks.append({"tick": t, "wall_sec": wall, "corpus_after": corpus,
                      "pairs": n_pairs})
        print(f"minhash tick {t}: {wall}s corpus={corpus} pairs={n_pairs}")
    out["minhash"] = {
        "batch": DOC_BATCH, "ticks": ticks,
        "wall_first": ticks[0]["wall_sec"],
        "wall_last": ticks[-1]["wall_sec"],
        "last_over_first": round(
            ticks[-1]["wall_sec"] / ticks[0]["wall_sec"], 2),
        "corpus_growth_vs_initial": round(
            ticks[-1]["corpus_after"] / DOC_BATCH, 1),
        "index_rows": MinHashIndex(mh_root).read_banded(spark).count(),
    }

    # ---- embedding (vectors) ----
    em_root = os.path.join(work, "em")
    build_embedding_lsh_index(_vecs(spark, 0, VEC_BATCH, seed=2), em_root,
                              n_bands=8, bits_per_band=8, n_partitions=16)
    warm_root = os.path.join(work, "em_warm")
    shutil.copytree(em_root, warm_root)
    embedding_dedup_tick(spark, warm_root,
                         _vecs(spark, 10_000_000, VEC_BATCH, seed=98),
                         threshold=0.95).count()
    ticks = []
    for t in range(N_TICKS):
        batch = _vecs(spark, (t + 1) * VEC_BATCH, VEC_BATCH, seed=200 + t)
        t0 = time.monotonic()
        pairs = embedding_dedup_tick(spark, em_root, batch, threshold=0.95)
        n_pairs = pairs.count()
        wall = round(time.monotonic() - t0, 3)
        corpus = (t + 2) * VEC_BATCH
        ticks.append({"tick": t, "wall_sec": wall, "corpus_after": corpus,
                      "pairs": n_pairs})
        print(f"embedding tick {t}: {wall}s corpus={corpus} pairs={n_pairs}")
    out["embedding"] = {
        "batch": VEC_BATCH, "ticks": ticks,
        "wall_first": ticks[0]["wall_sec"],
        "wall_last": ticks[-1]["wall_sec"],
        "last_over_first": round(
            ticks[-1]["wall_sec"] / ticks[0]["wall_sec"], 2),
        "corpus_growth_vs_initial": round(
            ticks[-1]["corpus_after"] / VEC_BATCH, 1),
        "index_rows": EmbeddingLSHIndex(em_root).read_vectors(spark).count(),
    }

    out["probe_mhash_per_core_end"] = _probe()
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "tick_flatness_r05.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", dest)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
