"""Persisted MinHash LSH index: build once, find near-dups of each new
ingest batch in O(batch) — the text analog of the IVF index artifact.

Correctness contract verified here: incremental candidates over
(index ∪ batch) == the one-shot pipeline over ALL docs, restricted to
pairs involving the batch — including n_shared_bands counts and the
hot-bucket cap, which the incremental path applies over UNION bucket
sizes (matched index rows + batch rows == the full-pipeline bucket size
for every bucket the batch touches).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdcrypt.operators.docdedup import (
    MinHashIndex,
    MinHashIndexError,
    append_to_minhash_index,
    build_minhash_index,
    minhash_candidates_incremental,
    minhash_lsh_candidates,
)

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon").split()


def _corpus(spark, n=90, seed=7):
    """Deterministic docs with planted near-dup structure: id i and i+1
    share text for i % 9 == 0; id i and i+3 differ by one word for
    i % 15 == 0."""
    import random
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        base = " ".join(rng.choice(WORDS) for _ in range(40))
        rows.append((i, base))
    out = []
    for i, text in rows:
        if i % 9 == 1:
            text = rows[i - 1][1]                        # exact dup of i-1
        elif i % 15 == 3:
            text = rows[i - 3][1].replace("alpha", "omega", 1)
        out.append((i, text))
    return spark.createDataFrame(out, "doc_id long, text string")


def _pairs_set(df):
    return {(r["id_a"], r["id_b"]): r["n_shared_bands"] for r in df.collect()}


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "mhidx")


def test_incremental_equals_full_pipeline_filtered(spark, root):
    docs = _corpus(spark)
    old = docs.where("doc_id % 2 = 0")
    new = docs.where("doc_id % 2 = 1")
    build_minhash_index(old, root, text_col="text", id_col="doc_id")
    inc = minhash_candidates_incremental(spark, root, new,
                                         max_bucket_size=64)
    full = minhash_lsh_candidates(docs, max_bucket_size=64).where(
        "id_a % 2 = 1 OR id_b % 2 = 1")
    assert _pairs_set(inc) == _pairs_set(full)
    assert len(_pairs_set(inc)) > 0


def test_append_then_incremental(spark, root):
    docs = _corpus(spark)
    build_minhash_index(docs.where("doc_id % 3 = 0"), root)
    idx = append_to_minhash_index(root, docs.where("doc_id % 3 = 1"))
    assert idx.meta["appends"] == 1
    inc = minhash_candidates_incremental(spark, idx,
                                         docs.where("doc_id % 3 = 2"),
                                         max_bucket_size=64)
    full = minhash_lsh_candidates(docs, max_bucket_size=64).where(
        "id_a % 3 = 2 OR id_b % 3 = 2")
    assert _pairs_set(inc) == _pairs_set(full)


def test_hot_bucket_cap_counts_over_union(spark, root):
    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 3
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away " * 4)
    old = spark.createDataFrame(
        [(i, boiler) for i in range(40)] + [(1000, base)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(2000 + i, boiler) for i in range(40)]
        + [(3000, base.replace("lazy", "sleepy"))],
        "doc_id long, text string")
    build_minhash_index(old, root)
    # each side alone is under the cap (41 docs); the UNION bucket holds 80
    # boilerplate docs and must be dropped — only the genuine pair survives
    inc = minhash_candidates_incremental(spark, root, new,
                                         max_bucket_size=64)
    got = set(_pairs_set(inc))
    assert got == {(1000, 3000)}
    # sanity: uncapped, the boilerplate mega-bucket floods the result
    flood = minhash_candidates_incremental(spark, root, new)
    assert flood.count() > 1000


def test_index_side_joins_by_broadcast_not_shuffle(spark, root):
    docs = _corpus(spark)
    build_minhash_index(docs.where("doc_id < 60"), root)
    inc = minhash_candidates_incremental(spark, root,
                                         docs.where("doc_id >= 60"))
    plan = inc._jdf.queryExecution().executedPlan().toString()
    # the corpus scan must meet the batch keys via a broadcast hash join —
    # an index-side shuffle would make every tick O(corpus)
    assert "BroadcastHashJoin" in plan


def test_reopen_and_layout(spark, root):
    docs = _corpus(spark, n=30)
    build_minhash_index(docs, root, bands=16)
    idx = MinHashIndex(root)   # reopen purely from disk
    assert idx.meta["format"] == "cdcrypt-minhash/1"
    banded = idx.read_banded(spark)
    assert banded.count() == 30 * 16
    assert set(banded.columns) == {"doc_id", "band", "bhash", "bpart"}
    # bpart really is the stored partition key (file-level pruning works)
    one = banded.where("bpart = 3")
    assert one.count() == banded.where(
        F.pmod("bhash", F.lit(64)).cast("int") == 3).count()


def test_not_an_index_raises(tmp_path):
    with pytest.raises(MinHashIndexError):
        MinHashIndex(str(tmp_path / "nope"))


def test_streamed_ticks_equal_one_shot_pipeline(spark, root):
    """Feed the corpus through 3 ingest ticks; the union of per-tick
    candidates must equal the one-shot pipeline over the full corpus
    (uncapped — per-tick caps are AS-OF semantics, see docstring)."""
    from cdcrypt.operators.docdedup import minhash_dedup_tick

    docs = _corpus(spark)
    build_minhash_index(docs.where("doc_id < 0"), root)  # empty index
    got = {}
    for tick in range(3):
        pairs = minhash_dedup_tick(spark, root,
                                   docs.where(f"doc_id % 3 = {tick}"))
        for (a, b), n in _pairs_set(pairs).items():
            assert (a, b) not in got, "pair emitted twice across ticks"
            got[(a, b)] = n
    want = _pairs_set(minhash_lsh_candidates(docs))
    assert got == want
    assert MinHashIndex(root).meta["appends"] == 3
