"""Streaming near-dup dedup (streaming/dedup.py): the persisted LSH index
ticks under Spark's native streaming runtime. The union of per-epoch pairs
over the stream must equal the one-shot pipeline over the full corpus,
each pair emitted exactly once (on its later-arriving side's epoch), and
restarts/redeliveries must be no-ops."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

from cdcrypt.streaming.dedup import StreamingNearDup

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon").split()

DOC_SCHEMA = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType())])
VEC_SCHEMA = StructType([StructField("vec_id", LongType()),
                         StructField("embedding", ArrayType(DoubleType()))])


def _docs(n=90, seed=7):
    """Same planted near-dup corpus as test_minhash_index."""
    import random
    rng = random.Random(seed)
    rows = [(i, " ".join(rng.choice(WORDS) for _ in range(40)))
            for i in range(n)]
    out = []
    for i, text in rows:
        if i % 9 == 1:
            text = rows[i - 1][1]
        elif i % 15 == 3:
            text = rows[i - 3][1].replace("alpha", "omega", 1)
        out.append((i, text))
    return out


def _vecs(n_clusters=6, per_cluster=10, dim=8, seed=9):
    rng = np.random.default_rng(seed)
    bases = []
    for _ in range(n_clusters):
        b = rng.standard_normal(dim)
        bases.append(b / np.linalg.norm(b))
    rows, vid = [], 0
    for _ in range(per_cluster):
        for c in range(n_clusters):
            v = bases[c] + rng.standard_normal(dim) * 0.02
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return rows


def _write_epochs(src_dir, rows, n_epochs, cols, arrow_schema):
    """One single-file parquet per epoch: row i goes to epoch i % n."""
    os.makedirs(src_dir, exist_ok=True)
    for e in range(n_epochs):
        part = [r for r in rows if r[0] % n_epochs == e]
        tbl = pa.Table.from_pydict(
            {c: [r[i] for r in part] for i, c in enumerate(cols)},
            schema=arrow_schema)
        pq.write_table(tbl, os.path.join(src_dir, f"epoch_{e}.parquet"))


DOC_ARROW = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
VEC_ARROW = pa.schema([("vec_id", pa.int64()),
                       ("embedding", pa.list_(pa.float64()))])


@pytest.fixture()
def dirs(tmp_path):
    return {k: str(tmp_path / k) for k in ("idx", "src", "pairs", "ckpt")}


def test_streaming_minhash_equals_one_shot(spark, dirs):
    from cdcrypt.operators.docdedup import (MinHashIndex,
                                            build_minhash_index,
                                            minhash_lsh_candidates)
    rows = _docs()
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    _write_epochs(dirs["src"], rows, 3, ["doc_id", "text"], DOC_ARROW)
    build_minhash_index(docs.where("doc_id < 0"), dirs["idx"])  # empty

    snd = StreamingNearDup(dirs["idx"], dirs["src"], dirs["pairs"],
                           dirs["ckpt"], kind="minhash")
    snd.run_stream(spark, DOC_SCHEMA, max_files_per_trigger=1)

    got = {(r.id_a, r.id_b): (r.n_shared_bands, r.epoch)
           for r in snd.read_pairs(spark).collect()}
    want = {(r.id_a, r.id_b): r.n_shared_bands
            for r in minhash_lsh_candidates(docs).collect()}
    assert {k: v[0] for k, v in got.items()} == want
    assert len(got) == snd.read_pairs(spark).count()  # no pair twice
    # each pair surfaced on its later-arriving side's epoch
    assert all(e == max(a % 3, b % 3) for (a, b), (_, e) in got.items())
    idx = MinHashIndex(dirs["idx"])
    assert idx.meta["last_batch_id"] == 2
    assert idx.meta["appends"] == 3


def test_restart_and_redelivery_are_noops(spark, dirs):
    from cdcrypt.operators.docdedup import MinHashIndex, build_minhash_index
    rows = _docs(n=45)
    _write_epochs(dirs["src"], rows, 2, ["doc_id", "text"], DOC_ARROW)
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    build_minhash_index(docs.where("doc_id < 0"), dirs["idx"])

    snd = StreamingNearDup(dirs["idx"], dirs["src"], dirs["pairs"],
                           dirs["ckpt"], kind="minhash")
    snd.run_stream(spark, DOC_SCHEMA, max_files_per_trigger=1)
    pairs_before = {(r.id_a, r.id_b, r.epoch)
                    for r in snd.read_pairs(spark).collect()}
    appends_before = MinHashIndex(dirs["idx"]).meta["appends"]

    # restart over the same checkpoint: offset log says all files done
    snd2 = StreamingNearDup(dirs["idx"], dirs["src"], dirs["pairs"],
                            dirs["ckpt"], kind="minhash")
    snd2.run_stream(spark, DOC_SCHEMA, max_files_per_trigger=1)
    # redelivery of a COMPLETED batch (offset commit lost after the tick
    # finished): the watermark in the index meta must skip it
    snd2.apply_batch(docs.where("doc_id % 2 = 1"), batch_id=1)
    snd2.apply_batch(docs.where("doc_id % 2 = 0"), batch_id=0)

    assert {(r.id_a, r.id_b, r.epoch)
            for r in snd2.read_pairs(spark).collect()} == pairs_before
    assert MinHashIndex(dirs["idx"]).meta["appends"] == appends_before


def test_streaming_embedding_equals_one_shot(spark, dirs):
    from cdcrypt.operators.similarity import (EmbeddingLSHIndex,
                                              build_embedding_lsh_index,
                                              embedding_neardup_lsh)
    rows = _vecs()
    vecs = spark.createDataFrame(rows, VEC_SCHEMA)
    _write_epochs(dirs["src"], rows, 2, ["vec_id", "embedding"], VEC_ARROW)
    build_embedding_lsh_index(vecs.where("vec_id < 0"), dirs["idx"], dim=8)

    snd = StreamingNearDup(dirs["idx"], dirs["src"], dirs["pairs"],
                           dirs["ckpt"], kind="embedding",
                           tick_kwargs={"threshold": 0.98})
    snd.run_stream(spark, VEC_SCHEMA, max_files_per_trigger=1)

    got = {(r.id_a, r.id_b): r.sim for r in snd.read_pairs(spark).collect()}
    want = {(r.id_a, r.id_b): r.sim
            for r in embedding_neardup_lsh(vecs, threshold=0.98).collect()}
    assert got == want
    assert EmbeddingLSHIndex(dirs["idx"]).meta["last_batch_id"] == 1


def test_read_pairs_before_first_tick_is_a_clear_error(spark, dirs):
    from cdcrypt.operators.docdedup import build_minhash_index
    docs = spark.createDataFrame([], DOC_SCHEMA)
    build_minhash_index(docs, dirs["idx"])
    snd = StreamingNearDup(dirs["idx"], dirs["src"], dirs["pairs"],
                           dirs["ckpt"], kind="minhash")
    with pytest.raises(FileNotFoundError, match="no pairs emitted yet"):
        snd.read_pairs(spark)


def test_unbuilt_index_fails_fast(tmp_path):
    from cdcrypt.operators.docdedup import MinHashIndexError
    with pytest.raises(MinHashIndexError):
        StreamingNearDup(str(tmp_path / "nope"), "s", "p", "c",
                         kind="minhash")
    with pytest.raises(ValueError):
        StreamingNearDup(str(tmp_path / "nope"), "s", "p", "c",
                         kind="bogus")


def test_uncovered_append_fails_fast(spark, dirs):
    # ADVICE r3: a crash between the append job's commit and the meta write
    # leaves banded rows with no watermark — stream start must detect it
    # (data-dir _SUCCESS newer than the meta JSON) instead of relying on
    # operators reading the docstring and then double-appending.
    import time

    from cdcrypt.operators.docdedup import build_minhash_index
    from cdcrypt.streaming.dedup import IndexIntegrityError
    rows = _docs(n=30)
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    _write_epochs(dirs["src"], rows, 2, ["doc_id", "text"], DOC_ARROW)
    build_minhash_index(docs, dirs["idx"])

    # healthy index: constructor passes (meta written after data)
    StreamingNearDup(dirs["idx"], dirs["src"], dirs["pairs"], dirs["ckpt"],
                     kind="minhash")

    # simulate the torn append: data commit marker newer than the meta.
    # A manifest-bearing index (every index built since _idxfiles.py)
    # SELF-HEALS this window — torn files are invisible to readers and
    # GC'd by the next append — so the constructor passes through
    time.sleep(0.01)
    os.utime(os.path.join(dirs["idx"], "banded", "_SUCCESS"))
    StreamingNearDup(dirs["idx"], dirs["src"], dirs["pairs"],
                     dirs["ckpt"], kind="minhash")

    # a LEGACY (pre-manifest) meta has no way to hide torn files: the
    # fail-fast must still fire for it
    import json
    meta_path = os.path.join(dirs["idx"], "_minhash_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta.pop("banded_files")
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    time.sleep(0.01)
    os.utime(os.path.join(dirs["idx"], "banded", "_SUCCESS"))
    with pytest.raises(IndexIntegrityError, match="Rebuild"):
        StreamingNearDup(dirs["idx"], dirs["src"], dirs["pairs"],
                         dirs["ckpt"], kind="minhash")
    # manual override for verified state
    StreamingNearDup(dirs["idx"], dirs["src"], dirs["pairs"], dirs["ckpt"],
                     kind="minhash", integrity_check=False)
