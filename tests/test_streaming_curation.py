"""Streaming incremental curation (streaming/curation.py): the one-shot
curate_corpus composition maintained per ingest tick as CDC upserts into
a curated lake table. The union of per-epoch curated deltas — i.e. the
curated table's resolved read — must equal one-shot curate_corpus over
the full corpus, under Structured Streaming, restarts, redeliveries, and
a crash between the two lake commits."""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from cdcrypt.operators.curation import curate_corpus
from cdcrypt.operators.docdedup import (
    build_minhash_index,
    minhash_lsh_candidates,
)
from cdcrypt.streaming.curation import StreamingCuration

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
DOC_SCHEMA = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType())])
DOC_ARROW = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _docs(n=90, seed=7):
    """Planted near-dups: exact copies and one-word variants, some
    crossing epoch boundaries so clusters MERGE mid-stream."""
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


def _write_epochs(src_dir, rows, n_epochs):
    os.makedirs(src_dir, exist_ok=True)
    for e in range(n_epochs):
        part = [r for r in rows if r[0] % n_epochs == e]
        tbl = pa.Table.from_pydict(
            {"doc_id": [r[0] for r in part], "text": [r[1] for r in part]},
            schema=DOC_ARROW)
        pq.write_table(tbl, os.path.join(src_dir, f"epoch_{e}.parquet"))


@pytest.fixture()
def dirs(tmp_path):
    return {k: str(tmp_path / k)
            for k in ("idx", "state", "out", "src", "ckpt")}


def _one_shot(spark, rows, **kw):
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    pairs = minhash_lsh_candidates(docs)
    return {tuple(r) for r in
            curate_corpus(docs, pairs.select("id_a", "id_b"),
                          WEIGHTS, **kw).collect()}


def _curation(spark, dirs, **kw):
    docs = spark.createDataFrame([], DOC_SCHEMA)
    build_minhash_index(docs, dirs["idx"])  # empty corpus, from scratch
    return StreamingCuration(dirs["idx"], dirs["state"], dirs["out"],
                             WEIGHTS, source_dir=dirs["src"],
                             checkpoint_dir=dirs["ckpt"], **kw)


def test_streamed_curation_equals_one_shot_under_ss(spark, dirs):
    rows = _docs()
    _write_epochs(dirs["src"], rows, 3)
    sc = _curation(spark, dirs, min_quality=0.1)
    sc.run_stream(spark, DOC_SCHEMA, max_files_per_trigger=1)
    got = {tuple(r) for r in sc.read_curated(spark).collect()}
    assert got == _one_shot(spark, rows, min_quality=0.1)
    # restart with the same checkpoint: no new files -> state unchanged
    sc2 = StreamingCuration(dirs["idx"], dirs["state"], dirs["out"],
                            WEIGHTS, min_quality=0.1,
                            source_dir=dirs["src"],
                            checkpoint_dir=dirs["ckpt"])
    sc2.run_stream(spark, DOC_SCHEMA, max_files_per_trigger=1)
    assert {tuple(r) for r in sc2.read_curated(spark).collect()} == got


def test_quality_and_lang_gates_apply_per_survivor(spark, dirs):
    rows = _docs(n=45)
    rows.append((2000, "short"))                   # fails quality gate
    rows.append((2001, "日本語のドキュメントです。" * 8))  # fails lang gate
    _write_epochs(dirs["src"], rows, 2)
    sc = _curation(spark, dirs, min_quality=0.3, langs=("en", "other"))
    sc.run_stream(spark, DOC_SCHEMA, max_files_per_trigger=1)
    got = {tuple(r) for r in sc.read_curated(spark).collect()}
    assert got == _one_shot(spark, rows, min_quality=0.3,
                            langs=("en", "other"))
    ids = {t[0] for t in got}
    assert 2000 not in ids and 2001 not in ids


def test_manual_redelivery_is_a_noop(spark, dirs):
    rows = _docs(n=45)
    _write_epochs(dirs["src"], rows, 3)
    sc = _curation(spark, dirs, min_quality=0.1)
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    for e in range(3):
        sc.apply_batch(docs.where(f"doc_id % 3 = {e}"), e)
    want = {tuple(r) for r in sc.read_curated(spark).collect()}
    assert want == _one_shot(spark, rows, min_quality=0.1)
    # redeliver every batch: watermark + lake epoch gates make it a no-op
    for e in range(3):
        sc.apply_batch(docs.where(f"doc_id % 3 = {e}"), e)
    assert {tuple(r) for r in sc.read_curated(spark).collect()} == want


def test_crash_between_lake_commits_recovers(spark, dirs, monkeypatch):
    """Kill the tick AFTER the state merge commits but BEFORE the curated
    output merges (the crash window the delta computation must tolerate:
    on redelivery the batch's own docs are already in state). The
    redelivered tick must converge to the one-shot result."""
    import cdcrypt.streaming.curation as sc_mod
    rows = _docs(n=45)
    _write_epochs(dirs["src"], rows, 2)
    sc = _curation(spark, dirs, min_quality=0.1)
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    sc.apply_batch(docs.where("doc_id % 2 = 0"), 0)

    real_merge = sc_mod.merge_upsert
    calls = {"n": 0}

    def failing_merge(spark_, table, resolved, epoch, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # 1st call = state merge, 2nd = output merge
            raise RuntimeError("injected crash before the output commit")
        return real_merge(spark_, table, resolved, epoch, **kw)

    monkeypatch.setattr(sc_mod, "merge_upsert", failing_merge)
    with pytest.raises(RuntimeError, match="injected crash"):
        sc.apply_batch(docs.where("doc_id % 2 = 1"), 1)
    monkeypatch.setattr(sc_mod, "merge_upsert", real_merge)

    # index watermark still at 0 (append runs last) -> full redelivery
    sc.apply_batch(docs.where("doc_id % 2 = 1"), 1)
    got = {tuple(r) for r in sc.read_curated(spark).collect()}
    assert got == _one_shot(spark, rows, min_quality=0.1)


def test_unbuilt_index_fails_fast(tmp_path):
    from cdcrypt.operators.docdedup import MinHashIndexError
    with pytest.raises(MinHashIndexError):
        StreamingCuration(str(tmp_path / "nope"), "s", "o", WEIGHTS)
