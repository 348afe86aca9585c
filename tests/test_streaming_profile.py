"""Streaming profile (streaming/corpusprofile.py): the bounded-state profile
index ticks under Structured Streaming; the streamed result must be
bit-identical to a one-shot profile over the full corpus, and
redeliveries must be no-ops (the moment sums would double-count)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from cdcrypt.operators.profile import (
    ProfileIndex,
    build_profile_index,
    profile_columns,
)
from cdcrypt.streaming.corpusprofile import StreamingProfile

SCHEMA = StructType([StructField("doc_id", LongType()),
                     StructField("text", StringType())])
ARROW = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])


def _rows(n=600):
    return [(i, None if i % 11 == 0 else f"doc text {i % 250}")
            for i in range(n)]


def _write_epochs(src_dir, rows, n_epochs):
    os.makedirs(src_dir, exist_ok=True)
    for e in range(n_epochs):
        part = [r for r in rows if r[0] % n_epochs == e]
        tbl = pa.Table.from_pydict(
            {"doc_id": [r[0] for r in part], "text": [r[1] for r in part]},
            schema=ARROW)
        pq.write_table(tbl, os.path.join(src_dir, f"epoch_{e}.parquet"))


@pytest.fixture()
def dirs(tmp_path):
    return {k: str(tmp_path / k) for k in ("idx", "src", "ckpt")}


def _seed(spark, root):
    empty = spark.createDataFrame([], SCHEMA)
    return build_profile_index(empty, root, ["doc_id", "text"])


def test_streamed_profile_equals_oneshot(spark, dirs):
    rows = _rows()
    _write_epochs(dirs["src"], rows, n_epochs=4)
    _seed(spark, dirs["idx"])
    sp = StreamingProfile(dirs["idx"], dirs["src"], dirs["ckpt"])
    sp.run_stream(spark, SCHEMA, max_files_per_trigger=1)

    full = spark.createDataFrame(rows, SCHEMA)
    got = sorted(tuple(r) for r in sp.read(spark).collect())
    want = sorted(tuple(r)
                  for r in profile_columns(full, ["doc_id", "text"])
                  .collect())
    assert got == want
    idx = ProfileIndex(dirs["idx"])
    assert idx.meta["ticks"] == 4
    assert idx.meta["last_batch_id"] == 3


def test_redelivery_is_a_noop(spark, dirs):
    rows = _rows(200)
    _write_epochs(dirs["src"], rows, n_epochs=1)
    _seed(spark, dirs["idx"])
    sp = StreamingProfile(dirs["idx"], dirs["src"], dirs["ckpt"])
    sp.run_stream(spark, SCHEMA)
    before = sorted(tuple(r) for r in sp.read(spark).collect())
    v_before = ProfileIndex(dirs["idx"]).meta["version"]

    # simulate SS redelivering the completed batch after a lost offset
    # commit: the moment sums must NOT fold twice
    batch = spark.createDataFrame(rows, SCHEMA)
    sp.apply_batch(batch, 0)
    after = sorted(tuple(r) for r in sp.read(spark).collect())
    assert after == before
    assert ProfileIndex(dirs["idx"]).meta["version"] == v_before


def test_restart_folds_only_new_files(spark, dirs):
    rows = _rows(400)
    first = [r for r in rows if r[0] < 200]
    _write_epochs(dirs["src"], first, n_epochs=1)
    _seed(spark, dirs["idx"])
    sp = StreamingProfile(dirs["idx"], dirs["src"], dirs["ckpt"])
    sp.run_stream(spark, SCHEMA)

    # second tranche arrives; a fresh driver resumes from the checkpoint
    tbl = pa.Table.from_pydict(
        {"doc_id": [r[0] for r in rows if r[0] >= 200],
         "text": [r[1] for r in rows if r[0] >= 200]}, schema=ARROW)
    pq.write_table(tbl, os.path.join(dirs["src"], "late.parquet"))
    sp2 = StreamingProfile(dirs["idx"], dirs["src"], dirs["ckpt"])
    sp2.run_stream(spark, SCHEMA)

    full = spark.createDataFrame(rows, SCHEMA)
    got = sorted(tuple(r) for r in sp2.read(spark).collect())
    want = sorted(tuple(r)
                  for r in profile_columns(full, ["doc_id", "text"])
                  .collect())
    assert got == want
    assert ProfileIndex(dirs["idx"]).meta["ticks"] == 2


def test_requires_built_index(spark, dirs):
    from cdcrypt.operators.profile import ProfileIndexError
    with pytest.raises(ProfileIndexError):
        StreamingProfile(dirs["idx"], dirs["src"], dirs["ckpt"])


def test_profile_nulls_survive_streaming(spark, dirs):
    # an all-null epoch must fold as pure null-count growth
    rows = [(i, None) for i in range(50)]
    _write_epochs(dirs["src"], rows, n_epochs=1)
    _seed(spark, dirs["idx"])
    sp = StreamingProfile(dirs["idx"], dirs["src"], dirs["ckpt"])
    sp.run_stream(spark, SCHEMA)
    r = {x.col: x for x in sp.read(spark).collect()}
    assert r["text"].n_nulls == 50 and r["text"].distinct_est == 0
    assert r["text"].min_len is None and r["text"].avg_len is None
    assert r["doc_id"].n_nulls == 0 and r["doc_id"].n_rows == 50
