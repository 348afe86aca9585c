"""Exactly-once under injected mid-commit failures (SURVEY.md §7 watch (a)).

A crash after data files are staged but BEFORE the current-pointer swap must
leave the table readable at the old snapshot, and the retried epoch must
produce the same final state with no duplicates."""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from cdcrypt.operators.transform import decrypt_fields
from cdcrypt.sources.changegen import GenSpec, generate_to_dir
from cdcrypt.streaming.pipeline import IngestPipeline
from cdcrypt.table.lake import LakeTable

KEY = "cdcrypt/transcripts"


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ch"))
    generate_to_dir(d, GenSpec(n_convs=30, avg_turns=5, n_epochs=4, seed=3))
    return d


def _oracle(stream_dir):
    files = sorted(glob.glob(os.path.join(stream_dir, "*.parquet")))
    rows = duckdb.sql(f"""
        SELECT conv_id, turn_idx, text FROM (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY op_seq DESC, epoch ASC) rn
          FROM read_parquet({files!r}, union_by_name=true))
        WHERE rn = 1 AND op <> 'D'""").fetchall()
    return {(r[0], r[1]): r[2] for r in rows}


def test_crash_before_pointer_swap_is_invisible(spark, stream_dir, tmp_path):
    troot = str(tmp_path / "t")
    pipe = IngestPipeline(stream_dir, troot, str(tmp_path / "c"), key_id=KEY,
                          bucket_count=4)
    pipe.run(spark, max_epochs=2)
    t = LakeTable(troot)
    v_before, epoch_before = t.version, t.committed_epoch
    rows_before = sorted(map(tuple, t.read(spark).collect()))

    # inject: commit() raises AFTER files are written, BEFORE the swap
    import cdcrypt.table.lake as lakemod
    orig_swap = lakemod.LakeTable.__dict__["_swap_current"]  # keep descriptor
    try:
        def boom(meta_dir, version):  # noqa: ARG001
            raise RuntimeError("injected crash before pointer swap")
        lakemod.LakeTable._swap_current = staticmethod(boom)
        with pytest.raises(RuntimeError, match="injected"):
            IngestPipeline(stream_dir, troot, str(tmp_path / "c"), key_id=KEY,
                           bucket_count=4).run(spark, max_epochs=1)
    finally:
        lakemod.LakeTable._swap_current = orig_swap

    # old snapshot untouched (orphan staged files are harmless)
    t2 = LakeTable(troot)
    assert t2.version == v_before and t2.committed_epoch == epoch_before
    assert sorted(map(tuple, t2.read(spark).collect())) == rows_before

    # retry completes the remaining epochs; final state matches the oracle
    IngestPipeline(stream_dir, troot, str(tmp_path / "c"), key_id=KEY,
                   bucket_count=4).run(spark)
    final = decrypt_fields(LakeTable(troot).read(spark), ["$.text", "$.tool"],
                           aad_field="conv_id", key_id=KEY)
    got = {(r.conv_id, r.turn_idx): r.text for r in final.collect()}
    assert got == _oracle(stream_dir)


def test_duplicate_epoch_files_are_idempotent(spark, stream_dir, tmp_path):
    """Redelivering a whole epoch's files (copied under a later epoch number)
    must not change final state: the op_seq LWW + exact-duplicate collapse
    absorbs them."""
    import shutil
    dup_dir = str(tmp_path / "dup_stream")
    os.makedirs(dup_dir)
    for f in glob.glob(os.path.join(stream_dir, "*.parquet")):
        shutil.copy(f, dup_dir)
    # re-deliver epoch 1's file as a bogus later epoch 9
    e1 = glob.glob(os.path.join(stream_dir, "epoch=000001*.parquet"))[0]
    shutil.copy(e1, os.path.join(dup_dir, "epoch=000009.part000.parquet"))

    troot = str(tmp_path / "t2")
    IngestPipeline(dup_dir, troot, str(tmp_path / "c2"), key_id=KEY,
                   bucket_count=4).run(spark)
    final = decrypt_fields(LakeTable(troot).read(spark), ["$.text", "$.tool"],
                           aad_field="conv_id", key_id=KEY)
    got = {(r.conv_id, r.turn_idx): r.text for r in final.collect()}
    assert got == _oracle(stream_dir)
