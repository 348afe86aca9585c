"""Structured Streaming driver (streaming/structured.py): the same ingest
under Spark's native streaming runtime. Batch boundaries are deliberately
misaligned with generator epochs (maxFilesPerTrigger=2 over 5 epoch files)
— resolution is a pure function of (conv_id, turn_idx, op_seq), so any
micro-batching must converge to the oracle state."""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from cdcrypt.operators.transform import decrypt_fields
from cdcrypt.sources.changegen import GenSpec, generate_to_dir
from cdcrypt.streaming.structured import StructuredIngest, infer_stream_schema
from cdcrypt.table.lake import LakeTable

KEY = "cdcrypt/transcripts"


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ss_changes"))
    generate_to_dir(d, GenSpec(n_convs=30, avg_turns=5, n_epochs=5, seed=23))
    return d


def _oracle(stream_dir: str) -> dict:
    files = sorted(glob.glob(os.path.join(stream_dir, "*.parquet")))
    rows = duckdb.sql(
        f"""
        SELECT conv_id, turn_idx, role, text, tool, model FROM (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY op_seq DESC, epoch ASC) rn
          FROM read_parquet({files!r}, union_by_name=true))
        WHERE rn = 1 AND op <> 'D'
        """
    ).fetchall()
    return {(r[0], r[1]): (r[2], r[3], r[4], r[5]) for r in rows}


def test_structured_stream_matches_oracle_and_is_idempotent(
        spark, stream_dir, tmp_path):
    troot, ckpt = str(tmp_path / "sst"), str(tmp_path / "ssc")
    ing = StructuredIngest(stream_dir, troot, ckpt, key_id=KEY, bucket_count=8)
    schema = infer_stream_schema(stream_dir)
    assert "model" in schema.fieldNames()  # post-evolution superset

    ing.run_stream(spark, schema, available_now=True, max_files_per_trigger=2)
    t = LakeTable(troot)
    n_batches = t.committed_epoch + 1
    assert n_batches >= 2  # misaligned micro-batches actually happened

    dec = decrypt_fields(t.read(spark), ["$.text", "$.tool"],
                         aad_field="conv_id", key_id=KEY)
    got = {(r.conv_id, r.turn_idx): (r.role, r.text, r.tool, r.model)
           for r in dec.collect()}
    assert got == _oracle(stream_dir)

    # restart over the same checkpoint: SS offset log says all files done;
    # table version unchanged (exactly-once across restarts)
    v_before = t.version
    ing2 = StructuredIngest(stream_dir, troot, ckpt, key_id=KEY,
                            bucket_count=8)
    ing2.run_stream(spark, schema, available_now=True,
                    max_files_per_trigger=2)
    assert LakeTable(troot).version == v_before
