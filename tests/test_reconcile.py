"""Source-vs-lake reconciliation (operators/reconcile.py)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType, TimestampType,
)

from cdcrypt.operators.merge import merge_upsert
from cdcrypt.operators.reconcile import (
    reconcile_diff,
    reconcile_events,
    reconcile_table,
)
from cdcrypt.table.lake import LakeTable

TS = datetime.datetime(2024, 1, 1)

STATE = StructType([
    StructField("conv_id", StringType()), StructField("turn_idx", IntegerType()),
    StructField("role", StringType()), StructField("text", StringType()),
])
KEYS = ["conv_id", "turn_idx"]


def _frames(spark):
    lake = spark.createDataFrame([
        ("A", 0, "user", "v-old"),      # mismatch
        ("B", 0, "user", "same"),       # match
        ("C", 0, "tool", "orphan"),     # extra (source deleted it)
    ], STATE)
    snap = spark.createDataFrame([
        ("A", 0, "user", "v-new"),
        ("B", 0, "user", "same"),
        ("D", 0, "assistant", "fresh"),  # missing from lake
    ], STATE)
    return lake, snap


def test_diff_classifies_three_reasons(spark):
    lake, snap = _frames(spark)
    got = {(r["conv_id"], r["reason"])
           for r in reconcile_diff(lake, snap, KEYS).collect()}
    assert got == {("A", "mismatch"), ("C", "extra"), ("D", "missing")}


def test_events_broadcast_and_fallback_paths_agree(spark):
    lake, snap = _frames(spark)

    def normalized(ev):
        return sorted(
            (r["op"], r["conv_id"], r["turn_idx"], r["op_seq"],
             r["role"], r["text"])
            for r in ev.collect())

    bc = reconcile_events(lake, snap, KEYS, op_seq=100, epoch=7)
    fb = reconcile_events(lake, snap, KEYS, op_seq=100, epoch=7,
                          broadcast_max_diff=None)
    zero = reconcile_events(lake, snap, KEYS, op_seq=100, epoch=7,
                            broadcast_max_diff=0)  # count > 0 -> fallback
    expect = [
        ("D", "C", 0, 100, None, None),
        ("U", "A", 0, 100, "user", "v-new"),
        ("U", "D", 0, 100, "assistant", "fresh"),
    ]
    assert normalized(bc) == expect
    assert normalized(fb) == expect
    assert normalized(zero) == expect


def test_null_position_shift_is_a_mismatch(spark):
    # xxhash64 skips nulls; without interleaved null markers these two
    # rows would fingerprint identically and the drift would be invisible
    lake = spark.createDataFrame([("A", 0, None, "x")], STATE)
    snap = spark.createDataFrame([("A", 0, "x", None)], STATE)
    [d] = reconcile_diff(lake, snap, KEYS).collect()
    assert d["reason"] == "mismatch"


def test_add_column_drift_backfills(spark):
    # snapshot grew a column the lake does not have yet: rows where the
    # source filled it are mismatches carrying the value; rows where it
    # is still null match (typed-NULL alignment on the lake side)
    lake = spark.createDataFrame([("A", 0, "user", "t"),
                                  ("B", 0, "user", "t")], STATE)
    # note: StructType.add mutates in place — build a fresh schema
    snap_schema = StructType(
        STATE.fields + [StructField("model", StringType())])
    snap = spark.createDataFrame([("A", 0, "user", "t", "m-1"),
                                  ("B", 0, "user", "t", None)], snap_schema)
    diffs = reconcile_diff(lake, snap, KEYS).collect()
    assert [(d["conv_id"], d["reason"]) for d in diffs] == [("A", "mismatch")]
    [ev] = reconcile_events(lake, snap, KEYS, op_seq=5).collect()
    assert (ev["op"], ev["conv_id"], ev["model"]) == ("U", "A", "m-1")


def test_compare_cols_restricts_comparison(spark):
    lake, snap = _frames(spark)
    # compare role only: A's text drift becomes invisible
    got = {(r["conv_id"], r["reason"])
           for r in reconcile_diff(lake, snap, KEYS,
                                   compare_cols=["role"]).collect()}
    assert got == {("C", "extra"), ("D", "missing")}


TABLE_SCHEMA = StructType([
    StructField("conv_id", StringType()), StructField("turn_idx", IntegerType()),
    StructField("op_seq", LongType()),
    StructField("role", StringType()), StructField("text", StringType()),
    StructField("tool", StringType()), StructField("ts", TimestampType()),
])
EV = StructType([
    StructField("op", StringType()), StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()), StructField("op_seq", LongType()),
    StructField("epoch", LongType()), StructField("role", StringType()),
    StructField("text", StringType()), StructField("tool", StringType()),
    StructField("ts", TimestampType()),
])


def test_reconcile_table_end_to_end(spark, tmp_path):
    table = LakeTable.create(str(tmp_path / "t"), TABLE_SCHEMA,
                             bucket_count=4)
    # the lake saw only part of the stream (drift: stale A, missing D,
    # orphan C that the source deleted without a logged D event)
    seen = spark.createDataFrame([
        ("I", "A", 0, 1, 0, "user", "a-v1", None, TS),
        ("I", "B", 0, 2, 0, "user", "b-v1", None, TS),
        ("I", "C", 0, 3, 0, "tool", "c-v1", None, TS),
    ], EV)
    merge_upsert(spark, table, seen, epoch=0)

    # fresh source snapshot at watermark 50
    # op_seq in the snapshot is ignored (RESERVED_META): stored positions
    # are bookkeeping, and B must compare equal despite its stored op_seq
    snap = spark.createDataFrame([
        ("A", 0, 10, "user", "a-v2", None, TS),
        ("B", 0, 999, "user", "b-v1", None, TS),
        ("D", 0, 40, "assistant", "d-v1", None, TS),
    ], TABLE_SCHEMA)
    lineage = reconcile_table(spark, table.refresh(), snap,
                              op_seq=50, epoch=1)
    assert lineage["reconcile"] == {
        "upserts": 2, "deletes": 1, "watermark_op_seq": 50}

    state = {(r["conv_id"], r["text"])
             for r in table.refresh().read(spark).collect()}
    assert state == {("A", "a-v2"), ("B", "b-v1"), ("D", "d-v1")}

    # a second reconciliation against the repaired table is a no-op
    lin2 = reconcile_table(spark, table.refresh(), snap, op_seq=51, epoch=2)
    assert lin2["reconcile"]["upserts"] == 0
    assert lin2["reconcile"]["deletes"] == 0

    # corrections carry the snapshot watermark: a concurrent stream
    # event NEWER than the snapshot still wins LWW over the correction
    newer = spark.createDataFrame(
        [("U", "A", 0, 60, 3, "user", "a-v3", None, TS)], EV)
    merge_upsert(spark, table.refresh(), newer, epoch=3)
    lin3 = reconcile_table(spark, table.refresh(), snap, op_seq=50, epoch=4)
    assert lin3["reconcile"]["upserts"] == 1  # A looks drifted vs old snap
    [a] = table.refresh().read(spark).where(F.col("conv_id") == "A").collect()
    assert a["text"] == "a-v3"  # op_seq 60 > watermark 50: stream wins


def test_reconcile_chunked_equals_one_shot_and_resumes(spark, tmp_path):
    from cdcrypt.operators.reconcile import reconcile_table_chunked
    from cdcrypt.table.lake import bucket_col

    table = LakeTable.create(str(tmp_path / "tc"), TABLE_SCHEMA,
                             bucket_count=4)
    seen = spark.createDataFrame([
        ("I", f"conv-{i}", 0, i, 0, "user", f"old-{i}", None, TS)
        for i in range(20)
    ], EV)
    merge_upsert(spark, table, seen, epoch=0)

    # source truth: evens updated, odds deleted, five new keys
    snap_rows = ([(f"conv-{i}", 0, 0, "user", f"new-{i}", None, TS)
                  for i in range(0, 20, 2)]
                 + [(f"conv-{i}", 0, 0, "user", f"new-{i}", None, TS)
                    for i in range(20, 25)])
    snap = spark.createDataFrame(snap_rows, TABLE_SCHEMA)

    calls = []

    def snapshot_for(bucket_ids):
        calls.append(tuple(bucket_ids))
        # per-chunk watermark advances as the chunks are read
        return (snap.where(bucket_col(4, "conv_id").isin(*bucket_ids)),
                100 + len(calls))

    lineages = reconcile_table_chunked(
        spark, table, snapshot_for, epoch_start=1, chunk_buckets=2,
        max_chunks=1)
    assert len([l for l in lineages if not l.get("skipped")]) == 1
    assert calls == [(0, 1)]

    # resume: chunk 0's epoch is committed, so it is skipped without a
    # snapshot read; chunk 1 completes the repair
    lineages2 = reconcile_table_chunked(
        spark, LakeTable(str(tmp_path / "tc")), snapshot_for,
        epoch_start=1, chunk_buckets=2)
    assert lineages2[0]["skipped"] and lineages2[0]["chunk"] == (0, 1)
    assert lineages2[1]["reconcile"]["chunk"] == (2, 3)
    assert calls == [(0, 1), (2, 3)]  # no re-read of the repaired chunk

    state = {(r["conv_id"], r["text"]) for r in
             LakeTable(str(tmp_path / "tc")).read(spark).collect()}
    expect = {(f"conv-{i}", f"new-{i}") for i in range(0, 20, 2)}
    expect |= {(f"conv-{i}", f"new-{i}") for i in range(20, 25)}
    assert state == expect

    # a sloppy snapshot_for returning out-of-chunk rows cannot create
    # spurious corrections: rerun with the FULL snapshot every chunk
    t2 = LakeTable.create(str(tmp_path / "tc2"), TABLE_SCHEMA,
                          bucket_count=4)
    merge_upsert(spark, t2, seen, epoch=0)
    lineages3 = reconcile_table_chunked(
        spark, t2, lambda ids: (snap, 100), epoch_start=1, chunk_buckets=2)
    state2 = {(r["conv_id"], r["text"]) for r in
              LakeTable(str(tmp_path / "tc2")).read(spark).collect()}
    assert state2 == expect
    total_up = sum(l["reconcile"]["upserts"] for l in lineages3)
    assert total_up == 15  # each key corrected exactly once across chunks
