"""Snapshot bootstrap + binlog cutover (operators/bootstrap.py).

The DBLog convergence claim: snapshot rows stamped with their chunk
watermark as op_seq, then LWW over (snapshot ∪ replayed stream) equals
LWW over the full stream — for ANY chunking, any replay overlap, and
the delete/update/reinsert-during-snapshot interleavings.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

from cdcrypt.operators.bootstrap import bootstrap_snapshot, snapshot_to_changes
from cdcrypt.operators.dedup import resolve_latest_agg
from cdcrypt.operators.merge import merge_upsert
from cdcrypt.table.lake import LakeTable

SCHEMA = StructType([
    StructField("conv_id", StringType(), False),
    StructField("turn_idx", IntegerType(), False),
    StructField("text", StringType(), True),
    StructField("op_seq", LongType(), True),
])

# the full binlog: (op, conv, turn, text, op_seq) — crafted so every
# DBLog hazard interleaves with the snapshot watermarks below
EVENTS = [
    ("I", "a", 0, "a0 v1", 1),
    ("I", "b", 0, "b0 v1", 2),
    ("U", "a", 0, "a0 v2", 3),   # update BEFORE a's watermark (reflected)
    ("I", "c", 0, "c0 v1", 4),
    ("D", "b", 0, None, 5),      # delete BEFORE b's watermark: b absent
    ("U", "c", 0, "c0 v2", 7),   # update AFTER c's watermark (chunk 1, w=6)
    ("I", "b", 0, "b0 v3", 8),   # reinsert AFTER b's watermark
    ("D", "c", 0, None, 9),      # delete after watermark
    ("I", "c", 0, "c0 v3", 10),  # ...then reinsert
    ("U", "a", 0, "a0 v3", 11),  # update after ALL watermarks
]
# chunked snapshot: chunk 0 = conv a,b read at binlog pos 6; chunk 1 =
# conv c read at pos 6 too but we give it a LOWER watermark 4 to model
# chunks read at different times (c0 v1 state, before its v2 update)
WATERMARKS = {"a": 6, "b": 6, "c": 4}


def _expected():
    """LWW over the full event list, deletes applied."""
    last: dict = {}
    for op, conv, turn, text, seq in sorted(EVENTS, key=lambda e: e[-1]):
        last[(conv, turn)] = (op, text, seq)
    return {k: (t, s) for k, (op, t, s) in last.items() if op != "D"}


def _snapshot_rows():
    """Table state as of each key's watermark (what a chunk reader sees)."""
    out = {}
    for op, conv, turn, text, seq in sorted(EVENTS, key=lambda e: e[-1]):
        if seq <= WATERMARKS[conv]:
            out[(conv, turn)] = (op, text)
    return [(c, t, text) for (c, t), (op, text) in out.items() if op != "D"]


def _events_df(spark, rows, epoch):
    return spark.createDataFrame(
        [(op, c, t, txt, s) for op, c, t, txt, s in rows],
        ["op", "conv_id", "turn_idx", "text", "op_seq"],
        ).withColumn("epoch", F.lit(epoch).cast("long")) \
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))


@pytest.mark.parametrize("replay_from", [0, 4])
def test_bootstrap_converges_under_overlap(spark, tmp_path, replay_from):
    """Full overlap (replay from 0) and minimal replay (from min
    watermark) both converge to the true final state."""
    t = LakeTable.create(str(tmp_path / f"t{replay_from}"), SCHEMA,
                         bucket_count=4)
    snap = spark.createDataFrame(_snapshot_rows(),
                                 ["conv_id", "turn_idx", "text"]) \
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
    wm = F.element_at(
        F.create_map(*[x for k, v in WATERMARKS.items()
                       for x in (F.lit(k), F.lit(v))]),
        F.col("conv_id"))
    ln = bootstrap_snapshot(spark, t, snap, wm, epoch=0)
    assert ln["bootstrap"]["min_watermark"] == 4
    assert ln["bootstrap"]["max_watermark"] == 6
    # replay the stream in two epochs (split by op_seq parity)
    replay = [e for e in EVENTS if e[-1] >= replay_from]
    for e, part in ((1, [r for r in replay if r[-1] % 2]),
                    (2, [r for r in replay if not r[-1] % 2])):
        if part:
            merge_upsert(
                spark, t,
                resolve_latest_agg(_events_df(spark, part, e)), epoch=e)
    got = {(r["conv_id"], r["turn_idx"]): (r["text"], r["op_seq"])
           for r in t.read(spark).collect()}
    exp = _expected()
    # texts match exactly; op_seq matches except where the snapshot row
    # won (its op_seq is the chunk watermark, not the source event's)
    assert {k: v[0] for k, v in got.items()} == {k: v[0]
                                                 for k, v in exp.items()}
    for k, (text, seq) in exp.items():
        if seq <= WATERMARKS[k[0]]:
            assert got[k][1] == WATERMARKS[k[0]]   # snapshot-stamped
        else:
            assert got[k][1] == seq                # stream superseded


def test_replay_gap_above_watermark_loses_events(spark, tmp_path):
    """The contract is replay_from <= min(watermark): starting the stream
    ABOVE a chunk's watermark demonstrably loses that chunk's in-flight
    events (this is the failure the recorded min_watermark guards)."""
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, bucket_count=4)
    snap = spark.createDataFrame(_snapshot_rows(),
                                 ["conv_id", "turn_idx", "text"]) \
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
    wm = F.element_at(
        F.create_map(*[x for k, v in WATERMARKS.items()
                       for x in (F.lit(k), F.lit(v))]),
        F.col("conv_id"))
    bootstrap_snapshot(spark, t, snap, wm, epoch=0)
    # start the stream at 11 — every event in the watermark..10 window
    # (c's v2/delete/reinsert, b's reinsert) is silently lost
    replay = [e for e in EVENTS if e[-1] >= 11]
    merge_upsert(spark, t, resolve_latest_agg(_events_df(spark, replay, 1)),
                 epoch=1)
    got = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in t.read(spark).collect()}
    exp = {k: v[0] for k, v in _expected().items()}
    assert got != exp                       # state diverged:
    assert got[("c", 0)] == "c0 v1"         # c stuck at its w=4 chunk view
    assert exp[("c", 0)] == "c0 v3"
    assert ("b", 0) not in got              # b's post-snapshot reinsert lost
    assert exp[("b", 0)] == "b0 v3"


def test_global_watermark_int_and_validation(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, bucket_count=4)
    snap = spark.createDataFrame([("a", 0, "x")],
                                 ["conv_id", "turn_idx", "text"]) \
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
    ln = bootstrap_snapshot(spark, t, snap, 42, epoch=0)
    assert ln["bootstrap"] == {"min_watermark": 42, "max_watermark": 42,
                               "replay_from_at_most": 42}
    assert t.read(spark).first()["op_seq"] == 42
    with pytest.raises(ValueError, match="plain table state"):
        snapshot_to_changes(snap.withColumn("op", F.lit("I")), 1)
