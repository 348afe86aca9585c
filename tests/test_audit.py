"""Change-stream integrity audit (operators/audit.py)."""

from __future__ import annotations

import datetime

from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType, TimestampType,
)

from cdcrypt.operators.audit import audit_changes

TS = datetime.datetime(2024, 1, 1)
EV = StructType([
    StructField("op", StringType()), StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()), StructField("op_seq", LongType()),
    StructField("epoch", LongType()), StructField("text", StringType()),
])


def _audit(spark, rows):
    df = spark.createDataFrame(rows, EV)
    got = audit_changes(df, ["conv_id", "turn_idx"]).collect()
    return {(r["conv_id"], r["turn_idx"], r["op_seq"], r["kind"])
            for r in got}


def test_clean_stream_is_silent(spark):
    assert _audit(spark, [
        ("I", "A", 0, 1, 0, "v1"),
        ("U", "A", 0, 2, 0, "v2"),
        ("D", "A", 0, 3, 1, None),
        ("I", "A", 0, 4, 1, "v3"),   # delete-then-reinsert is legal
    ]) == set()


def test_redelivery_vs_conflict(spark):
    got = _audit(spark, [
        ("I", "A", 0, 1, 0, "v1"),
        ("I", "A", 0, 1, 1, "v1"),      # identical, later epoch: redelivery
        ("I", "B", 0, 1, 0, "x"),
        ("U", "B", 0, 2, 0, "y"),
        ("U", "B", 0, 2, 0, "z"),       # same position, different payload
    ])
    assert got == {("A", 0, 1, "redelivery"), ("B", 0, 2, "conflict")}


def test_epoch_is_not_payload(spark):
    # ONLY the epoch differs: delivery bookkeeping, not a conflict
    got = _audit(spark, [
        ("I", "A", 0, 1, 0, "v1"),
        ("I", "A", 0, 1, 5, "v1"),
    ])
    assert got == {("A", 0, 1, "redelivery")}


def test_transition_anomalies(spark):
    got = _audit(spark, [
        ("U", "A", 0, 1, 0, "v1"),      # first op not insert
        ("I", "B", 0, 1, 0, "v1"),
        ("D", "B", 0, 2, 0, None),
        ("U", "B", 0, 3, 0, "ghost"),   # update after delete
        ("I", "C", 0, 1, 0, "v1"),
        ("D", "C", 0, 2, 0, None),
        ("D", "C", 0, 3, 0, None),      # double delete
        ("I", "E", 0, 1, 0, "v1"),
        ("I", "E", 0, 2, 0, "v1-again"),  # reinsert while live
    ])
    assert got == {
        ("A", 0, 1, "first_op_not_insert"),
        ("B", 0, 3, "update_after_delete"),
        ("C", 0, 3, "double_delete"),
        ("E", 0, 2, "reinsert"),
    }


def test_conflict_transition_is_deterministic(spark):
    # conflicting ops at one position: max(op) ('U' > 'I' > 'D') is the
    # representative for the transition pass — same seed, same answer
    got = _audit(spark, [
        ("I", "A", 0, 1, 0, "v1"),
        ("D", "A", 0, 2, 0, None),
        ("U", "A", 0, 2, 0, "v2"),      # conflict at position 2 (rep: U)
        ("U", "A", 0, 3, 0, "v3"),
    ])
    # position 2 resolves to U -> position 3's U-after-U is clean, but
    # position 2 itself is U-after-I (clean transition) + a conflict
    assert got == {("A", 0, 2, "conflict")}


def test_null_payload_fingerprint_disambiguates(spark):
    # (null text) vs ('') must not collide in the conflict fingerprint
    got = _audit(spark, [
        ("U", "A", 0, 2, 0, None),
        ("U", "A", 0, 2, 0, ""),
    ])
    assert {k for (_, _, _, k) in got} == {"conflict", "first_op_not_insert"}
