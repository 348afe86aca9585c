"""SCD Type 2 history apply (operators/scd2.py): batch resolution semantics,
as-of reads, incremental-vs-one-shot equivalence on the lake, exactly-once
replay, and duplicate-redelivery no-ops."""

from __future__ import annotations

import datetime

from cdcrypt.operators.scd2 import (
    create_scd2_table,
    scd2_apply,
    scd2_as_of,
    scd2_resolve,
)

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType, TimestampType,
)

TS = datetime.datetime(2024, 1, 1)
COLS = StructType([
    StructField("op", StringType()), StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()), StructField("op_seq", LongType()),
    StructField("epoch", LongType()), StructField("role", StringType()),
    StructField("text", StringType()), StructField("ts", TimestampType()),
])

ROWS = [
    # key A: insert, update, duplicate delivery of the update (later epoch)
    ("I", "A", 0, 1, 0, "user", "a-v1", TS),
    ("U", "A", 0, 5, 1, "user", "a-v2", TS),
    ("U", "A", 0, 5, 2, "user", "a-v2", TS),  # exact redelivery
    # key B: out-of-order arrival within the batch
    ("U", "B", 1, 4, 0, "assistant", "b-final", TS),
    ("I", "B", 1, 2, 0, "assistant", "b-old", TS),
    # key C: insert then delete — history ends closed
    ("I", "C", 2, 3, 0, "tool", "c-v1", TS),
    ("D", "C", 2, 6, 1, None, None, TS),
    # key D: insert, delete, re-insert — a GAP over [8, 9)
    ("I", "D", 3, 7, 1, "user", "d-v1", TS),
    ("D", "D", 3, 8, 1, None, None, TS),
    ("I", "D", 3, 9, 2, "user", "d-v2", TS),
]


def stream(spark, rows=None):
    return spark.createDataFrame(rows or ROWS, COLS)


def interval_map(df):
    return {
        (r["conv_id"], r["turn_idx"], r["valid_from_seq"]):
            (r["valid_to_seq"], r["is_current"], r["text"], r["op_seq"])
        for r in df.collect()
    }


def test_scd2_resolve_intervals(spark):
    out = interval_map(scd2_resolve(stream(spark)))
    assert out[("A", 0, 1)] == (5, False, "a-v1", 5)
    assert out[("A", 0, 5)] == (None, True, "a-v2", 5)
    # out-of-order batch rows still produce ordered intervals
    assert out[("B", 1, 2)] == (4, False, "b-old", 4)
    assert out[("B", 1, 4)] == (None, True, "b-final", 4)
    # delete closes without opening
    assert out[("C", 2, 3)] == (6, False, "c-v1", 6)
    assert ("C", 2, 6) not in out
    # delete + re-insert leaves a gap
    assert out[("D", 3, 7)] == (8, False, "d-v1", 8)
    assert out[("D", 3, 9)] == (None, True, "d-v2", 9)
    assert len(out) == 7


def test_scd2_as_of(spark):
    hist = scd2_resolve(stream(spark)).cache()

    def state(seq):
        return {(r["conv_id"], r["turn_idx"]): r["text"]
                for r in scd2_as_of(hist, seq).collect()}

    assert state(4) == {("A", 0): "a-v1", ("B", 1): "b-final",
                        ("C", 2): "c-v1"}
    assert state(5)[("A", 0)] == "a-v2"
    assert ("C", 2) not in state(6)          # deleted AT 6 -> gone at 6
    assert ("D", 3) not in state(8)          # the gap
    assert state(9)[("D", 3)] == "d-v2"
    hist.unpersist()


def _apply_epochs(spark, tmp_path, name, epochs):
    table = create_scd2_table(str(tmp_path / name), COLS, bucket_count=4)
    df = stream(spark)
    for e in epochs:
        scd2_apply(spark, table, df.where(F.col("epoch") == e), epoch=e)
    return table


def test_scd2_incremental_equals_oneshot(spark, tmp_path):
    table = _apply_epochs(spark, tmp_path, "hist", [0, 1, 2])
    got = interval_map(table.read(spark))
    want = interval_map(scd2_resolve(stream(spark)))
    assert got == want


def test_scd2_epoch_replay_idempotent(spark, tmp_path):
    table = _apply_epochs(spark, tmp_path, "hist", [0, 1])
    before = interval_map(table.read(spark))
    r = scd2_apply(spark, table,
                   stream(spark).where(F.col("epoch") == 1), epoch=1)
    assert r["skipped"]
    assert interval_map(table.read(spark)) == before


def test_scd2_duplicate_redelivery_is_noop(spark, tmp_path):
    # epoch 2 contains ONLY redeliveries of epoch<=1 events (A seq 5) plus
    # one genuinely-new event (D seq 9): the dup must not reopen/churn A.
    table = _apply_epochs(spark, tmp_path, "hist", [0, 1])
    a_before = {k: v for k, v in interval_map(table.read(spark)).items()
                if k[0] == "A"}
    scd2_apply(spark, table, stream(spark).where(F.col("epoch") == 2),
               epoch=2)
    after = interval_map(table.read(spark))
    assert {k: v for k, v in after.items() if k[0] == "A"} == a_before
    assert after[("D", 3, 9)] == (None, True, "d-v2", 9)


def test_scd2_only_open_rows_of_batch_keys_touched(spark, tmp_path):
    # closing joins the is_current slice against the batch key set only:
    # a batch for key A must not rewrite D's closed history rows' content
    table = _apply_epochs(spark, tmp_path, "hist", [0, 1, 2])
    before = interval_map(table.read(spark))
    late = stream(spark, [("U", "A", 0, 11, 3, "user", "a-v3", TS)])
    scd2_apply(spark, table, late, epoch=3)
    after = interval_map(table.read(spark))
    assert after[("A", 0, 5)] == (11, False, "a-v2", 11)
    assert after[("A", 0, 11)] == (None, True, "a-v3", 11)
    for k, v in before.items():
        if k[0] != "A":
            assert after[k] == v
