"""Aggregation merge engine (per-column folds; the Paimon `aggregation`
analogue with delete-reset semantics — SURVEY.md P5 extension, round 4).

Semantics under test (cdcrypt/operators/dedup.py resolve_aggregate*):
- each payload column folds contributing events with its configured fn
  (sum | max | min | last_non_null; default last_non_null);
- deletes RESET the accumulator: contributions at or below the key's
  newest delete op_seq drop, and the key is live only if a contribution
  survives;
- sum/max/min are associative+commutative, so MoR partial-aggregate rows
  fold EXACTLY across any batching/compaction; last_non_null and the
  delete cutoff coarsen to batch granularity (sequence-field contract).

Verified by hand-built cases, a brute-force Python model over randomized
event logs, batching-invariance (1 batch == N batches == compacted), and
end-to-end through the MoR lake table.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)

from cdcrypt.operators.dedup import (
    resolve_aggregate,
    resolve_aggregate_update,
)
from cdcrypt.operators.merge import merge_upsert
from cdcrypt.table.lake import LakeTable, LakeTableError

COLS = StructType([
    StructField("op", StringType()), StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()), StructField("op_seq", LongType()),
    StructField("epoch", LongType()), StructField("n", LongType()),
    StructField("hi", DoubleType()), StructField("tag", StringType()),
])

SPEC = {"n": "sum", "hi": "max", "tag": "last_non_null"}

TABLE_SCHEMA = StructType([
    StructField("conv_id", StringType(), False),
    StructField("turn_idx", IntegerType(), False),
    StructField("n", LongType(), True),
    StructField("hi", DoubleType(), True),
    StructField("tag", StringType(), True),
    StructField("op_seq", LongType(), True),
])


def _df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _state(df):
    return {
        (r["conv_id"], r["turn_idx"]): (r["n"], r["hi"], r["tag"])
        for r in df.collect()
    }


def test_per_column_folds(spark):
    df = _df(spark, [
        ("I", "A", 0, 1, 0, 2, 1.5, "x"),
        ("U", "A", 0, 2, 0, 3, 0.5, None),   # sum grows, max keeps, tag keeps
        ("U", "A", 0, 3, 0, None, 9.0, "y"),  # null n ignored by sum
    ])
    out = resolve_aggregate(df, SPEC).where("op != 'D'")
    assert _state(out) == {("A", 0): (5, 9.0, "y")}
    [row] = out.collect()
    assert row["op_seq"] == 3


def test_delete_resets_accumulator(spark):
    df = _df(spark, [
        ("I", "A", 0, 1, 0, 10, 5.0, "x"),
        ("D", "A", 0, 2, 0, None, None, None),
        ("U", "A", 0, 3, 0, 7, 1.0, None),   # only post-delete counts
        ("I", "B", 1, 4, 0, 1, 1.0, "b"),
        ("D", "B", 1, 5, 0, None, None, None),  # B fully dead
    ])
    out = resolve_aggregate(df, SPEC)
    assert _state(out.where("op != 'D'")) == {("A", 0): (7, 1.0, None)}
    dead = {(r["conv_id"], r["turn_idx"]): r["op_seq"]
            for r in out.where("op = 'D'").collect()}
    assert dead == {("B", 1): 5}


def test_batch_resolver_emits_partial_plus_tombstone(spark):
    df = _df(spark, [
        ("I", "A", 0, 1, 0, 1, 1.0, "x"),
        ("D", "A", 0, 2, 0, None, None, None),
        ("U", "A", 0, 3, 0, 4, 2.0, None),
    ])
    out = resolve_aggregate_update(df, SPEC).collect()
    by_op = {r["op"]: r for r in out}
    assert set(by_op) == {"U", "D"}
    assert by_op["D"]["op_seq"] == 2
    assert (by_op["U"]["n"], by_op["U"]["hi"], by_op["U"]["tag"]) == \
        (4, 2.0, None)


def test_spec_validation(spark):
    df = _df(spark, [("I", "A", 0, 1, 0, 1, 1.0, "x")])
    with pytest.raises(ValueError, match="unknown aggregate fns"):
        resolve_aggregate(df, {"n": "avg"}).collect()
    with pytest.raises(ValueError, match="not in payload"):
        resolve_aggregate(df, {"nope": "sum"}).collect()


def _rand_events(rng, n_events=300, n_keys=12):
    events = []
    for seq in range(1, n_events + 1):
        k = rng.randrange(n_keys)
        op = "D" if rng.random() < 0.1 else "U"
        ev = {"op": op, "conv_id": f"c{k % 5}", "turn_idx": k,
              "op_seq": seq, "epoch": 0,
              "n": None, "hi": None, "tag": None}
        if op != "D":
            if rng.random() < 0.7:
                ev["n"] = rng.randrange(1, 10)
            if rng.random() < 0.6:
                ev["hi"] = round(rng.uniform(0, 100), 3)
            if rng.random() < 0.4:
                ev["tag"] = f"t{seq}"
        events.append(ev)
    return events


def _model(events):
    keys = {(e["conv_id"], e["turn_idx"]) for e in events}
    state = {}
    for k in keys:
        evs = [e for e in events if (e["conv_id"], e["turn_idx"]) == k]
        dels = [e["op_seq"] for e in evs if e["op"] == "D"]
        cut = max(dels) if dels else -1
        contrib = [e for e in evs if e["op"] != "D" and e["op_seq"] > cut]
        if not contrib:
            continue
        ns = [e["n"] for e in contrib if e["n"] is not None]
        his = [e["hi"] for e in contrib if e["hi"] is not None]
        tags = [(e["op_seq"], e["tag"]) for e in contrib
                if e["tag"] is not None]
        state[k] = (sum(ns) if ns else None,
                    max(his) if his else None,
                    max(tags)[1] if tags else None)
    return state


def test_randomized_against_python_model(spark):
    rng = random.Random(7)
    events = _rand_events(rng)
    rng.shuffle(events)
    df = spark.createDataFrame(
        [(e["op"], e["conv_id"], e["turn_idx"], e["op_seq"], e["epoch"],
          e["n"], e["hi"], e["tag"]) for e in events], COLS)
    got = _state(resolve_aggregate(df, SPEC).where("op != 'D'"))
    assert got == _model(events)


def test_exchange_reuse_two_phase_plan(spark):
    """Scale guard: the cutoff aggregation and the join probe hash on the
    SAME keys, so Catalyst reuses one exchange of the input (ReusedExchange)
    and the final fold aggregation adds no further shuffle of the events."""
    df = _df(spark, [("I", "A", 0, 1, 0, 1, 1.0, "x")])
    plan = resolve_aggregate(df, SPEC)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ReusedExchange" in plan or \
        plan.count("Exchange hashpartitioning") <= 2


def test_create_validation(spark, tmp_path):
    with pytest.raises(LakeTableError, match="op_seq"):
        no_seq = StructType([f for f in TABLE_SCHEMA.fields
                             if f.name != "op_seq"])
        LakeTable.create(str(tmp_path / "t1"), no_seq, bucket_count=2,
                         merge_engine="aggregate", agg_spec=SPEC)
    with pytest.raises(LakeTableError, match="only valid with"):
        LakeTable.create(str(tmp_path / "t2"), TABLE_SCHEMA, bucket_count=2,
                         merge_engine="lww", agg_spec=SPEC)
    with pytest.raises(LakeTableError, match="not in table schema"):
        LakeTable.create(str(tmp_path / "t3"), TABLE_SCHEMA, bucket_count=2,
                         merge_engine="aggregate", agg_spec={"nope": "sum"})
    with pytest.raises(LakeTableError, match="unknown aggregate fns"):
        LakeTable.create(str(tmp_path / "t4"), TABLE_SCHEMA, bucket_count=2,
                         merge_engine="aggregate", agg_spec={"n": "avg"})
    t = LakeTable.create(str(tmp_path / "t5"), TABLE_SCHEMA, bucket_count=2,
                         merge_engine="aggregate", agg_spec=SPEC)
    assert t.agg_spec == SPEC
    with pytest.raises(LakeTableError, match="merge-on-read"):
        merge_upsert(spark, t, resolve_aggregate_update(
            _df(spark, [("I", "A", 0, 1, 0, 1, 1.0, "x")]), SPEC),
            epoch=0, mode="cow")


def _apply(spark, t, rows, epoch, **kw):
    return merge_upsert(
        spark, t, resolve_aggregate_update(_df(spark, rows), t.agg_spec),
        epoch=epoch, mode="mor", **kw)


def test_mor_batching_invariance_and_compaction(spark, tmp_path):
    """One-shot resolution == the same events applied as N MoR epochs ==
    the same with compaction folding deltas mid-run (sum/max exactness
    under arbitrary batching), with agg_spec surviving commits."""
    rng = random.Random(21)
    events = _rand_events(rng, n_events=240, n_keys=10)
    # in-order epochs (the engine's documented exactness domain)
    chunks = [events[k * 60:(k + 1) * 60] for k in range(4)]

    oneshot = _model(events)

    t = LakeTable.create(str(tmp_path / "t"), TABLE_SCHEMA, bucket_count=2,
                         merge_engine="aggregate", agg_spec=SPEC)
    for ep, chunk in enumerate(chunks):
        _apply(spark, t, [
            (e["op"], e["conv_id"], e["turn_idx"], e["op_seq"], ep,
             e["n"], e["hi"], e["tag"]) for e in chunk
        ], epoch=ep, compact_threshold=3)
    assert t.merge_engine == "aggregate" and t.agg_spec == SPEC
    assert any(f.get("compacted") for f in t.snapshot["files"]), \
        "compaction never fired"
    got = _state(t.read(spark))
    assert got == oneshot


def test_mor_replay_idempotent(spark, tmp_path):
    """Redelivered epoch is skipped — the sum does NOT double-count."""
    t = LakeTable.create(str(tmp_path / "t"), TABLE_SCHEMA, bucket_count=2,
                         merge_engine="aggregate", agg_spec=SPEC)
    _apply(spark, t, [("I", "A", 0, 1, 0, 5, 1.0, "x")], epoch=0)
    _apply(spark, t, [("U", "A", 0, 2, 1, 5, 2.0, None)], epoch=1)
    assert _apply(spark, t, [("U", "A", 0, 2, 1, 5, 2.0, None)],
                  epoch=1)["skipped"]
    assert _state(t.read(spark)) == {("A", 0): (10, 2.0, "x")}
