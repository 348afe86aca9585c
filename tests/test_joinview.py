"""Incrementally-maintained join views (streaming/joinview.py).

Invariant under every scenario: JoinView.read() after tick() equals the
one-shot fact JOIN dim over both sources' final resolved state —
including join-key movers (tombstone in the old bucket, fresh row in
the new), dim-update fan-out, dim deletes under left (NULL-extended)
and inner (row vanishes) semantics, fact deletes, and crash redelivery
of a pending tick (pinned versions + epoch gate)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from cdcrypt.operators.dedup import resolve_latest_agg
from cdcrypt.operators.merge import merge_upsert
from cdcrypt.streaming.joinview import JoinView, JoinViewError
from cdcrypt.table.lake import LakeTable

FACT = StructType([
    StructField("event_id", LongType(), False),
    StructField("user_id", LongType(), True),
    StructField("val", LongType(), True),
    StructField("op_seq", LongType(), True),
])
DIM = StructType([
    StructField("user_id", LongType(), False),
    StructField("seg", StringType(), True),
    StructField("op_seq", LongType(), True),
])


def _apply(spark, t, rows, schema_str, epoch):
    df = spark.createDataFrame(rows, schema_str)
    merge_upsert(spark, t, resolve_latest_agg(df, key_cols=t.key_cols),
                 epoch=epoch, mode="mor")


def _fact(spark, tmp_path, rows, epoch=1):
    t = LakeTable.create(str(tmp_path / "fact"), FACT, bucket_count=4,
                         bucket_by="user_id", key_cols=["event_id"])
    _apply(spark, t, rows,
           "op string, event_id long, user_id long, val long, "
           "op_seq long, epoch long", epoch)
    return t


def _dim(spark, tmp_path, rows, epoch=1):
    t = LakeTable.create(str(tmp_path / "dim"), DIM, bucket_count=4,
                         bucket_by="user_id", key_cols=["user_id"])
    _apply(spark, t, rows,
           "op string, user_id long, seg string, op_seq long, epoch long",
           epoch)
    return t


def _expected(spark, fact, dim, how):
    f = fact.read(spark).select("event_id", "user_id", "val")
    d = dim.read(spark).select(F.col("user_id").alias("u"), "seg")
    j = f.join(d, f["user_id"] == d["u"], how).drop("u")
    return {tuple(r) for r in
            j.select("event_id", "user_id", "val", "seg").collect()}


def _got(spark, view):
    return {tuple(r) for r in view.read(spark)
            .select("event_id", "user_id", "val", "seg").collect()}


F1 = [("I", 1, 10, 100, 1, 1), ("I", 2, 10, 200, 2, 1),
      ("I", 3, 20, 300, 3, 1), ("I", 4, 30, 400, 4, 1),
      ("I", 5, 99, 500, 5, 1)]          # user 99 has no dim row
D1 = [("I", 10, "a", 1, 1), ("I", 20, "b", 2, 1), ("I", 30, "c", 3, 1)]


def _setup(spark, tmp_path, how="left"):
    fact = _fact(spark, tmp_path, F1)
    dim = _dim(spark, tmp_path, D1)
    view = JoinView.create(str(tmp_path / "view"), fact, dim,
                           on=("user_id", "user_id"), how=how,
                           bucket_count=4)
    view.bootstrap(spark)
    return fact, dim, view


def test_bootstrap_matches_full_join_left_and_inner(spark, tmp_path):
    for how in ("left", "inner"):
        fact, dim, view = _setup(spark, tmp_path / how, how)
        assert _got(spark, view) == _expected(spark, fact, dim, how)
    # left keeps the dimless fact row, inner does not
    assert (1, 99) not in set()  # documentation marker


def test_fact_changes_tick(spark, tmp_path):
    fact, dim, view = _setup(spark, tmp_path)
    _apply(spark, fact, [
        ("U", 1, 10, 101, 6, 2),    # value update
        ("D", 2, None, None, 7, 2),  # delete
        ("I", 6, 20, 600, 8, 2),    # insert
    ], "op string, event_id long, user_id long, val long, "
       "op_seq long, epoch long", 2)
    info = view.tick(spark)
    assert info is not None and info["tick"] == 2
    assert _got(spark, view) == _expected(spark, fact, dim, "left")
    assert view.tick(spark) is None  # idle


def test_join_key_mover_tombstones_old_bucket(spark, tmp_path):
    fact, dim, view = _setup(spark, tmp_path)
    _apply(spark, fact, [("U", 1, 20, 100, 6, 2)],  # user 10 -> 20
           "op string, event_id long, user_id long, val long, "
           "op_seq long, epoch long", 2)
    view.tick(spark)
    got = _got(spark, view)
    assert got == _expected(spark, fact, dim, "left")
    assert (1, 20, 100, "b") in got and (1, 10, 100, "a") not in got


def test_dim_update_fans_out(spark, tmp_path):
    fact, dim, view = _setup(spark, tmp_path)
    _apply(spark, dim, [("U", 10, "A2", 4, 2)],
           "op string, user_id long, seg string, op_seq long, epoch long",
           2)
    view.tick(spark)
    got = _got(spark, view)
    assert got == _expected(spark, fact, dim, "left")
    # both user-10 fact rows re-enriched
    assert (1, 10, 100, "A2") in got and (2, 10, 200, "A2") in got


def test_dim_delete_left_nulls_inner_vanishes(spark, tmp_path):
    for how in ("left", "inner"):
        fact, dim, view = _setup(spark, tmp_path / how, how)
        _apply(spark, dim, [("D", 20, None, 4, 2)],
               "op string, user_id long, seg string, op_seq long, "
               "epoch long", 2)
        view.tick(spark)
        got = _got(spark, view)
        assert got == _expected(spark, fact, dim, how)
        if how == "left":
            assert (3, 20, 300, None) in got
        else:
            assert all(r[0] != 3 for r in got)


def test_both_sides_change_one_tick(spark, tmp_path):
    fact, dim, view = _setup(spark, tmp_path)
    _apply(spark, fact, [("U", 3, 30, 301, 6, 2), ("D", 5, None, None, 7, 2)],
           "op string, event_id long, user_id long, val long, "
           "op_seq long, epoch long", 2)
    _apply(spark, dim, [("U", 30, "c2", 4, 2), ("I", 99, "z", 5, 2)],
           "op string, user_id long, seg string, op_seq long, epoch long",
           2)
    view.tick(spark)
    assert _got(spark, view) == _expected(spark, fact, dim, "left")


def test_crash_redelivery_is_exactly_once(spark, tmp_path):
    fact, dim, view = _setup(spark, tmp_path)
    _apply(spark, fact, [("U", 1, 10, 111, 6, 2)],
           "op string, event_id long, user_id long, val long, "
           "op_seq long, epoch long", 2)
    view.tick(spark)
    want = _got(spark, view)
    # simulate a crash AFTER the merge committed but BEFORE the offsets
    # advanced: restore the pre-tick state file with the pending marker
    st = json.load(open(view._state_path))
    crashed = {"fact_last": 1, "dim_last": 1, "tick": 1,
               "pending": {"a_to": st["fact_last"],
                           "b_to": st["dim_last"], "tick": 2}}
    with open(view._state_path, "w") as f:
        json.dump(crashed, f)
    info = JoinView(view.root).tick(spark)  # fresh handle, replays pending
    assert info is not None and info["tick"] == 2
    assert info["merge"].get("skipped") is True  # epoch gate absorbed it
    assert _got(spark, view) == want


def test_create_validations(spark, tmp_path):
    fact = _fact(spark, tmp_path, F1)
    dim = _dim(spark, tmp_path, D1)
    with pytest.raises(JoinViewError, match="how"):
        JoinView.create(str(tmp_path / "v1"), fact, dim,
                        on=("user_id", "user_id"), how="full")
    bad_dim = LakeTable.create(str(tmp_path / "d2"), DIM, bucket_count=2,
                               bucket_by="user_id",
                               key_cols=["user_id", "seg"])
    with pytest.raises(JoinViewError, match="key_cols"):
        JoinView.create(str(tmp_path / "v2"), fact, bad_dim,
                        on=("user_id", "user_id"))
    clash = LakeTable.create(
        str(tmp_path / "d3"),
        StructType([StructField("user_id", LongType(), False),
                    StructField("val", StringType(), True),
                    StructField("op_seq", LongType(), True)]),
        bucket_count=2, bucket_by="user_id", key_cols=["user_id"])
    with pytest.raises(JoinViewError, match="collision"):
        JoinView.create(str(tmp_path / "v3"), fact, clash,
                        on=("user_id", "user_id"))


def test_run_polls_until_idle(spark, tmp_path):
    fact, dim, view = _setup(spark, tmp_path)
    _apply(spark, fact, [("U", 1, 10, 150, 6, 2)],
           "op string, event_id long, user_id long, val long, "
           "op_seq long, epoch long", 2)
    _apply(spark, dim, [("U", 20, "b2", 4, 2)],
           "op string, user_id long, seg string, op_seq long, epoch long",
           2)
    out = view.run(spark, poll_interval_s=0.01, idle_ticks_to_stop=2)
    assert len(out) == 1 and out[0]["tick"] == 2
    assert _got(spark, view) == _expected(spark, fact, dim, "left")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        view.run(spark)


def test_bootstrap_requires_empty_view(spark, tmp_path):
    fact, dim, view = _setup(spark, tmp_path)
    with pytest.raises(JoinViewError, match="empty view"):
        view.bootstrap(spark)
