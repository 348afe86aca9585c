"""TxnAligner: transaction-boundary-consistent CDC apply.

The reference consumes Debezium-shaped streams (reference README.md:20);
Debezium's transaction block (id + event count) is the source contract
these tests exercise: no reader may ever observe a half-applied source
transaction, across epoch boundaries, duplicates, crashes, and schema
evolution.
"""
from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cdcrypt.streaming.txn import TxnAligner


def _ev(op_seq, txn_id, txn_total, v=None):
    return Row(op_seq=op_seq, txn_id=txn_id, txn_total=txn_total,
               v=v if v is not None else f"v{op_seq}")


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "op_seq long, txn_id string, txn_total long, v string")


def _seqs(df):
    return sorted(r.op_seq for r in df.select("op_seq").collect())


def test_complete_txn_releases_same_epoch(spark, tmp_path):
    al = TxnAligner(str(tmp_path))
    out = al.align(spark, _batch(spark, [
        _ev(1, "t1", 2), _ev(2, "t1", 2), _ev(3, None, None)]), epoch=0)
    assert _seqs(out) == [1, 2, 3]
    assert al.last_pending_rows == 0
    assert "txn_id" not in out.columns  # drop_meta default


def test_straddling_txn_held_then_released(spark, tmp_path):
    al = TxnAligner(str(tmp_path))
    e0 = al.align(spark, _batch(spark, [
        _ev(1, "t1", 3), _ev(2, "t1", 3), _ev(10, None, None)]), epoch=0)
    # the incomplete txn is invisible; untagged passes through
    assert _seqs(e0) == [10]
    assert al.last_pending_rows == 2
    e1 = al.align(spark, _batch(spark, [
        _ev(3, "t1", 3), _ev(11, None, None)]), epoch=1)
    # completion releases held members AND the completing event together
    assert _seqs(e1) == [1, 2, 3, 11]
    assert al.last_pending_rows == 0


def test_duplicate_deliveries_count_once(spark, tmp_path):
    al = TxnAligner(str(tmp_path))
    # two deliveries of op_seq 1 must not satisfy a 2-event txn
    e0 = al.align(spark, _batch(spark, [
        _ev(1, "t1", 2), _ev(1, "t1", 2)]), epoch=0)
    assert _seqs(e0) == []
    e1 = al.align(spark, _batch(spark, [_ev(2, "t1", 2)]), epoch=1)
    # all three delivered rows (incl. the duplicate) release on completion
    assert _seqs(e1) == [1, 1, 2]


def test_late_duplicate_of_released_txn(spark, tmp_path):
    al = TxnAligner(str(tmp_path))
    e0 = al.align(spark, _batch(spark, [
        _ev(1, "t1", 2), _ev(2, "t1", 2)]), epoch=0)
    assert _seqs(e0) == [1, 2]
    # straggler redelivery one epoch later: retired-window path releases it
    # immediately instead of pending it forever (1 seen < 2 total)
    e1 = al.align(spark, _batch(spark, [_ev(2, "t1", 2)]), epoch=1)
    assert _seqs(e1) == [2]
    assert al.last_pending_rows == 0
    # ... but only within retire_window epochs: beyond it, the straggler
    # pends (operator flush case, like a dead producer)
    e3 = al.align(spark, _batch(spark, [_ev(1, "t1", 2)]), epoch=3)
    assert _seqs(e3) == []
    assert al.last_pending_rows == 1


def test_epoch_replay_is_idempotent(spark, tmp_path):
    al = TxnAligner(str(tmp_path))
    al.align(spark, _batch(spark, [_ev(1, "t1", 2)]), epoch=0)
    b1 = _batch(spark, [_ev(2, "t1", 2), _ev(5, "t2", 2)])
    first = _seqs(al.align(spark, b1, epoch=1))
    # crash after align, before table commit: epoch 1 replays — identical
    # release set, pending state overwritten in place
    replay = _seqs(al.align(spark, b1, epoch=1))
    assert first == replay == [1, 2]
    assert al.last_pending_rows == 1  # t2 still waiting both times
    e2 = al.align(spark, _batch(spark, [_ev(6, "t2", 2)]), epoch=2)
    assert _seqs(e2) == [5, 6]


def test_flush_returns_held_rows(spark, tmp_path):
    al = TxnAligner(str(tmp_path))
    al.align(spark, _batch(spark, [_ev(1, "tdead", 5)]), epoch=0)
    held = al.flush(spark, epoch=0)
    assert _seqs(held) == [1]
    assert "txn_id" not in held.columns
    assert al.flush(spark, epoch=7) is None


def test_missing_txn_columns_raise(spark, tmp_path):
    al = TxnAligner(str(tmp_path))
    df = spark.range(3).select(F.col("id").alias("op_seq"))
    with pytest.raises(ValueError, match="lacks"):
        al.align(spark, df, epoch=0)


def test_pending_survives_schema_evolution(spark, tmp_path):
    # pending persisted WITHOUT the evolved column unions against a batch
    # WITH it (null-filled), the lake's P7 read contract
    al = TxnAligner(str(tmp_path))
    al.align(spark, _batch(spark, [_ev(1, "t1", 2)]), epoch=0)
    evolved = spark.createDataFrame(
        [Row(op_seq=2, txn_id="t1", txn_total=2, v="v2", model="m-a")],
        "op_seq long, txn_id string, txn_total long, v string, model string")
    out = al.align(spark, evolved, epoch=1)
    rows = {r.op_seq: r.model for r in out.collect()}
    assert sorted(rows) == [1, 2]
    assert rows[1] is None and rows[2] == "m-a"


def test_generator_txn_tagging(tmp_path):
    # txn_ratio > 0 emits consistent Debezium metadata; default emits none
    import numpy as np

    from cdcrypt.sources.changegen import GenSpec, generate_change_events

    cols = generate_change_events(GenSpec(n_convs=40, n_epochs=4,
                                          txn_ratio=0.6, seed=9))
    assert "txn_id" in cols and "txn_total" in cols
    tid, tot, seq = cols["txn_id"], cols["txn_total"], cols["op_seq"]
    tagged = np.array([t is not None for t in tid])
    assert 0.2 < tagged.mean() < 0.9
    # per txn: total is constant and equals the distinct-op_seq count,
    # and the member op_seqs are contiguous (consecutive logical runs)
    by_txn: dict = {}
    for i in np.flatnonzero(tagged):
        by_txn.setdefault(tid[i], []).append(i)
    assert by_txn
    for t, idxs in by_txn.items():
        totals = {int(tot[i]) for i in idxs}
        assert len(totals) == 1
        seqs = sorted({int(seq[i]) for i in idxs})
        assert len(seqs) == totals.pop()
        assert seqs == list(range(seqs[0], seqs[-1] + 1))
    # straddling txns exist (the hold-and-release case is exercised)
    ep = cols["epoch"]
    straddle = sum(
        1 for idxs in by_txn.values()
        if len({int(ep[i]) for i in idxs}) > 1)
    assert straddle > 0
    # default: no txn columns at all
    base = generate_change_events(GenSpec(n_convs=10, seed=9))
    assert "txn_id" not in base


def test_pipeline_e2e_txn_boundary_consistency(spark, tmp_path):
    """Full ingest with aligner: after EVERY epoch commit, the table holds
    only complete transactions; final state equals the no-aligner run
    (alignment changes visibility timing, never the converged table)."""
    from cdcrypt.sources.changegen import GenSpec, generate_to_dir
    from cdcrypt.streaming.pipeline import IngestPipeline
    from cdcrypt.table.lake import LakeTable

    src = str(tmp_path / "src")
    spec = GenSpec(n_convs=60, n_epochs=4, txn_ratio=0.5, dup_ratio=0.04,
                   seed=11)
    generate_to_dir(src, spec)
    events = spark.read.parquet(os.path.join(src, "*.parquet"))

    def run(root, aligner):
        pipe = IngestPipeline(
            source_dir=src, table_root=root,
            checkpoint_dir=root + "_ckpt", bucket_count=4,
            crypto_backend="jvm", aligner=aligner)
        lineages = pipe.run(spark)
        return pipe, lineages

    al = TxnAligner(str(tmp_path / "txn_state"))
    pipe_a, lin_a = run(str(tmp_path / "aligned"), al)
    pipe_b, _ = run(str(tmp_path / "plain"), None)
    assert all("txn_pending_rows" in ln for ln in lin_a)
    assert any(ln["txn_pending_rows"] > 0 for ln in lin_a), \
        "fixture must exercise holdback"

    ta = LakeTable(str(tmp_path / "aligned"))
    tb = LakeTable(str(tmp_path / "plain"))

    # invariant: at every committed snapshot, no transaction is partially
    # visible — the member count of every txn with ANY visible member
    # equals its txn_total (visible = survived LWW/delete, so compare
    # against events: a txn member superseded by a later op is still
    # "applied"; check APPLIED op_seqs, via the changelog of raw applies).
    txn_of = {r.op_seq: (r.txn_id, r.txn_total)
              for r in events.where(F.col("txn_id").isNotNull())
              .select("op_seq", "txn_id", "txn_total").distinct().collect()}
    max_eps = sorted({ln["epoch"] for ln in lin_a})
    for v in range(1, ta.version + 1):
        snap = ta.snapshot_at(v)
        ep = snap["committed_epoch"]
        if ep is None:
            continue
        # released set per the aligner = all op_seqs in source epochs <= ep
        # minus rows still pending at ep
        pend = al.read_pending(spark, ep)
        pend_seqs = (set() if pend is None
                     else {r.op_seq for r in
                           pend.select("op_seq").collect()})
        applied = {s for s, e in
                   ((r.op_seq, r.epoch) for r in
                    events.select("op_seq", "epoch").distinct().collect())
                   if e <= ep} - pend_seqs
        seen_per_txn: dict = {}
        for s in applied:
            if s in txn_of:
                t, tot = txn_of[s]
                seen_per_txn.setdefault((t, tot), set()).add(s)
        for (t, tot), seqs in seen_per_txn.items():
            assert len(seqs) == tot, \
                f"epoch {ep}: txn {t} partially applied ({len(seqs)}/{tot})"
    assert max_eps  # ran epochs

    # convergence: aligned and plain tables agree at the end
    a = ta.read(spark).select("conv_id", "turn_idx", "op_seq").sort(
        "conv_id", "turn_idx")
    b = tb.read(spark).select("conv_id", "turn_idx", "op_seq").sort(
        "conv_id", "turn_idx")
    assert a.collect() == b.collect()
