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


def test_windowed_counts_with_watermark_drops_late_events(
        spark, stream_dir, tmp_path):
    """Tumbling event-time windows + watermark over the CDC stream: windows
    finalize (append mode) as event time advances across micro-batches, and
    redelivered duplicates carrying OLD timestamps (epochs 3-4 of the
    generator) arrive past the watermark and are dropped — streaming counts
    for those windows are strictly below the no-watermark batch counts."""
    from cdcrypt.streaming.windowed import windowed_turn_counts

    schema = infer_stream_schema(stream_dir)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(os.path.join(stream_dir, "*.parquet")))
    agg = windowed_turn_counts(stream, "1 minute", "10 seconds")
    q = (agg.writeStream.format("memory").queryName("win_counts")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "wm_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.win_start, r.role): r.n_events
           for r in spark.table("win_counts").collect()}
    batch = windowed_turn_counts(
        spark.read.schema(schema).parquet(
            os.path.join(stream_dir, "*.parquet")), "1 minute", "10 seconds")
    exp = {(r.win_start, r.role): r.n_events for r in batch.collect()}
    assert got, "no window finalized"
    # a finalized window can only have MISSED late rows, never invented them
    assert all(exp[k] >= v for k, v in got.items())
    # punctual windows agree exactly; late-heavy ones show real drops
    assert any(exp[k] == v for k, v in got.items())
    assert any(exp[k] > v for k, v in got.items()), \
        "generator guarantees late redeliveries; none were dropped"


def test_stateful_sessions_accumulate_across_batches(
        spark, stream_dir, tmp_path):
    """applyInPandasWithState: per-conversation running summaries emitted in
    update mode; the LAST emission per conversation equals the batch
    ground truth (state really accumulated across micro-batches)."""
    from pyspark.sql import functions as F

    from cdcrypt.streaming.windowed import conversation_sessions

    schema = infer_stream_schema(stream_dir)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "2")
              .parquet(os.path.join(stream_dir, "*.parquet")))
    q = (conversation_sessions(stream)
         .writeStream.format("memory").queryName("sessions")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "st_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    emitted = spark.table("sessions").collect()
    # multiple emissions per conv across batches -> state crossed batches
    assert len(emitted) > len({r.conv_id for r in emitted})
    last = {}
    for r in emitted:     # memory sink preserves arrival order per batch
        last[r.conv_id] = r
    src = spark.read.schema(schema).parquet(
        os.path.join(stream_dir, "*.parquet"))
    exp = {r.conv_id: r for r in src.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"),
        F.max("op_seq").alias("max_op_seq")).collect()}
    assert set(last) == set(exp)
    for cid, r in last.items():
        e = exp[cid]
        assert (r.n_turns, r.first_ts, r.last_ts, r.max_op_seq) == \
            (e.n_turns, e.first_ts, e.last_ts, e.max_op_seq), cid


def test_track_session_tolerates_null_ts_and_op_seq():
    """NaT ts must not corrupt first_ts via the int64-min view and an
    all-null op_seq chunk must not raise ValueError (ADVICE r2)."""
    import pandas as pd

    from cdcrypt.streaming.windowed import _track_session

    class FakeState:
        exists = False

        def update(self, v):
            self.value = v

    st = FakeState()
    pdf = pd.DataFrame({
        "ts": pd.to_datetime([None, "2026-01-02 03:04:05", None]),
        "op_seq": pd.array([None, None, None], dtype="Int64"),
    })
    out = next(_track_session(("c1",), iter([pdf]), st))
    assert out.loc[0, "n_turns"] == 3
    assert out.loc[0, "first_ts"] == pd.Timestamp("2026-01-02 03:04:05")
    assert out.loc[0, "last_ts"] == pd.Timestamp("2026-01-02 03:04:05")
    n, first_us, last_us, mx = st.value
    assert n == 3 and mx is None and first_us == last_us

    # all-null ts chunk: bounds stay None, emission NaT, no exception
    st2 = FakeState()
    pdf2 = pd.DataFrame({"ts": pd.to_datetime([pd.NaT, pd.NaT]),
                         "op_seq": pd.array([None, 7], dtype="Int64")})
    out2 = next(_track_session(("c2",), iter([pdf2]), st2))
    assert pd.isna(out2.loc[0, "first_ts"])
    assert st2.value == (2, None, None, 7)


def test_session_windows_batch_gap_semantics(spark):
    """Batch sessionization (streaming/windowed.py session_windows): gap
    boundary is STRICTLY greater-than (diff == gap stays in-session), null
    ts rows are excluded, ordinals are 1-based per key, and the whole op
    costs ONE exchange (the agg reuses the window's hash clustering)."""
    from datetime import datetime, timedelta, timezone

    from cdcrypt.streaming.windowed import session_windows

    def dt(s):
        return datetime(2024, 1, 1) + timedelta(seconds=s)

    rows = [
        ("u1", 1, dt(0)),
        ("u1", 2, dt(10)),
        ("u1", 3, dt(40)),   # 30s after prev == gap -> same session
        ("u1", 4, dt(71)),   # 31s after prev  > gap -> new session
        ("u2", 5, dt(0)),
        ("u2", 6, None),     # null ts: excluded, not a session of its own
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, ts timestamp")
    out = session_windows(df, gap_seconds=30, key_cols=("user_id",),
                          ts_col="ts", tiebreak_cols=("event_id",))

    def us(s):
        base = datetime(2024, 1, 1, tzinfo=timezone.utc) + timedelta(seconds=s)
        return int(base.timestamp()) * 1_000_000

    got = {(r.user_id, r.session_idx): (r.n_events, r.start_us, r.end_us)
           for r in out.collect()}
    assert got == {
        ("u1", 1): (3, us(0), us(40)),
        ("u1", 2): (1, us(71), us(71)),
        ("u2", 1): (1, us(0), us(0)),
    }
    # AQE's toString appends the initial plan after the final one — count
    # exchanges in the final-plan section only
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1, plan


def test_structured_stream_with_txn_alignment_converges(spark, tmp_path):
    """TxnAligner under the SS runtime: misaligned micro-batches (batch ids
    != generator epochs) still satisfy the aligner's contiguous-epoch
    contract via SS batch ids; no snapshot exposes a partial transaction,
    pending stragglers drain across batches, and the final decrypted
    state equals the txn-free oracle (alignment changes visibility
    timing, never convergence)."""
    from pyspark.sql import functions as F

    from cdcrypt.streaming.txn import TxnAligner

    src = str(tmp_path / "src")
    generate_to_dir(src, GenSpec(n_convs=60, avg_turns=4, n_epochs=5,
                                 txn_ratio=0.6, dup_ratio=0.04, seed=31))
    troot, ckpt = str(tmp_path / "t"), str(tmp_path / "c")
    al = TxnAligner(str(tmp_path / "txn_state"))
    ing = StructuredIngest(src, troot, ckpt, key_id=KEY, bucket_count=4,
                           aligner=al)
    schema = infer_stream_schema(src)
    assert "txn_id" in schema.fieldNames()
    ing.run_stream(spark, schema, available_now=True,
                   max_files_per_trigger=1)
    t = LakeTable(troot)
    assert t.committed_epoch >= 1  # misaligned batches happened

    # per-snapshot invariant: every txn with ANY applied member is fully
    # applied (applied = source op_seqs of batches <= snapshot's epoch,
    # minus rows the aligner still held at that batch)
    ev = spark.read.schema(schema).parquet(os.path.join(src, "*.parquet"))
    txn_of = {r.op_seq: (r.txn_id, r.txn_total)
              for r in ev.where(F.col("txn_id").isNotNull())
              .select("op_seq", "txn_id", "txn_total").distinct().collect()}
    held_any = False
    for v in range(1, t.version + 1):
        ep = t.snapshot_at(v)["committed_epoch"]
        if ep is None:
            continue
        pend = al.read_pending(spark, ep)
        pend_seqs = (set() if pend is None else
                     {r.op_seq for r in pend.select("op_seq").collect()})
        held_any = held_any or bool(pend_seqs)
        # released through batch ep = everything the stream delivered in
        # batches 0..ep minus pending; batch composition is SS-internal,
        # so recover it from the aligner's own released/pending closure:
        # a txn is applied iff at least one member op_seq is in the table
        # changelog up to this snapshot. Simpler and implementation-
        # independent: read the table AT v and check member counts of
        # every txn with a visible member (visible rows carry op_seq).
        seen: dict = {}
        for r in t.read(spark, version=v).select("op_seq").collect():
            if r.op_seq in txn_of:
                tid, tot = txn_of[r.op_seq]
                seen.setdefault((tid, tot), set()).add(r.op_seq)
        for (tid, tot), seqs in seen.items():
            # a txn member may be LWW-superseded by a later op within the
            # same released set, so "visible count == total" is too strong;
            # instead assert NO txn is visible while the aligner still
            # holds one of its members
            assert not (seqs & pend_seqs), \
                f"snapshot {v}: txn {tid} visible while members pending"
    assert held_any, "fixture must exercise holdback under SS"

    # convergence vs the no-txn manual pipeline on the same stream
    from cdcrypt.streaming.pipeline import IngestPipeline

    plain = IngestPipeline(
        source_dir=src, table_root=str(tmp_path / "p"),
        checkpoint_dir=str(tmp_path / "pc"), bucket_count=4, key_id=KEY)
    plain.run(spark)
    cols = ["conv_id", "turn_idx", "op_seq"]
    a = sorted(tuple(r) for r in t.read(spark).select(*cols).collect())
    b = sorted(tuple(r) for r in LakeTable(str(tmp_path / "p"))
               .read(spark).select(*cols).collect())
    assert a == b and len(a) > 0


def test_structured_integrity_audit_sink(spark, stream_dir, tmp_path):
    troot, ckpt = str(tmp_path / "iat"), str(tmp_path / "iac")
    adir = str(tmp_path / "ianom")
    ing = StructuredIngest(stream_dir, troot, ckpt, key_id=KEY,
                           bucket_count=8, integrity_audit=True,
                           integrity_audit_dir=adir)
    ing.run_stream(spark, infer_stream_schema(stream_dir),
                   available_now=True, max_files_per_trigger=2)
    n_batches = LakeTable(troot).committed_epoch + 1
    # one anomaly dir per micro-batch, written before each commit
    dirs = sorted(os.listdir(adir))
    assert dirs == [f"epoch={i:06d}" for i in range(n_batches)]
    audited = spark.read.parquet(*[os.path.join(adir, d) for d in dirs])
    assert set(audited.columns) == {"conv_id", "turn_idx", "op_seq", "kind"}
    # the generator redelivers events across epochs but positions are
    # unique within one delivery batch here; the tap must be silent, not
    # full of false positives
    assert audited.where("kind = 'conflict'").count() == 0

    # lineage-only mode is a config error under SS (no lineage JSON)
    bad = StructuredIngest(stream_dir, str(tmp_path / "x"),
                           str(tmp_path / "xc"), key_id=KEY,
                           bucket_count=8, integrity_audit=True)
    with pytest.raises(Exception, match="integrity_audit_dir"):
        bad.run_stream(spark, infer_stream_schema(stream_dir),
                       available_now=True, max_files_per_trigger=2)
