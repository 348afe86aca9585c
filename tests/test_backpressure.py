"""Adaptive micro-batch sizing (streaming/backpressure.py +
IngestPipeline.run_adaptive).

Correctness frame: the batch-misalignment invariant (resolution is a pure
function of (key, op_seq)) means ANY grouping of source epochs into
commits converges to the same table — so the adaptive loop must produce a
final state identical to the per-epoch loop, while committing fewer,
larger batches. Controller behavior itself is pure arithmetic, tested
deterministically with synthetic walls (no wall-clock reads in the
module)."""

from __future__ import annotations

import glob
import json
import os

import pytest

from cdcrypt.sources.changegen import GenSpec, generate_to_dir
from cdcrypt.streaming.backpressure import BatchSizeController
from cdcrypt.streaming.pipeline import IngestPipeline
from cdcrypt.table.lake import LakeTable

KEY = "cdcrypt/transcripts"


# ---------------------------------------------------------------------------
# controller unit tests (pure, no Spark)
# ---------------------------------------------------------------------------


def test_controller_grows_when_under_target():
    c = BatchSizeController(target_sec=10.0, max_size=64)
    # 1 epoch took 0.5s -> projection says 20 fit; AIMD doubles: 1->2->4->8
    assert c.observe(1, 0.5) == 2
    assert c.observe(2, 1.0) == 4
    assert c.observe(4, 2.0) == 8


def test_controller_growth_capped_by_cost_projection():
    c = BatchSizeController(target_sec=10.0, max_size=64)
    # 1 epoch took 6s: doubling would overshoot (12s); projection caps the
    # next size at ceil(10/6) = 2... which equals the AIMD step here, so
    # use a harsher case: 4 epochs took 6s -> per-epoch 1.5s, fit = 7 < 8
    assert c.observe(4, 6.0) == 7


def test_controller_shrinks_when_over_target_and_holds_in_deadband():
    c = BatchSizeController(target_sec=10.0, size=8)
    assert c.observe(8, 25.0) == 4        # over -> halve
    assert c.observe(4, 10.5) == 4        # within +-25% deadband -> hold
    assert c.observe(4, 9.0) == 4         # still inside the deadband
    assert c.observe(4, 30.0) == 2
    assert c.observe(1, 99.0) == 1        # floored at min_size


def test_controller_respects_bounds_and_validates():
    c = BatchSizeController(target_sec=5.0, min_size=2, max_size=6, size=1)
    assert c.size == 2                    # clamped up at construction
    assert c.observe(6, 0.1) == 6         # capped at max_size
    with pytest.raises(ValueError):
        BatchSizeController(target_sec=0)
    with pytest.raises(ValueError):
        BatchSizeController(grow=1.0)
    with pytest.raises(ValueError):
        c.observe(0, 1.0)


def test_controller_state_roundtrip(tmp_path):
    d = str(tmp_path / "ckpt")
    c = BatchSizeController(target_sec=10.0)
    c.observe(1, 0.5)
    c.save(d)
    fresh = BatchSizeController(target_sec=10.0).load(d)
    assert fresh.size == c.size
    assert fresh.last_epoch_sec == c.last_epoch_sec
    # load clamps a persisted size into the NEW controller's bounds
    small = BatchSizeController(target_sec=10.0, max_size=1).load(d)
    assert small.size == 1
    # and an empty dir is a no-op
    assert BatchSizeController().load(str(tmp_path / "nope")).size == 1


def test_files_per_trigger_bridge(tmp_path):
    c = BatchSizeController(size=5)
    assert c.files_per_trigger() == 5
    assert c.files_per_trigger(files_per_epoch=3) == 15
    assert BatchSizeController(size=1).files_per_trigger() == 1


# ---------------------------------------------------------------------------
# pipeline integration
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bp_changes"))
    generate_to_dir(d, GenSpec(n_convs=40, avg_turns=6, n_epochs=5, seed=23))
    return d


def _pipe(stream_dir, base, name):
    return IngestPipeline(
        stream_dir, os.path.join(base, f"t_{name}"),
        os.path.join(base, f"c_{name}"), key_id=KEY, bucket_count=8)


def _state(spark, root):
    t = LakeTable(root)
    return {tuple(r) for r in t.read(spark).collect()}


def test_adaptive_replay_matches_per_epoch_replay(spark, stream_dir, tmp_path):
    base = str(tmp_path)
    ref = _pipe(stream_dir, base, "ref")
    ref.run(spark)

    ada = _pipe(stream_dir, base, "ada")
    # huge target -> the controller coalesces as fast as AIMD allows:
    # groups [0], [1,2], [3,4] over the 5 source epochs
    results = ada.run_adaptive(spark, target_batch_sec=1e6)
    assert [r["epoch"] for r in results] == [0, 2, 4]
    assert results[1]["epoch_range"] == [1, 2]
    assert results[2]["epoch_range"] == [3, 4]
    assert "epoch_range" not in results[0]         # singleton: unannotated

    # ciphertext is nondeterministic (fresh DEKs/nonces per run), so
    # compare the decrypted final states
    from tests.test_pipeline_e2e import _final_state
    assert (_final_state(spark, os.path.join(base, "t_ada"))
            == _final_state(spark, os.path.join(base, "t_ref")))

    # fewer commits than epochs; exactly-once replay guard still holds
    t = LakeTable(os.path.join(base, "t_ada"))
    assert t.committed_epoch == 4
    assert ada.run_adaptive(spark, target_batch_sec=1e6) == []

    # checkpoint lineage exists per COMMIT (group label), not per epoch
    labels = sorted(int(os.path.basename(p)[6:12]) for p in
                    glob.glob(os.path.join(base, "c_ada", "epoch_*.json")))
    assert labels == [0, 2, 4]
    with open(os.path.join(base, "c_ada", "epoch_000002.json")) as f:
        lin = json.load(f)
    assert lin["epoch_range"] == [1, 2] and lin["batch_epochs"] == 2

    # learned size persisted for the next run / the structured driver
    st = BatchSizeController().load(os.path.join(base, "c_ada"))
    assert st.size >= 2


def test_adaptive_resume_after_partial_run(spark, stream_dir, tmp_path):
    base = str(tmp_path)
    ref = _pipe(stream_dir, base, "ref2")
    ref.run(spark)

    ada = _pipe(stream_dir, base, "res")
    first = ada.run_adaptive(spark, target_batch_sec=1e6, max_batches=1)
    assert len(first) == 1 and first[0]["epoch"] == 0
    # resume from the persisted controller state (size already grew to 2)
    rest = ada.run_adaptive(spark, target_batch_sec=1e6)
    assert [r["epoch"] for r in rest] == [2, 4]
    from tests.test_pipeline_e2e import _final_state
    assert (_final_state(spark, os.path.join(base, "t_res"))
            == _final_state(spark, os.path.join(base, "t_ref2")))


def test_adaptive_group_cut_at_schema_evolution(spark, tmp_path):
    """A group must never straddle the add-column evolution boundary:
    reading post-evolution epochs under the pre-evolution schema would
    silently drop the new column (caught end-to-end before this rule
    existed). 6 epochs evolve at 4 -> AIMD would group [3,4,5]; the era
    cut forces [3] then [4,5], and the final state matches the per-epoch
    loop INCLUDING the evolved column."""
    base = str(tmp_path)
    src = os.path.join(base, "src6")
    generate_to_dir(src, GenSpec(n_convs=60, avg_turns=6, n_epochs=6,
                                 seed=31))
    ref = IngestPipeline(src, os.path.join(base, "t_r6"),
                         os.path.join(base, "c_r6"), key_id=KEY,
                         bucket_count=8)
    ref.run(spark)
    ada = IngestPipeline(src, os.path.join(base, "t_a6"),
                         os.path.join(base, "c_a6"), key_id=KEY,
                         bucket_count=8)
    results = ada.run_adaptive(spark, target_batch_sec=1e6)
    assert [r["epoch"] for r in results] == [0, 2, 3, 5]
    assert results[2].get("epoch_range") is None      # the cut singleton
    assert results[3]["epoch_range"] == [4, 5]
    from tests.test_pipeline_e2e import _final_state
    got = _final_state(spark, os.path.join(base, "t_a6"))
    assert got == _final_state(spark, os.path.join(base, "t_r6"))
    # the evolved column actually made it into the adaptive table
    t = LakeTable(os.path.join(base, "t_a6"))
    assert "model" in t.read(spark).columns


def test_adaptive_shrinks_toward_target(spark, stream_dir, tmp_path):
    """With an impossible target (0s), every batch overshoots and the
    controller must stay at size 1 — the adaptive loop degrades to the
    plain per-epoch loop, never below it."""
    ada = _pipe(stream_dir, str(tmp_path), "tiny")
    results = ada.run_adaptive(spark, target_batch_sec=1e-9)
    assert [r["epoch"] for r in results] == [0, 1, 2, 3, 4]
    assert BatchSizeController().load(
        str(tmp_path / "c_tiny")).size == 1


def test_structured_auto_files_per_trigger(spark, stream_dir, tmp_path):
    """max_files_per_trigger='auto' replays with the learned cap and
    converges to the same state as the default stream."""
    from cdcrypt.streaming.structured import StructuredIngest, infer_stream_schema
    from tests.test_pipeline_e2e import _final_state

    base = str(tmp_path)
    # seed a learned size into the checkpoint dir the stream will use
    ck = os.path.join(base, "c_ss")
    c = BatchSizeController(target_sec=10.0)
    c.observe(1, 0.1)          # size -> 2
    c.save(ck)

    si = StructuredIngest(stream_dir, os.path.join(base, "t_ss"), ck,
                          key_id=KEY, bucket_count=8)
    si.run_stream(spark, infer_stream_schema(stream_dir),
                  max_files_per_trigger="auto")

    ref = _pipe(stream_dir, base, "ssref")
    ref.run(spark)
    assert (_final_state(spark, os.path.join(base, "t_ss"))
            == _final_state(spark, os.path.join(base, "t_ssref")))
