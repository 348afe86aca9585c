"""Incrementally-maintained GROUP BY views (streaming/aggview.py).

The invariant under every scenario: AggView.read() after draining the
changelog feed equals a one-shot GROUP BY over the source table's final
resolved state — including groups rows MOVE between (retraction +
addition), groups that empty out (tombstoned, filtered), SQL NULL
semantics (SUM of an all-NULL group is NULL; COUNT(col) skips NULLs;
NULL group values group together), and crash redelivery (epoch gate).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

from cdcrypt.operators.dedup import resolve_latest_agg
from cdcrypt.operators.merge import merge_upsert
from cdcrypt.streaming.aggview import AggView, AggViewError
from cdcrypt.streaming.changefeed import ChangeFeedStream
from cdcrypt.table.lake import LakeTable

SCHEMA = StructType([
    StructField("conv_id", StringType(), False),
    StructField("turn_idx", IntegerType(), False),
    StructField("src", StringType(), True),
    StructField("score", LongType(), True),
    StructField("op_seq", LongType(), True),
])

# (epoch, op, conv, turn, src, score, op_seq) — exercises: updates that
# change the aggregated value, updates that MOVE a row between groups,
# deletes, a group that empties out ('gone'), NULL scores (an all-NULL
# group 'nulls'), a NULL group value, and a re-insert after delete.
EVENTS = [
    (0, "I", "c0", 0, "web", 10, 1),
    (0, "I", "c0", 1, "web", 20, 2),
    (0, "I", "c1", 0, "app", 5, 3),
    (0, "I", "c2", 0, "gone", 7, 4),
    (0, "I", "c3", 0, "nulls", None, 5),
    (1, "U", "c0", 1, "app", 21, 6),    # moves web -> app, new score
    (1, "U", "c1", 0, "app", 6, 7),     # in-group value change
    (1, "D", "c2", 0, None, None, 8),   # 'gone' empties
    (1, "I", "c4", 0, None, 3, 9),      # NULL group value
    (2, "U", "c0", 0, "web", 11, 10),
    (2, "I", "c2", 0, "app", None, 11),  # re-insert, NULL score
    (2, "I", "c3", 1, "nulls", None, 12),
]

AGGS = {
    "n": ("count", "*"),
    "n_scores": ("count", "score"),
    "total": ("sum", "score"),
    "mean": ("avg", "score"),
}


def _batch(spark, epoch):
    rows = [(op, c, t, s, sc, q, epoch)
            for (e, op, c, t, s, sc, q) in EVENTS if e == epoch]
    return spark.createDataFrame(
        rows, "op string, conv_id string, turn_idx int, src string, "
              "score long, op_seq long, epoch long")


def _make_source(spark, tmp_path, epochs=3):
    t = LakeTable.create(str(tmp_path / "a"), SCHEMA, bucket_count=4)
    for e in range(epochs):
        merge_upsert(spark, t, resolve_latest_agg(_batch(spark, e)),
                     epoch=e, mode="mor")
    return t


def _make_view(tmp_path, aggs=AGGS, group_cols=("src",)):
    return AggView.create(str(tmp_path / "view"), SCHEMA,
                          list(group_cols), aggs, bucket_count=4)


def _feed(spark, src, view, tmp_path, name="ck", **kw):
    return ChangeFeedStream(spark, src.root, str(tmp_path / name),
                            view.sink(), feed="changelog", **kw)


def _batch_groupby(spark, table):
    """The one-shot oracle: GROUP BY over the final resolved state."""
    return {
        r["src"]: (r["n"], r["n_scores"], r["total"], r["mean"])
        for r in table.read(spark).groupBy("src").agg(
            F.count(F.lit(1)).alias("n"),
            F.count("score").alias("n_scores"),
            F.sum("score").alias("total"),
            F.avg("score").alias("mean")).collect()
    }


def _view_state(spark, view):
    return {r["src"]: (r["n"], r["n_scores"], r["total"], r["mean"])
            for r in view.read(spark).collect()}


def test_view_matches_batch_groupby(spark, tmp_path):
    a = _make_source(spark, tmp_path)
    view = _make_view(tmp_path)
    feed = _feed(spark, a, view, tmp_path, max_versions_per_batch=1)
    batches = feed.process_available()
    assert len(batches) >= 3  # one window per version

    got = _view_state(spark, view)
    want = _batch_groupby(spark, a)
    assert got == want
    # the emptied group is tombstoned out, not served as a zero row
    assert "gone" not in got
    # SQL NULL semantics survived the incremental path
    assert got["nulls"] == (2, 0, None, None)
    assert None in got  # NULL group value is a group
    # integer sums are exact, avg is one final division
    assert got["app"] == (3, 2, 27, 13.5)


def test_view_equals_one_window_drain(spark, tmp_path):
    """Chunked (per-version) and single catch-up windows converge to the
    same state — delta folding is batching-invariant."""
    a = _make_source(spark, tmp_path)
    chunked = _make_view(tmp_path)
    _feed(spark, a, chunked, tmp_path, name="ck1",
          max_versions_per_batch=1).process_available()
    oneshot = AggView.create(str(tmp_path / "view2"), SCHEMA, ["src"], AGGS,
                             bucket_count=4)
    _feed(spark, a, oneshot, tmp_path, name="ck2").process_available()
    assert _view_state(spark, chunked) == _view_state(spark, oneshot)


def test_redelivered_window_is_noop(spark, tmp_path):
    a = _make_source(spark, tmp_path)
    view = _make_view(tmp_path)
    feed = _feed(spark, a, view, tmp_path)
    feed.process_available()
    before = _view_state(spark, view)
    # crash-redelivery: replay the final window straight into the sink —
    # the lake's epoch gate must skip it (a double-applied delta would
    # double-count, which is exactly what the gate prevents)
    changes = a.read_changelog(spark, a.version - 1, a.version)
    out = view.sink()(spark, changes, a.version - 1, a.version)
    assert out.get("skipped") is True
    assert _view_state(spark, view) == before


def test_group_by_key_column(spark, tmp_path):
    """Group columns may be source KEY columns (top-level in the images,
    identical on both sides) — here per-conversation turn counts."""
    a = _make_source(spark, tmp_path)
    view = AggView.create(
        str(tmp_path / "view"), SCHEMA, ["conv_id"],
        {"turns": ("count", "*"), "total": ("sum", "score")}, bucket_count=4)
    _feed(spark, a, view, tmp_path).process_available()
    got = {r["conv_id"]: (r["turns"], r["total"])
           for r in view.read(spark).collect()}
    want = {r["conv_id"]: (r["turns"], r["total"])
            for r in a.read(spark).groupBy("conv_id").agg(
                F.count(F.lit(1)).alias("turns"),
                F.sum("score").alias("total")).collect()}
    assert got == want


def test_create_refusals(spark, tmp_path):
    with pytest.raises(AggViewError, match="merge_engine='aggregate'"):
        _make_view(tmp_path, aggs={"m": ("max", "score")})
    with pytest.raises(AggViewError, match="not in"):
        _make_view(tmp_path, aggs={"x": ("sum", "nope")})
    with pytest.raises(AggViewError, match="numeric"):
        _make_view(tmp_path, aggs={"x": ("sum", "src")})
    with pytest.raises(AggViewError, match="group column"):
        _make_view(tmp_path, group_cols=("nope",))
    with pytest.raises(AggViewError, match="row count"):
        _make_view(tmp_path, group_cols=("src",),
                   aggs={"x": ("count", "src")})


def test_sink_requires_changelog_feed(spark, tmp_path):
    a = _make_source(spark, tmp_path)
    view = _make_view(tmp_path)
    feed = ChangeFeedStream(spark, a.root, str(tmp_path / "ck"),
                            view.sink(), feed="raw")
    with pytest.raises(AggViewError, match="feed='changelog'"):
        feed.process_available()


def test_bootstrap_then_incremental_equals_full_replay(spark, tmp_path):
    """Attaching a view to an EXISTING table: one aggregation scan over
    the current state (no history replay), then the feed continues from
    the pinned version — final state equals a from-zero replay."""
    a = _make_source(spark, tmp_path, epochs=2)  # pre-attach history
    view = _make_view(tmp_path)
    pinned = view.bootstrap(spark, a)
    assert pinned == a.version
    # source advances after the bootstrap scan
    merge_upsert(spark, a, resolve_latest_agg(_batch(spark, 2)),
                 epoch=2, mode="mor")
    feed = _feed(spark, a, view, tmp_path, start_version=pinned,
                 max_versions_per_batch=1)
    feed.process_available()
    assert _view_state(spark, view) == _batch_groupby(spark, a.refresh())

    # a torn bootstrap re-run is refused (the view now has state)
    with pytest.raises(AggViewError, match="double-count"):
        view.bootstrap(spark, a)


def test_bootstrap_epoch_gate_makes_rerun_noop(spark, tmp_path):
    """Crash between the seed merge and the caller recording the pinned
    version: the re-run's merge is skipped by the epoch gate."""
    a = _make_source(spark, tmp_path, epochs=2)
    view = _make_view(tmp_path)
    view.bootstrap(spark, a)
    before = _view_state(spark, view)
    # simulate the retry path the epoch gate exists for
    from cdcrypt.operators.merge import merge_upsert as mu
    out = mu(spark, view.table.refresh(),
             view.table.refresh().read(spark).limit(0), epoch=a.version,
             mode="mor")
    assert out.get("skipped") is True
    assert _view_state(spark, view) == before
