"""Manifest column bounds (Iceberg-style scan planning from file stats).

The writer records per-file [min, max] for the MERGE keys and the
monotone change metadata (op_seq, epoch) straight from the parquet
footer it already opens for num_rows; ``files(key_range=)`` /
``read(key_range=)`` then plan scans from the manifest alone — no file
footers opened at read time. op_seq/epoch bounds are tight per MoR
delta (one epoch per file), so position-range planning skips old deltas
exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

from cdcrypt.operators.merge import merge_upsert
from cdcrypt.table.lake import LakeTable, LakeTableError

SCHEMA = StructType([
    StructField("conv_id", StringType(), False),
    StructField("turn_idx", IntegerType(), False),
    StructField("text", StringType(), True),
    StructField("op_seq", LongType(), True),
])


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, ["conv_id", "turn_idx", "text", "op_seq"]
    ).withColumn("turn_idx", F.col("turn_idx").cast("int")) \
     .withColumn("op", F.lit("I"))


def _mk_mor(spark, tmp_path, epochs=3, n=30):
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, bucket_count=4)
    for e in range(epochs):
        rows = [(f"c{i}", i, f"e{e} {i}", 1000 * e + i) for i in range(n)]
        merge_upsert(spark, t, _batch(spark, rows), epoch=e, mode="mor")
    return t


def test_bounds_recorded_for_keys_and_change_metadata(spark, tmp_path):
    t = _mk_mor(spark, tmp_path)
    deltas = [f for f in t.files() if f.get("kind") == "delta"]
    assert deltas
    for f in deltas:
        b = f["bounds"]
        assert set(b) == {"conv_id", "turn_idx", "op_seq", "epoch"}
        assert b["epoch"][0] == b["epoch"][1]          # one epoch per file
        assert b["op_seq"][0] >= 1000 * b["epoch"][0]  # tight per epoch
        assert b["conv_id"][0].startswith("c")
    # CoW base files carry bounds too
    t2 = LakeTable.create(str(tmp_path / "t2"), SCHEMA, bucket_count=4)
    merge_upsert(spark, t2,
                 _batch(spark, [("a", 1, "x", 7), ("b", 2, "y", 9)]),
                 epoch=0, mode="cow")
    base = [f for f in t2.files() if f.get("kind", "base") == "base"]
    assert all("bounds" in f for f in base)


def test_manifest_range_planning_is_exact_on_epoch_tight_columns(
        spark, tmp_path):
    """files(key_range on op_seq/epoch) must select exactly the delta
    files of the matching epochs — planned from the manifest, sharp
    because each delta file holds one epoch."""
    t = _mk_mor(spark, tmp_path, epochs=3)
    deltas = [f for f in t.files() if f.get("kind") == "delta"]
    picked = [f for f in t.files(key_range={"op_seq": (2000, None)})
              if f.get("kind") == "delta"]
    assert picked == [f for f in deltas if f["bounds"]["epoch"][0] == 2]
    picked = [f for f in t.files(key_range={"epoch": (1, 1)})
              if f.get("kind") == "delta"]
    assert picked == [f for f in deltas if f["bounds"]["epoch"][0] == 1]
    # half-open lower side
    assert [f for f in t.files(key_range={"op_seq": (None, 999)})
            if f.get("kind") == "delta"] == \
        [f for f in deltas if f["bounds"]["epoch"][0] == 0]


def test_point_lookup_reads_correctly_and_prunes(spark, tmp_path):
    t = _mk_mor(spark, tmp_path)
    got = t.read(spark, key_range={"conv_id": ("c7", "c7")}).collect()
    assert {(r["conv_id"], r["turn_idx"], r["text"]) for r in got} \
        == {("c7", 7, "e2 7")}
    # range over the int key column
    rng = t.read(spark, key_range={"turn_idx": (5, 9)})
    assert sorted(r["turn_idx"] for r in rng.collect()) == [5, 6, 7, 8, 9]
    # manifest pruning engaged: the point lookup plans fewer files than
    # the full scan (4 buckets x 3 epochs; c7 lives in one bucket)
    assert len(t.files(key_range={"conv_id": ("c7", "c7")})) \
        < len(t.files())
    # files without bounds are conservatively kept, never wrongly pruned
    nobounds = dict(t.files()[0])
    nobounds.pop("bounds", None)
    kept = [f for f in t.files(key_range={"conv_id": ("zzz", "zzz")})]
    assert all("bounds" in f for f in kept) or kept == []


def test_key_range_rejects_non_key_columns(spark, tmp_path):
    t = _mk_mor(spark, tmp_path, epochs=2)
    with pytest.raises(LakeTableError, match="key columns only"):
        t.read(spark, key_range={"op_seq": (0, 10)})
    with pytest.raises(LakeTableError, match="key columns only"):
        t.read(spark, key_range={"text": ("a", "b")})


def test_point_lookup_under_evolutions(spark, tmp_path):
    """Bounds survive the metadata-only evolutions: rename follows the
    column (old files' bounds live under the OLD name — conservative
    no-prune — while new files record the new name) and partition
    evolution doesn't disturb recorded bounds."""
    t = _mk_mor(spark, tmp_path, epochs=2)
    t.evolve_schema(renames={"conv_id": "session_id"})
    t.evolve_partitioning(8)
    merge_upsert(spark, t, spark.createDataFrame(
        [("c3", 3, "post", 9000)],
        ["session_id", "turn_idx", "text", "op_seq"])
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
        .withColumn("op", F.lit("I")), epoch=2, mode="mor")
    got = t.read(spark, key_range={"session_id": ("c3", "c3")}).collect()
    assert {(r["session_id"], r["text"]) for r in got} == {("c3", "post")}
    # pre-rename files keep 'conv_id' bounds (unprunable under the new
    # name, still correct); the post-rename delta records 'session_id'
    names = [set(f.get("bounds", {})) for f in t.files()
             if f.get("kind") == "delta"]
    assert any("conv_id" in s for s in names)
    assert any("session_id" in s for s in names)
