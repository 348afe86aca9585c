"""LakeTable format unit tests: create/commit/atomicity/evolution/pruning."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

from cdcrypt.table.lake import LakeTable, LakeTableError, bucket_col

SCHEMA = StructType([
    StructField("conv_id", StringType(), False),
    StructField("turn_idx", IntegerType(), False),
    StructField("text", StringType(), True),
    StructField("op_seq", LongType(), True),
])


def test_create_and_reload(tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable.create(root, SCHEMA, bucket_count=8)
    assert t.version == 0 and t.committed_epoch == -1
    t2 = LakeTable(root)
    assert t2.bucket_count == 8
    assert [f.name for f in t2.schema.fields] == ["conv_id", "turn_idx", "text", "op_seq"]
    with pytest.raises(LakeTableError):
        LakeTable(str(tmp_path / "nope"))
    with pytest.raises(FileExistsError):
        LakeTable.create(root, SCHEMA)


def test_commit_swaps_current_atomically(tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable.create(root, SCHEMA, bucket_count=4)
    v = t.commit(epoch=0, keep_files=[], new_files=[
        {"path": "data/v1/bucket=0/f.parquet", "bucket": 0,
         "schema_id": None, "rows": 10}
    ], lineage={"epoch": 0})
    assert v == 1
    with open(os.path.join(root, "_meta", "current")) as f:
        assert f.read().strip() == "1"
    # new file stamped with the commit's schema id
    assert t.snapshot["files"][0]["schema_id"] == 0
    # old snapshot still readable
    assert t.snapshot_at(0)["files"] == []


def test_schema_evolution_new_id_only_on_change(tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, bucket_count=4)
    # same schema -> no new id
    t.commit(epoch=0, keep_files=[], new_files=[], lineage={}, new_schema=SCHEMA)
    assert t.snapshot["schema_id"] == 0 and len(t.snapshot["schemas"]) == 1
    evolved = StructType(list(SCHEMA.fields) + [StructField("model", StringType(), True)])
    t.commit(epoch=1, keep_files=[], new_files=[], lineage={}, new_schema=evolved)
    assert t.snapshot["schema_id"] == 1 and len(t.snapshot["schemas"]) == 2
    assert "model" in [f.name for f in t.schema.fields]


def test_manifest_bucket_pruning(tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, bucket_count=4)
    files = [
        {"path": f"data/v1/bucket={b}/f.parquet", "bucket": b,
         "schema_id": 0, "rows": 1}
        for b in range(4)
    ]
    t.commit(epoch=0, keep_files=[], new_files=files, lineage={})
    assert len(t.files()) == 4
    assert [f["bucket"] for f in t.files(buckets={1, 3})] == [1, 3]
    assert t.total_rows() == 4


def test_read_empty_table(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, bucket_count=4)
    df = t.read(spark)
    assert df.count() == 0
    assert df.schema == SCHEMA


def test_bucket_expr_stable(spark):
    """bucket assignment is a pure function of conv_id (layout invariant:
    the same conversation always lands in the same bucket)."""
    df = spark.createDataFrame([("convA",), ("convA",), ("convB",)], ["conv_id"])
    vals = [r[0] for r in df.select(bucket_col(64)).collect()]
    assert vals[0] == vals[1]
    assert 0 <= min(vals) and max(vals) < 64
