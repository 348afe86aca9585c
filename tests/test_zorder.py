"""Z-order (Morton) clustered rewrite: key math, multi-dim pruning, guards.

The decisive property: after ``rewrite_clustered(layout='zorder')`` a
range scan on EITHER dimension prunes files from manifest bounds alone,
where the linear layout prunes only on its leading column. Results are
always byte-identical to the unpruned scan — layout affects file bounds,
never row content.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
    TimestampType,
)

from cdcrypt.operators.dedup import resolve_latest_window
from cdcrypt.operators.maintenance import rewrite_clustered, zorder_key
from cdcrypt.operators.merge import merge_upsert
from cdcrypt.table.lake import LakeTable, LakeTableError

TS = datetime.datetime(2024, 1, 1)
CHANGE_COLS = StructType([
    StructField("op", StringType()), StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()), StructField("op_seq", LongType()),
    StructField("epoch", LongType()), StructField("text", StringType()),
    StructField("ts", TimestampType()),
])
SCHEMA = StructType([
    StructField("conv_id", StringType(), False),
    StructField("turn_idx", IntegerType(), False),
    StructField("text", StringType(), True),
    StructField("op_seq", LongType(), True),
    StructField("ts", TimestampType(), True),
])
N = 4096


def _py_morton(x: int, y: int, bits: int) -> int:
    z = 0
    for j in range(bits):
        z |= ((x >> j) & 1) << (j * 2)
        z |= ((y >> j) & 1) << (j * 2 + 1)
    return z


def test_zorder_key_matches_reference_morton(spark):
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x long, y long")
    # ranges [0,3] at bits=2: scaled value == raw value exactly
    got = df.withColumn(
        "z", zorder_key(["x", "y"], {"x": (0.0, 3.0), "y": (0.0, 3.0)}, 2)
    ).collect()
    for r in got:
        assert r.z == _py_morton(r.x, r.y, 2), (r.x, r.y, r.z)


def test_zorder_key_null_and_degenerate_range(spark):
    df = spark.createDataFrame([(None, 5), (0, 5), (1023, 5)],
                               "x long, y long")
    z = df.select(zorder_key(
        ["x", "y"], {"x": (0.0, 1023.0), "y": (5.0, 5.0)}, 8
    ).alias("z")).collect()
    # null x -> cell 0 (same as min); degenerate y contributes 0 bits
    assert z[0].z == z[1].z == 0
    assert z[2].z > 0


def _grid_table(spark, tmp_path, layout: str, sort_by):
    rows = [("I", f"c{i:05d}", i % 64, (i * 37) % N, 0,
             f"t{i}", TS) for i in range(N)]
    batch = resolve_latest_window(
        spark.createDataFrame(rows, CHANGE_COLS),
        key_cols=["conv_id", "turn_idx"])
    t = LakeTable.create(str(tmp_path / f"t_{layout}"), SCHEMA,
                         bucket_count=2, key_cols=("conv_id", "turn_idx"))
    merge_upsert(spark, t, batch, epoch=0, mode="cow")
    t.refresh()
    rewrite_clustered(spark, t, sort_by, layout=layout,
                      max_records_per_file=256)
    return t.refresh()


def test_zorder_prunes_both_dimensions_linear_only_leading(spark, tmp_path):
    zt = _grid_table(spark, tmp_path, "zorder", ["op_seq", "turn_idx"])
    lt = _grid_table(spark, tmp_path, "linear", ["op_seq", "turn_idx"])
    total = len(zt.files())
    assert total == len(lt.files()) and total >= 8

    seq_rng = {"op_seq": (0, N // 8 - 1)}
    turn_rng = {"turn_idx": (0, 7)}

    # leading dim: both layouts prune
    assert len(lt.files(key_range=seq_rng)) < total
    assert len(zt.files(key_range=seq_rng)) < total
    # trailing dim: linear CANNOT prune (every file spans ~all turn_idx);
    # zorder must
    assert len(lt.files(key_range=turn_rng)) == total
    assert len(zt.files(key_range=turn_rng)) < total
    # conjunctive scan prunes at least as hard as either dim alone
    both = len(zt.files(key_range={**seq_rng, **turn_rng}))
    assert both <= min(len(zt.files(key_range=seq_rng)),
                       len(zt.files(key_range=turn_rng)))

    # correctness: pruned scans return exactly the filtered table
    for t in (zt, lt):
        got = sorted((r.conv_id, r.turn_idx, r.op_seq) for r in t.read(
            spark, key_range={**seq_rng, **turn_rng}).collect())
        want = sorted((f"c{i:05d}", i % 64, (i * 37) % N)
                      for i in range(N)
                      if (i * 37) % N < N // 8 and i % 64 < 8)
        assert got == want


def test_zorder_guards(spark, tmp_path):
    t = _grid_table(spark, tmp_path, "linear", ["op_seq"])
    with pytest.raises(LakeTableError, match="layout"):
        rewrite_clustered(spark, t, ["op_seq", "turn_idx"], layout="hilbert")
    with pytest.raises(LakeTableError, match=">= 2"):
        rewrite_clustered(spark, t, ["op_seq"], layout="zorder")
    with pytest.raises(LakeTableError, match="orderable"):
        rewrite_clustered(spark, t, ["conv_id", "op_seq"], layout="zorder")
    with pytest.raises(LakeTableError, match="fit a long"):
        zorder_key(["a", "b"], {"a": (0, 1), "b": (0, 1)}, 32)


def test_zorder_rewrite_records_layout_and_preserves_rows(spark, tmp_path):
    t = _grid_table(spark, tmp_path, "zorder", ["op_seq", "turn_idx"])
    assert t.snapshot["lineage"]["layout"] == "zorder"
    assert t.read(spark).count() == N
    # rewrite preserves committed_epoch (exactly-once resume unaffected)
    assert t.committed_epoch == 0
