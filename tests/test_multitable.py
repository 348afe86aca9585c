"""Multi-table fan-out (operators/multitable.py + parse_debezium_multi):
routing, per-table transforms/engines, unknown-table policy, and the
per-table-idempotent replay that makes the fan-out exactly-once without a
cross-table transaction."""

from __future__ import annotations

import json

import pytest

from cdcrypt.operators.multitable import TableRoute, apply_multi
from cdcrypt.sources.debezium import merged_row_schema, parse_debezium_multi
from cdcrypt.table.lake import LakeTable

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)

CONV_SCHEMA = StructType([
    StructField("conv_id", StringType(), False),
    StructField("turn_idx", IntegerType(), False),
    StructField("text", StringType(), True),
    StructField("op_seq", LongType(), True),
])
METRIC_SCHEMA = StructType([
    StructField("user_id", LongType(), False),
    StructField("score", DoubleType(), True),
    StructField("op_seq", LongType(), True),
])
STREAM_SCHEMA = StructType([
    StructField("table", StringType(), True),
    StructField("op", StringType(), False),
    StructField("op_seq", LongType(), False),
    StructField("epoch", LongType(), False),
    StructField("conv_id", StringType(), True),
    StructField("turn_idx", IntegerType(), True),
    StructField("text", StringType(), True),
    StructField("user_id", LongType(), True),
    StructField("score", DoubleType(), True),
])

ROWS = [
    ("convs", "I", 1, 0, "A", 0, "hello", None, None),
    ("convs", "U", 2, 0, "A", 0, "hello v2", None, None),
    ("convs", "I", 3, 0, "B", 0, "other", None, None),
    ("metrics", "I", 1, 0, None, None, None, 7, 0.5),
    ("metrics", "U", 2, 0, None, None, None, 7, 0.9),
    ("metrics", "D", 3, 0, None, None, None, 8, None),
    ("metrics", "I", 1, 0, None, None, None, 8, 0.1),
]


def routes_for(tmp_path, transform=None):
    convs = LakeTable.create(str(tmp_path / "convs"), CONV_SCHEMA,
                             bucket_count=4)
    metrics = LakeTable.create(str(tmp_path / "metrics"), METRIC_SCHEMA,
                               bucket_count=4, bucket_by="user_id",
                               key_cols=("user_id",))
    return {"convs": TableRoute(convs, transform=transform),
            "metrics": TableRoute(metrics)}


def stream(spark, rows=None):
    return spark.createDataFrame(rows or ROWS, STREAM_SCHEMA)


def conv_state(spark, routes):
    return {(r["conv_id"], r["turn_idx"]): r["text"]
            for r in routes["convs"].table.read(spark).collect()}


def metric_state(spark, routes):
    return {r["user_id"]: r["score"]
            for r in routes["metrics"].table.read(spark).collect()}


def test_apply_multi_routes_and_merges(spark, tmp_path):
    routes = routes_for(tmp_path)
    out = apply_multi(spark, stream(spark), routes, epoch=0)
    assert out["unknown_rows"] == 0 and out["dlq"] is None
    assert conv_state(spark, routes) == {("A", 0): "hello v2",
                                         ("B", 0): "other"}
    # user 8: insert then delete at higher op_seq -> absent
    assert metric_state(spark, routes) == {7: 0.9}
    assert set(out["tables"]) == {"convs", "metrics"}


def test_unknown_table_policy(spark, tmp_path):
    routes = routes_for(tmp_path)
    rows = ROWS + [("ghost", "I", 9, 0, None, None, None, 99, 1.0)]
    with pytest.raises(ValueError, match="ghost"):
        apply_multi(spark, stream(spark, rows), routes, epoch=0)
    out = apply_multi(spark, stream(spark, rows), routes, epoch=0,
                      on_unknown="dlq")
    assert out["unknown_rows"] == 1
    assert out["dlq"].select("table").first()[0] == "ghost"
    assert conv_state(spark, routes) == {("A", 0): "hello v2",
                                         ("B", 0): "other"}


def test_partial_failure_replay_self_heals(spark, tmp_path):
    # epoch 1 "crashed" after convs committed but before metrics did:
    # the replay must skip convs (idempotent) and apply metrics
    routes = routes_for(tmp_path)
    apply_multi(spark, stream(spark), routes, epoch=0)
    e1 = [("convs", "U", 10, 1, "A", 0, "hello v3", None, None),
          ("metrics", "U", 10, 1, None, None, None, 7, 0.7)]
    apply_multi(spark, stream(spark, e1), {"convs": routes["convs"]},
                epoch=1, table_col="table", on_unknown="dlq")
    out = apply_multi(spark, stream(spark, e1), routes, epoch=1)
    assert out["tables"]["convs"].get("skipped")
    assert not out["tables"]["metrics"].get("skipped")
    assert conv_state(spark, routes)[("A", 0)] == "hello v3"
    assert metric_state(spark, routes)[7] == 0.7


def test_per_table_transform(spark, tmp_path):
    up = lambda df: df.withColumn("text", F.upper("text"))  # noqa: E731
    routes = routes_for(tmp_path, transform=up)
    apply_multi(spark, stream(spark), routes, epoch=0)
    assert conv_state(spark, routes)[("A", 0)] == "HELLO V2"
    assert metric_state(spark, routes) == {7: 0.9}  # untouched route


def test_merged_row_schema_conflict_raises(spark):
    with pytest.raises(ValueError, match="conflicting types"):
        merged_row_schema({
            "a": StructType([StructField("x", LongType())]),
            "b": StructType([StructField("x", StringType())]),
        })


def env(table, op, lsn, after=None, before=None):
    return json.dumps({"payload": {
        "op": op, "ts_ms": 1700000000000 + lsn,
        "source": {"lsn": lsn, "table": table},
        "after": after, "before": before,
    }})


def test_parse_debezium_multi_end_to_end(spark, tmp_path):
    lines = [
        env("convs", "c", 1, after={"conv_id": "A", "turn_idx": 0,
                                    "text": "hi"}),
        env("convs", "u", 2, after={"conv_id": "A", "turn_idx": 0,
                                    "text": "hi v2"}),
        env("metrics", "c", 1, after={"user_id": 7, "score": 0.5}),
        env("metrics", "d", 2, before={"user_id": 7, "score": 0.5}),
    ]
    df = spark.createDataFrame([(x,) for x in lines], "value string")
    row_schemas = {
        "convs": StructType([f for f in CONV_SCHEMA.fields
                             if f.name != "op_seq"]),
        "metrics": StructType([f for f in METRIC_SCHEMA.fields
                               if f.name != "op_seq"]),
    }
    events = parse_debezium_multi(df, "value", row_schemas)
    assert events.where(F.col("table").isNull()).count() == 0
    # other tables' columns null-fill on the merged shape
    assert events.where((F.col("table") == "metrics")
                        & F.col("conv_id").isNotNull()).count() == 0
    routes = routes_for(tmp_path)
    apply_multi(spark, events.withColumn("epoch", F.lit(0).cast("long")),
                routes, epoch=0)
    assert conv_state(spark, routes) == {("A", 0): "hi v2"}
    assert metric_state(spark, routes) == {}
