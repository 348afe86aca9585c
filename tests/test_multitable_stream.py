"""Multi-table ingest driver (streaming/multitable.py): epoch replay over
Debezium-line epochs into two tables, resume-after-partial-commit, and the
unroutable-row DLQ sink."""

from __future__ import annotations

import json
import os

from cdcrypt.operators.multitable import TableRoute, apply_multi
from cdcrypt.streaming.multitable import MultiTableIngest
from cdcrypt.table.lake import LakeTable

from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)

CONV_ROWS = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("text", StringType()),
])
METRIC_ROWS = StructType([
    StructField("user_id", LongType()),
    StructField("score", DoubleType()),
])


def env(table, op, lsn, after=None, before=None):
    return json.dumps({"payload": {
        "op": op, "ts_ms": 1700000000000 + lsn,
        "source": {"lsn": lsn, "table": table},
        "after": after, "before": before,
    }})


EPOCHS = {
    0: [env("convs", "c", 1, after={"conv_id": "A", "turn_idx": 0,
                                    "text": "hi"}),
        env("metrics", "c", 2, after={"user_id": 7, "score": 0.5})],
    1: [env("convs", "u", 3, after={"conv_id": "A", "turn_idx": 0,
                                    "text": "hi v2"}),
        env("metrics", "u", 4, after={"user_id": 7, "score": 0.9}),
        env("metrics", "c", 5, after={"user_id": 8, "score": 0.1})],
    2: [env("metrics", "d", 6, before={"user_id": 8, "score": 0.1})],
}


def write_epochs(tmp_path, epochs=EPOCHS, extra=()):
    src = tmp_path / "src"
    src.mkdir(exist_ok=True)
    for e, lines in epochs.items():
        body = list(lines) + [x for ee, x in extra if ee == e]
        (src / f"epoch={e:06d}.jsonl").write_text("\n".join(body) + "\n")
    return str(src)


def ingest_for(tmp_path, src, **kw):
    conv_schema = StructType(
        list(CONV_ROWS.fields) + [StructField("op_seq", LongType())])
    metric_schema = StructType(
        list(METRIC_ROWS.fields) + [StructField("op_seq", LongType())])
    routes = {
        "convs": TableRoute(LakeTable.create(
            str(tmp_path / "convs"), conv_schema, bucket_count=4)),
        "metrics": TableRoute(LakeTable.create(
            str(tmp_path / "metrics"), metric_schema, bucket_count=4,
            bucket_by="user_id", key_cols=("user_id",))),
    }
    return MultiTableIngest(
        source_dir=src, checkpoint_dir=str(tmp_path / "ckpt"),
        routes=routes,
        row_schemas={"convs": CONV_ROWS, "metrics": METRIC_ROWS}, **kw)


def states(spark, ing):
    conv = {(r["conv_id"], r["turn_idx"]): r["text"]
            for r in ing.routes["convs"].table.refresh().read(spark)
            .collect()}
    met = {r["user_id"]: r["score"]
           for r in ing.routes["metrics"].table.refresh().read(spark)
           .collect()}
    return conv, met


def test_multi_stream_replays_all_epochs(spark, tmp_path):
    ing = ingest_for(tmp_path, write_epochs(tmp_path))
    results = ing.run(spark)
    assert [r["epoch"] for r in results] == [0, 1, 2]
    conv, met = states(spark, ing)
    assert conv == {("A", 0): "hi v2"}
    assert met == {7: 0.9}  # user 8 inserted then deleted
    # checkpoints on disk, with per-table sub-lineage
    ck = sorted(os.listdir(tmp_path / "ckpt"))
    assert ck == [f"epoch_{e:06d}.json" for e in (0, 1, 2)]
    lin = json.loads((tmp_path / "ckpt" / ck[1]).read_text())
    assert set(lin["tables"]) == {"convs", "metrics"}


def test_multi_stream_resume_after_partial_commit(spark, tmp_path):
    src = write_epochs(tmp_path)
    ing = ingest_for(tmp_path, src)
    ing.run(spark, max_epochs=1)
    # simulate a crash mid-epoch-1: only convs committed
    from cdcrypt.sources.debezium import parse_debezium_multi
    df = parse_debezium_multi(
        spark.read.text(os.path.join(src, "epoch=000001.jsonl")), "value",
        {"convs": CONV_ROWS, "metrics": METRIC_ROWS})
    from pyspark.sql import functions as F
    apply_multi(spark, df.withColumn("epoch", F.lit(1).cast("long")),
                {"convs": ing.routes["convs"]}, epoch=1,
                on_unknown="dlq")  # metrics rows unrouted in the simulation
    results = ing.run(spark)  # resumes from min(committed)+1 == 1
    assert [r["epoch"] for r in results] == [1, 2]
    assert results[0]["tables"]["convs"].get("skipped")
    assert not results[0]["tables"]["metrics"].get("skipped")
    conv, met = states(spark, ing)
    assert conv == {("A", 0): "hi v2"}
    assert met == {7: 0.9}


def test_multi_stream_unknown_to_dlq(spark, tmp_path):
    extra = [(1, env("ghost", "c", 99, after={"conv_id": "X",
                                              "turn_idx": 0,
                                              "text": "?"}))]
    src = write_epochs(tmp_path, extra=extra)
    ing = ingest_for(tmp_path, src, on_unknown="dlq",
                     dlq_dir=str(tmp_path / "dlq"))
    results = ing.run(spark)
    assert results[1]["dlq_rows"] == 1
    dead = spark.read.parquet(str(tmp_path / "dlq" / "epoch=000001"))
    assert dead.count() == 1 and dead.first()["table"] == "ghost"
    conv, met = states(spark, ing)
    assert conv == {("A", 0): "hi v2"} and met == {7: 0.9}


def test_multi_stream_scd2_route(spark, tmp_path):
    # convs routed as a TYPE-2 history table, metrics as latest-state:
    # the same stream materializes both shapes in one fan-out
    from cdcrypt.operators.scd2 import create_scd2_table, scd2_as_of

    src = write_epochs(tmp_path)
    conv_rows = StructType(
        list(CONV_ROWS.fields) + [StructField("op_seq", LongType())])
    metric_schema = StructType(
        list(METRIC_ROWS.fields) + [StructField("op_seq", LongType())])
    routes = {
        "convs": TableRoute(create_scd2_table(
            str(tmp_path / "convs_hist"), conv_rows, bucket_count=4),
            apply="scd2"),
        "metrics": TableRoute(LakeTable.create(
            str(tmp_path / "metrics"), metric_schema, bucket_count=4,
            bucket_by="user_id", key_cols=("user_id",))),
    }
    ing = MultiTableIngest(
        source_dir=src, checkpoint_dir=str(tmp_path / "ckpt"),
        routes=routes,
        row_schemas={"convs": CONV_ROWS, "metrics": METRIC_ROWS})
    ing.run(spark)
    hist = routes["convs"].table.refresh().read(spark)
    ivs = {(r["conv_id"], r["turn_idx"], r["valid_from_seq"]):
           (r["valid_to_seq"], r["is_current"], r["text"])
           for r in hist.collect()}
    assert ivs[("A", 0, 1)] == (3, False, "hi")
    assert ivs[("A", 0, 3)] == (None, True, "hi v2")
    assert {r["text"] for r in scd2_as_of(hist, 2).collect()} == {"hi"}
    met = {r["user_id"]: r["score"]
           for r in routes["metrics"].table.refresh().read(spark).collect()}
    assert met == {7: 0.9}
