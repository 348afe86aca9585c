"""FieldMasker behavioral spec — the MaskField/HashField SMT siblings over
the same fixture shapes as the crypto transform tests (nested struct, array
wildcard, condition column, null/missing targets), plus the hash mode's
equality-preservation contract and a DuckDB cross-check of the exact
expressions the gate oracles rely on."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from cdcrypt.operators.masking import (
    FieldMasker,
    MaskConfig,
    hash_fields,
    mask_fields,
)
from cdcrypt.operators.transform import ConfigError

SCHEMA = StructType(
    [
        StructField("text", StringType(), True),
        StructField("optional", StringType(), True),
        StructField(
            "struct",
            StructType([StructField("array", ArrayType(StringType()), True)]),
            True,
        ),
        StructField("cond", StringType(), True),
    ]
)


def fixture_df(spark):
    rows = [
        Row(text="call 555-1234 now", optional=None,
            struct=Row(array=["a0", "a1"]), cond="bingo"),
        Row(text="id 42 and 7", optional=None,
            struct=Row(array=["b0", "b1"]), cond="miss"),
        Row(text=None, optional=None, struct=None, cond="bingo"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_literal_mask_and_null_passthrough(spark):
    df = fixture_df(spark)
    out = mask_fields(df, ["$.text"], replacement="<redacted>")
    assert out.schema == df.schema  # transform-preserving schema
    vals = {r["cond"]: r["text"] for r in out.collect()}
    assert vals["miss"] == "<redacted>"
    got_null = [r["text"] for r in out.collect() if r["struct"] is None]
    assert got_null == [None]  # null operand -> null, not the literal


def test_regex_redaction(spark):
    df = fixture_df(spark)
    out = mask_fields(df, ["$.text"], regex="[0-9]+", replacement="#")
    vals = {r["cond"]: r["text"] for r in out.collect() if r["text"]}
    assert vals["bingo"] == "call #-# now"
    assert vals["miss"] == "id # and #"


def test_array_wildcard_and_index(spark):
    df = fixture_df(spark).where(F.col("struct").isNotNull())
    wild = mask_fields(df, ["$.struct.array[*]"], replacement="X")
    assert {tuple(r["struct"]["array"]) for r in wild.collect()} == {("X", "X")}
    idx = mask_fields(df, ["$.struct.array[1]"], replacement="X")
    assert {tuple(r["struct"]["array"]) for r in idx.collect()} == {
        ("a0", "X"), ("b0", "X")}


def test_condition_gate_passthrough(spark):
    # non-matching rows pass through byte-identical (TransformTest.java:165-173)
    df = fixture_df(spark)
    out = mask_fields(df, ["$.text"], replacement="X",
                      condition_field="cond", condition_equals="bingo")
    vals = {r["cond"]: r["text"] for r in out.collect() if r["text"]}
    assert vals == {"bingo": "X", "miss": "id 42 and 7"}


def test_missing_optional_target_skipped(spark):
    df = fixture_df(spark)
    out = mask_fields(df, ["$.nope.not_there", "$.text"], replacement="X")
    assert out.where(F.col("text") == "X").count() == 2


def test_hash_equality_preserving_and_salted(spark):
    df = spark.createDataFrame(
        [("alice",), ("bob",), ("alice",), (None,)], ["name"])
    out = hash_fields(df, ["$.name"], salt="s1")
    vals = [r["name"] for r in out.collect()]
    expect = hashlib.sha256(b"s1|alice").hexdigest()
    assert vals.count(expect) == 2  # equal in -> equal out (joins survive)
    assert None in vals  # null passthrough
    # a different salt cannot be linked
    other = {r["name"] for r in hash_fields(df, ["$.name"], salt="s2").collect()}
    assert expect not in other
    # unsalted matches plain sha256
    plain = {r["name"] for r in hash_fields(df, ["$.name"]).collect()}
    assert hashlib.sha256(b"alice").hexdigest() in plain


def test_hash_matches_duckdb_oracle_expression(spark):
    # the gate oracle's exact cross-engine contract: Spark sha2(concat(...))
    # == DuckDB sha256('salt|' || v); regexp dialects agree on the simple
    # class used by the mask gate (global flag required on the DuckDB side)
    df = spark.createDataFrame([("v 12x",), ("w 3",)], ["v"])
    got = {
        (r["h"], r["m"]) for r in df.select(
            F.sha2(F.concat(F.lit("s|"), F.col("v")), 256).alias("h"),
            F.regexp_replace("v", "[0-9]+", "#").alias("m"),
        ).collect()
    }
    want = set(duckdb.sql(
        "SELECT sha256('s|' || v), regexp_replace(v, '[0-9]+', '#', 'g') "
        "FROM (VALUES ('v 12x'), ('w 3')) t(v)").fetchall())
    assert got == want


def test_whole_stage_codegen_no_python(spark):
    # the operator's scale contract: no Arrow/Python eval node in the plan
    df = fixture_df(spark)
    out = hash_fields(mask_fields(df, ["$.text"], regex="[0-9]+",
                                  replacement="#"), ["$.cond"], salt="s")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_config_errors():
    with pytest.raises(ConfigError):
        MaskConfig(mode="shred", fields=["$.a"])
    with pytest.raises(ConfigError):
        MaskConfig(mode="mask", fields=[])
    with pytest.raises(ConfigError):
        MaskConfig(mode="mask", fields=["$.a"], condition_field="c")
    with pytest.raises(ConfigError):
        MaskConfig(mode="hash", fields=["$.a"], regex="x")
    with pytest.raises(ConfigError):
        MaskConfig(mode="hash", fields=["$.a"], algo=123)
    with pytest.raises(ConfigError):
        MaskConfig(mode="mask", fields=["$.a"], replacement=None)
    with pytest.raises(ConfigError):
        # three array segments stay out of scope ($.a[*][*] is supported
        # since the nested-array paths landed — see test_nested_masking)
        FieldMasker(MaskConfig(mode="mask", fields=["$.a[*][*][*]"]))
