"""FieldTransform behavioral spec — the reference's ``TransformTest.java``
cases transliterated to DataFrames (SURVEY.md §5.1), plus the engine's AAD
binding. Fixture mirrors FIXTURES.md F4 (nested struct + array wildcard +
condition column)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from cdcrypt.operators.transform import (
    ConfigError,
    FieldTransform,
    TransformConfig,
    decrypt_fields,
    encrypt_fields,
)

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
        Row(text="hello", optional=None,
            struct=Row(array=["a0", "a1"]), cond="bingo"),
        Row(text="world", optional=None,
            struct=Row(array=["b0", "b1"]), cond="miss"),
        Row(text=None, optional=None, struct=None, cond="bingo"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_struct_and_array_wildcard_roundtrip(spark):
    # TransformTest.java:111-136: encrypt $.text and $.struct.array[*],
    # schema unchanged, values replaced in place
    df = fixture_df(spark)
    enc = encrypt_fields(df, ["$.text", "$.struct.array[*]"])
    assert enc.schema == df.schema  # transform-preserving schema
    collected = enc.collect()
    r = {row["cond"]: row for row in collected if row["text"] is not None}
    assert r["bingo"]["text"] != "hello" and len(r["bingo"]["text"]) > 40
    assert all(e != p for e, p in zip(r["bingo"]["struct"]["array"], ["a0", "a1"]))
    # null operand passthrough (Transform.java:57-60)
    none_row = [row for row in collected if row["text"] is None]
    assert none_row and none_row[0]["struct"] is None

    dec = decrypt_fields(enc, ["$.text", "$.struct.array[*]"])
    assert sorted(dec.collect(), key=lambda r: (r["cond"], str(r["text"]))) == sorted(
        df.collect(), key=lambda r: (r["cond"], str(r["text"]))
    )


def test_array_index_path(spark):
    df = fixture_df(spark).where(F.col("struct").isNotNull())
    enc = encrypt_fields(df, ["$.struct.array[1]"])
    for row in enc.collect():
        arr = row["struct"]["array"]
        assert arr[0] in ("a0", "b0")  # untouched
        assert arr[1] not in ("a1", "b1")  # encrypted
    dec = decrypt_fields(enc, ["$.struct.array[1]"])
    assert {tuple(r["struct"]["array"]) for r in dec.collect()} == {
        ("a0", "a1"), ("b0", "b1")
    }


def test_condition_gate_per_row_branch(spark):
    # TransformTest.java:165-173 + ConditionsTest.java:16-45: rows failing the
    # equality gate pass through UNMODIFIED (not dropped)
    df = fixture_df(spark)
    cfg = TransformConfig(
        mode="encrypt", fields=["$.text"],
        condition_field="$.cond", condition_equals="bingo",
    )
    enc = FieldTransform(cfg).apply(df)
    rows = {row["cond"]: row for row in enc.collect() if row["text"] is not None}
    assert rows["bingo"]["text"] != "hello"
    assert rows["miss"]["text"] == "world"  # passthrough
    assert enc.count() == 3  # branch, not filter


def test_condition_missing_field_rejects_all(spark):
    # Conditions.java:34-36: missing field -> gate false -> nothing encrypted
    df = fixture_df(spark)
    cfg = TransformConfig(
        mode="encrypt", fields=["$.text"],
        condition_field="$.nope", condition_equals="x",
    )
    out = FieldTransform(cfg).apply(df)
    assert {r["text"] for r in out.collect()} == {"hello", "world", None}


def test_condition_existential_over_array(spark):
    # any-match over a multi-valued path accepts (Conditions.java:38-43)
    df = fixture_df(spark).where(F.col("struct").isNotNull())
    cfg = TransformConfig(
        mode="encrypt", fields=["$.text"],
        condition_field="$.struct.array[*]", condition_equals="a1",
    )
    rows = {r["cond"]: r for r in FieldTransform(cfg).apply(df).collect()}
    assert rows["bingo"]["text"] != "hello"  # array contains a1
    assert rows["miss"]["text"] == "world"


def test_missing_optional_target_skipped(spark):
    # Transform.java:99-101 / TransformTest.java:176-183
    df = fixture_df(spark)
    out = encrypt_fields(df, ["$.not_a_field", "$.no.such.path"])
    assert out.collect() == df.collect()


def test_invalid_path_is_config_error(spark):
    # TransformTest.java:193-195 -> ConfigException analogue
    with pytest.raises(ConfigError):
        encrypt_fields(fixture_df(spark), ["$..["])
    with pytest.raises(ConfigError):
        # three array segments remain out of scope ($.a[*].b and
        # $.a[*].b[*].c are supported — see the array-path tests below)
        encrypt_fields(fixture_df(spark), ["$.a[*].b[*].c[*]"])


def test_config_validation():
    with pytest.raises(ConfigError):
        TransformConfig(mode="frobnicate", fields=["$.a"])
    with pytest.raises(ConfigError):
        TransformConfig(mode="encrypt", fields=[])
    with pytest.raises(ConfigError):
        TransformConfig(mode="encrypt", fields=["$.a"], condition_field="$.c")
    with pytest.raises(ConfigError):
        TransformConfig(mode="encrypt", fields=["$.a"], encoding="hex")


def test_aad_binds_rows(spark):
    df = spark.createDataFrame(
        [("conv1", "secret one"), ("conv2", "secret two")], ["conv_id", "text"]
    )
    enc = encrypt_fields(df, ["$.text"], aad_field="conv_id")
    dec = decrypt_fields(enc, ["$.text"], aad_field="conv_id")
    assert {(r["conv_id"], r["text"]) for r in dec.collect()} == {
        ("conv1", "secret one"), ("conv2", "secret two")
    }
    # swap the AAD column -> decrypt must fail (typed, surfaces via action)
    swapped = enc.withColumn(
        "conv_id", F.when(F.col("conv_id") == "conv1", "conv2").otherwise("conv1")
    )
    with pytest.raises(Exception, match="AAD|mismatch"):
        decrypt_fields(swapped, ["$.text"], aad_field="conv_id").collect()


def test_binary_encoding_mode(spark):
    # schemaless/binary analogue of TransformTest.java:139-162
    df = spark.createDataFrame([("payload",)], ["text"])
    enc = encrypt_fields(df, ["$.text"], encoding="binary")
    assert dict(enc.dtypes)["text"] == "binary"
    [row] = enc.collect()
    assert isinstance(row["text"], (bytes, bytearray))
    dec = decrypt_fields(enc, ["$.text"], encoding="string")
    assert dec.collect()[0]["text"] == "payload"


def test_transform_chain_smt_style(spark):
    # e2e/vault_config.json:14-30: chain encrypt(userid,pageid) -> decrypt(userid);
    # userid round-trips, pageid stays ciphertext (FIXTURES.md F3)
    df = spark.createDataFrame(
        [(91, "User_3", "Page_17"), (92, "User_5", "Page_29")],
        ["viewtime", "userid", "pageid"],
    )
    out = decrypt_fields(encrypt_fields(df, ["$.userid", "$.pageid"]), ["$.userid"])
    rows = sorted(out.collect(), key=lambda r: r["viewtime"])
    assert [r["userid"] for r in rows] == ["User_3", "User_5"]
    assert all(not r["pageid"].startswith("Page_") for r in rows)
    assert [r["viewtime"] for r in rows] == [91, 92]  # untouched column


def test_key_rotation_read_via_transform(spark):
    """verify_key_id=False: one column carries envelopes under two rotated
    key ids; the UDF backend decrypts both (key resolved per envelope)."""
    df = spark.createDataFrame(
        [("a", "alpha"), ("b", "beta")], "id string, text string")
    enc_v1 = encrypt_fields(df.where("id = 'a'"), ["$.text"], key_id="k/v1")
    enc_v2 = encrypt_fields(df.where("id = 'b'"), ["$.text"], key_id="k/v2")
    mixed = enc_v1.unionByName(enc_v2)
    dec = decrypt_fields(mixed, ["$.text"], key_id="k/v2",
                         verify_key_id=False)
    assert {r.id: r.text for r in dec.collect()} == {"a": "alpha", "b": "beta"}
    strict = decrypt_fields(mixed, ["$.text"], key_id="k/v2")
    with pytest.raises(Exception, match="key id"):
        strict.collect()


def test_schemaless_json_payload_roundtrip(spark):
    """O3 schema dispatch: the reference's schemaless Map mode
    (Transform.java:64-65) maps to a from_json pre-step — parse the JSON
    value, run the SAME transform, re-serialize. The pageviews e2e shape
    (userid encrypted, pageid left encrypted after the chain,
    e2e/vault_config.json:14-30) transliterated."""
    raw = spark.createDataFrame(
        [('{"userid":"User_1","pageid":"Page_11","viewtime":91}',),
         ('{"userid":"User_2","pageid":"Page_12","viewtime":92}',)],
        "value string")
    parsed = raw.select(F.from_json(
        "value", "userid string, pageid string, viewtime long").alias("v")
    ).select("v.*")
    # SMT chain (P2): encrypt(userid, pageid) -> decrypt(userid)
    enc = encrypt_fields(parsed, ["$.userid", "$.pageid"], key_id="k/e2e")
    dec = decrypt_fields(enc, ["$.userid"], key_id="k/e2e")
    out = dec.select(F.to_json(F.struct("userid", "pageid", "viewtime"))
                     .alias("value")).collect()
    import json as _json
    vals = [_json.loads(r.value) for r in out]
    assert {v["userid"] for v in vals} == {"User_1", "User_2"}  # decrypted
    assert all(len(v["pageid"]) > 40 for v in vals)  # still ciphertext
    assert {v["viewtime"] for v in vals} == {91, 92}  # untouched passthrough


def test_schemaless_inferred_schema_roundtrip(spark):
    """Runtime type discovery (Transform.java:64-65): when NO payload
    schema is supplied, infer_payload_schema samples the JSON strings and
    unifies types; the inferred path then behaves identically to the
    explicit-schema path. Malformed sample JSON and all-null payloads
    raise ConfigError instead of fabricating nulls."""
    import json as _json

    import pytest as _pytest

    from cdcrypt.kms import MockKMS
    from cdcrypt.operators.schemaless import (
        decrypt_json_payload, encrypt_json_payload, infer_payload_schema)
    from cdcrypt.operators.transform import ConfigError

    raw = spark.createDataFrame(
        [(1, '{"userid":"User_1","pageid":"Page_11","viewtime":91}'),
         (2, '{"userid":"User_2","pageid":"Page_12","viewtime":92}'),
         (3, None)],
        "rec_id long, value string")
    inferred = infer_payload_schema(raw, "value")
    assert {f.name for f in inferred.fields} == \
        {"userid", "pageid", "viewtime"}
    assert dict((f.name, f.dataType.simpleString())
                for f in inferred.fields)["viewtime"] == "bigint"
    kms = MockKMS()
    enc = encrypt_json_payload(raw, "value", None, ["$.userid"],
                               key_id="k/infer", kms=kms)
    dec = decrypt_json_payload(enc, "value", None, ["$.userid"],
                               key_id="k/infer", kms=kms)
    got = {r.rec_id: (_json.loads(r.value) if r.value is not None else None)
           for r in dec.collect()}
    assert got[1] == {"userid": "User_1", "pageid": "Page_11",
                      "viewtime": 91}
    assert got[2]["userid"] == "User_2" and got[3] is None
    # ciphertext really was in place between the two steps
    mid = {r.rec_id: r.value for r in enc.collect()}
    assert "User_1" not in (mid[1] or "")
    # malformed sample -> loud ConfigError (FAILFAST philosophy)
    bad = spark.createDataFrame([('{"a": 1',)], "value string")
    with _pytest.raises(ConfigError, match="malformed"):
        infer_payload_schema(bad, "value")
    # all-null payload -> loud ConfigError
    nul = spark.createDataFrame([(None,)], "value string")
    with _pytest.raises(ConfigError, match="no non-null"):
        infer_payload_schema(nul, "value")


def test_schemaless_strict_fields_guards_unknown_keys(spark):
    """An inference sample cannot promise field coverage: a payload key
    that first appears AFTER the sampled rows would be silently deleted
    by the repack (to_json serializes only the schema's fields). With an
    inferred schema the execution-time guard must raise instead; with an
    explicitly declared schema the drop is the caller's projection
    contract (default strict_fields=False), but strict_fields=True
    opts the guard in there too."""
    import json as _json

    import pytest as _pytest

    from cdcrypt.kms import MockKMS
    from cdcrypt.operators.schemaless import transform_json_payload
    from cdcrypt.operators.transform import FieldTransform, TransformConfig

    raw = spark.createDataFrame(
        [(1, '{"userid":"User_1","viewtime":91}'),
         (2, '{"userid":"User_2","viewtime":92,"discount":0.5}')],
        "rec_id long, value string").coalesce(1)
    kms = MockKMS()
    tf = FieldTransform(TransformConfig(
        mode="encrypt", fields=["$.userid"], key_id="k/strict", kms=kms))
    # inferred from a 1-row sample that misses 'discount' -> raises at
    # execution, names the key
    out = transform_json_payload(raw, "value", None, tf, infer_sample=1)
    with _pytest.raises(Exception, match="discount"):
        out.collect()
    # explicit schema: declared projection, key silently dropped (the
    # reference's declared-schema Struct behavior) ...
    decl = transform_json_payload(
        raw, "value", "userid string, viewtime long", tf)
    vals = {r.rec_id: _json.loads(r.value) for r in decl.collect()}
    assert "discount" not in vals[2]
    # ... unless the caller opts the guard in
    strict = transform_json_payload(
        raw, "value", "userid string, viewtime long", tf,
        strict_fields=True)
    with _pytest.raises(Exception, match="discount"):
        strict.collect()


# ---------------------------------------------------------------------------
# mid-path array segments ($.arr[*].field / $.arr[n].field) — the reference
# syntax table permits positional operators anywhere (README.md:142-148) and
# arrays-of-structs are a legal Connect shape (nested fixture
# TransformTest.java:43-49). VERDICT r3 item 3.
# ---------------------------------------------------------------------------

ARR_STRUCT_SCHEMA = (
    "doc_id string, arr array<struct<f:string, keep:string>>"
)


def arr_struct_df(spark):
    return spark.createDataFrame(
        [
            ("d1", [("hello", "k1"), ("world", "k2")]),
            ("d2", [("x", None), None]),  # null element passthrough
            ("d3", None),  # null array passthrough
            ("d4", []),  # empty array passthrough
        ],
        ARR_STRUCT_SCHEMA,
    )


def _sorted_dicts(df):
    return sorted((r.asDict(recursive=True) for r in df.collect()), key=str)


def test_array_struct_wildcard_roundtrip(spark):
    df = arr_struct_df(spark)
    enc = encrypt_fields(df, ["$.arr[*].f"], key_id="cdcrypt/docs")
    assert enc.schema == df.schema  # transform-preserving, no temp leak
    rows = {r.doc_id: r for r in enc.collect()}
    assert rows["d1"].arr[0].f != "hello" and len(rows["d1"].arr[0].f) > 40
    assert rows["d1"].arr[0].keep == "k1"  # sibling field untouched
    assert rows["d2"].arr[1] is None  # null struct element survives
    assert rows["d3"].arr is None and rows["d4"].arr == []
    dec = decrypt_fields(enc, ["$.arr[*].f"], key_id="cdcrypt/docs")
    assert _sorted_dicts(dec) == _sorted_dicts(df)


def test_array_struct_index_roundtrip(spark):
    df = arr_struct_df(spark)
    enc = encrypt_fields(df, ["$.arr[1].f"], key_id="cdcrypt/docs")
    rows = {r.doc_id: r for r in enc.collect()}
    assert rows["d1"].arr[0].f == "hello"  # element 0 untouched
    assert rows["d1"].arr[1].f != "world"
    assert rows["d2"].arr[1] is None  # null struct at the index stays null
    dec = decrypt_fields(enc, ["$.arr[1].f"], key_id="cdcrypt/docs")
    assert _sorted_dicts(dec) == _sorted_dicts(df)


def test_array_struct_deep_suffix_and_prefix(spark):
    # struct-wrapped array with a two-level suffix: $.top.arr[*].inner.leaf
    df = spark.createDataFrame(
        [("d1", (1, [(("s1",), 10), (("s2",), 20)]))],
        "id string, top struct<n:int, "
        "arr:array<struct<inner:struct<leaf:string>, v:int>>>",
    )
    enc = encrypt_fields(df, ["$.top.arr[*].inner.leaf"], key_id="k")
    assert enc.schema == df.schema
    e = enc.collect()[0]
    assert e.top.arr[0].inner.leaf != "s1"
    assert e.top.arr[0].v == 10 and e.top.n == 1  # siblings untouched
    dec = decrypt_fields(enc, ["$.top.arr[*].inner.leaf"], key_id="k")
    assert _sorted_dicts(dec) == _sorted_dicts(df)


def test_array_struct_missing_suffix_skips(spark):
    # missing optional target -> silent skip (Transform.java:99-101)
    df = spark.createDataFrame([("d1", ["a", "b"])],
                               "id string, arr array<string>")
    assert encrypt_fields(df, ["$.arr[*].missing"], key_id="k").collect() \
        == df.collect()


def test_array_struct_gated(spark):
    df = spark.createDataFrame(
        [("web", [("t1", None)]), ("pdf", [("t2", None)])],
        "src string, arr array<struct<f:string, keep:string>>",
    )
    enc = encrypt_fields(df, ["$.arr[*].f"], key_id="k",
                         condition_field="$.src", condition_equals="web")
    r = {x.src: x.arr[0].f for x in enc.collect()}
    assert r["pdf"] == "t2" and r["web"] != "t1"
    dec = decrypt_fields(enc, ["$.arr[*].f"], key_id="k",
                         condition_field="$.src", condition_equals="web")
    assert _sorted_dicts(dec) == _sorted_dicts(df)


def test_three_array_segments_rejected():
    # scope boundary: at most TWO array segments per path, config-time
    # error (Config.java:161-163 analogue)
    with pytest.raises(ConfigError, match="array segment"):
        FieldTransform(TransformConfig(
            mode="encrypt", fields=["$.a[*].b[0].c[*]"]))


# ---------------------------------------------------------------------------
# nested array segments ($.turns[*].tool_calls[*].args — the transcript
# tool-call shape): leaves flatten into ONE crypto batch in outer-major
# order and realign by a codegen prefix-sum over inner sizes.
# ---------------------------------------------------------------------------

NESTED_SCHEMA = (
    "conv_id string, turns array<struct<"
    "role:string, tool_calls:array<struct<name:string, args:string>>>>"
)


def nested_df(spark):
    # ragged on purpose: inner sizes 2/0/null/1 across elements, a null
    # leaf, a null outer element, a null outer array
    return spark.createDataFrame(
        [
            ("c1", [("user", [("search", "q=a"), ("fetch", "u=b")]),
                    ("assistant", []),
                    ("tool", None),
                    ("user", [("calc", None)]),
                    ("user", [("end", "q=z")])]),
            ("c2", [("user", None), None]),
            ("c3", None),
        ],
        NESTED_SCHEMA,
    )


def test_nested_wildcard_wildcard_roundtrip(spark):
    df = nested_df(spark)
    enc = encrypt_fields(df, ["$.turns[*].tool_calls[*].args"], key_id="k")
    assert enc.schema == df.schema  # transform-preserving, no temp leak
    rows = {r.conv_id: r for r in enc.collect()}
    t = rows["c1"].turns
    # ragged realignment: every non-null leaf encrypted IN PLACE
    assert t[0].tool_calls[0].args != "q=a" and len(t[0].tool_calls[0].args) > 40
    assert t[0].tool_calls[1].args != "u=b"
    assert t[4].tool_calls[0].args != "q=z"
    # siblings + structure untouched
    assert t[0].tool_calls[0].name == "search" and t[0].role == "user"
    assert t[1].tool_calls == [] and t[2].tool_calls is None
    assert t[3].tool_calls[0].args is None  # null leaf passthrough
    assert rows["c2"].turns[1] is None and rows["c3"].turns is None
    dec = decrypt_fields(enc, ["$.turns[*].tool_calls[*].args"], key_id="k")
    assert _sorted_dicts(dec) == _sorted_dicts(df)


def test_nested_index_shapes_roundtrip(spark):
    df = nested_df(spark)
    for path, probe in [
        ("$.turns[*].tool_calls[0].args",
         lambda t: (t[0].tool_calls[0].args, t[0].tool_calls[1].args)),
        ("$.turns[0].tool_calls[*].args",
         lambda t: (t[0].tool_calls[1].args, t[4].tool_calls[0].args)),
        ("$.turns[0].tool_calls[1].args",
         lambda t: (t[0].tool_calls[1].args, t[0].tool_calls[0].args)),
    ]:
        enc = encrypt_fields(df, [path], key_id="k")
        changed, unchanged_probe = probe(
            {r.conv_id: r for r in enc.collect()}["c1"].turns)
        assert changed not in ("q=a", "u=b", "q=z")
        dec = decrypt_fields(enc, [path], key_id="k")
        assert _sorted_dicts(dec) == _sorted_dicts(df), path
    # [*].tool_calls[0]: only index-0 leaves touched
    enc = encrypt_fields(df, ["$.turns[*].tool_calls[0].args"], key_id="k")
    t = {r.conv_id: r for r in enc.collect()}["c1"].turns
    assert t[0].tool_calls[1].args == "u=b"  # index 1 untouched


def test_nested_direct_array_of_arrays_roundtrip(spark):
    df = spark.createDataFrame(
        [("d1", [["a", "b"], [], None, ["c"]]), ("d2", None)],
        "id string, m array<array<string>>")
    enc = encrypt_fields(df, ["$.m[*][*]"], key_id="k")
    assert enc.schema == df.schema
    r = {x.id: x for x in enc.collect()}
    assert r["d1"].m[0][0] != "a" and r["d1"].m[3][0] != "c"
    assert r["d1"].m[1] == [] and r["d1"].m[2] is None
    dec = decrypt_fields(enc, ["$.m[*][*]"], key_id="k")
    assert _sorted_dicts(dec) == _sorted_dicts(df)


def test_nested_condition_gate_existential(spark):
    # condition over a nested wildcard path: any-leaf-match semantics
    df = nested_df(spark)
    enc = encrypt_fields(
        df, ["$.conv_id"], key_id="k",
        condition_field="$.turns[*].tool_calls[*].name",
        condition_equals="calc")
    r = {x["conv_id"] if len(x["conv_id"]) == 2 else "enc": x
         for x in (row.asDict() for row in enc.collect())}
    assert "enc" in r  # c1 has a 'calc' tool call -> encrypted
    assert "c2" in r and "c3" in r  # no match / null -> passthrough


def test_nested_masking(spark):
    from cdcrypt.operators.masking import mask_fields
    df = nested_df(spark)
    out = mask_fields(df, ["$.turns[*].tool_calls[*].args"],
                      replacement="***")
    t = {r.conv_id: r for r in out.collect()}["c1"].turns
    assert t[0].tool_calls[0].args == "***" and t[4].tool_calls[0].args == "***"
    assert t[3].tool_calls[0].args is None  # null leaf stays null
    assert t[0].tool_calls[0].name == "search"
