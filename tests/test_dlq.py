"""Error tolerance + dead-letter routing (Kafka Connect
``errors.tolerance=all`` / DLQ semantics).

The reference SMT inherits tolerance from the Connect runtime (a poison
record routes to the DLQ topic instead of failing the task); this engine
owns the runtime, so it owns the tolerance: ``on_error='dlq'`` turns
per-row DATA errors into ``value=NULL`` plus a typed entry in the
``ERROR_COL`` array column, and ``split_dlq`` routes quarantined rows to
a dead-letter sink. Transient SERVER errors still raise — infrastructure
faults route to epoch replay (reference Transform.java:124-125), never
to the DLQ.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cdcrypt.envelope import decrypt_batch, encrypt_batch
from cdcrypt.errors import ServerErrorException
from cdcrypt.kms import MockKMS
from cdcrypt.operators.transform import (
    ERROR_COL,
    ConfigError,
    TransformConfig,
    decrypt_fields,
    encrypt_fields,
    split_dlq,
)

KEY = "tenant-a/transcripts"


# ------------------------------------------------------------ batch layer

def test_capture_mode_records_per_item_errors():
    kms = MockKMS()
    enc = list(encrypt_batch(["a", "b", "c"], KEY, kms))
    enc[1] = "!!not-base64!!"
    errs: list = [None] * 3
    out = decrypt_batch(enc, kms, errors_out=errs)
    assert out == ["a", None, "c"]
    assert errs[0] is None and errs[2] is None
    assert errs[1].startswith("ClientErrorException:")
    assert "base64" in errs[1]


def test_capture_mode_typed_classes_and_tamper():
    kms = MockKMS()
    enc = list(encrypt_batch(["a", "b"], KEY, kms, aad=["c1", "c2"]))
    errs: list = [None] * 2
    # swapped AAD: both rows are tamper failures, typed + captured
    out = decrypt_batch(enc, kms, aad=["c2", "c1"], errors_out=errs)
    assert out == [None, None]
    assert all(e and "mismatch" in e for e in errs)
    # revoked key surfaces its subclass name in the error string
    kms2 = MockKMS()
    enc2 = encrypt_batch(["x"], KEY, kms2, context={"shred": "c9"})
    kms2.revoke(KEY, {"shred": "c9"})
    errs2: list = [None]
    assert decrypt_batch(enc2, kms2, context={"shred": "c9"},
                         errors_out=errs2) == [None]
    assert errs2[0].startswith("KeyRevokedException:")


def test_capture_mode_server_errors_still_raise():
    kms = MockKMS()
    enc = encrypt_batch(["a"], KEY, kms)
    bad_kms = MockKMS(fail_mode="server")
    with pytest.raises(ServerErrorException):
        decrypt_batch(enc, bad_kms, errors_out=[None])


# ------------------------------------------------------------ Spark layer

def _stored(spark, kms, poison_ids=(1, 3)):
    rows = [Row(doc_id=i, text=f"text-{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    enc = encrypt_fields(df, ["$.text"], key_id=KEY, kms=kms)
    # deterministic poison: prepend garbage -> invalid base64 envelope
    poison = F.col("doc_id").isin(*poison_ids)
    return enc.withColumn(
        "text", F.when(poison, F.concat(F.lit("!poison!"), F.col("text")))
                 .otherwise(F.col("text")))


def test_dlq_decrypt_quarantines_poison_rows(spark):
    kms = MockKMS()
    out = decrypt_fields(_stored(spark, kms), ["$.text"], key_id=KEY,
                         kms=kms, on_error="dlq")
    assert ERROR_COL in out.columns
    by_id = {r["doc_id"]: r for r in out.collect()}
    for i in (0, 2, 4):
        assert by_id[i]["text"] == f"text-{i}"
        assert by_id[i][ERROR_COL] == []
    for i in (1, 3):
        assert by_id[i]["text"] is None
        (entry,) = by_id[i][ERROR_COL]
        assert entry["field"] == "$.text"
        assert entry["error"].startswith("ClientErrorException:")

    clean, dlq = split_dlq(out)
    assert ERROR_COL not in clean.columns
    assert {r["doc_id"] for r in clean.collect()} == {0, 2, 4}
    assert {r["doc_id"] for r in dlq.collect()} == {1, 3}
    assert all(len(r[ERROR_COL]) == 1 for r in dlq.collect())


def test_dlq_per_field_attribution(spark):
    kms = MockKMS()
    rows = [Row(doc_id=i, a=f"a-{i}", b=f"b-{i}") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, a string, b string")
    enc = encrypt_fields(df, ["$.a", "$.b"], key_id=KEY, kms=kms)
    enc = (enc
           .withColumn("a", F.when(F.col("doc_id") == 0,
                                   F.lit("!x!")).otherwise(F.col("a")))
           .withColumn("b", F.when(F.col("doc_id") == 2,
                                   F.lit("!y!")).otherwise(F.col("b"))))
    out = decrypt_fields(enc, ["$.a", "$.b"], key_id=KEY, kms=kms,
                         on_error="dlq")
    by_id = {r["doc_id"]: r for r in out.collect()}
    assert [e["field"] for e in by_id[0][ERROR_COL]] == ["$.a"]
    assert by_id[0]["a"] is None and by_id[0]["b"] == "b-0"
    assert by_id[1][ERROR_COL] == []
    assert by_id[1]["a"] == "a-1" and by_id[1]["b"] == "b-1"
    assert [e["field"] for e in by_id[2][ERROR_COL]] == ["$.b"]
    assert by_id[2]["b"] is None and by_id[2]["a"] == "a-2"


def test_dlq_gated_out_rows_pass_through(spark):
    kms = MockKMS()
    stored = _stored(spark, kms, poison_ids=(1,)).withColumn(
        "zone", F.when(F.col("doc_id") == 1, "skip").otherwise("go"))
    out = decrypt_fields(stored, ["$.text"], key_id=KEY, kms=kms,
                         on_error="dlq", condition_field="$.zone",
                         condition_equals="go")
    by_id = {r["doc_id"]: r for r in out.collect()}
    # the poison row is gated OUT: untouched ciphertext, NOT quarantined
    assert by_id[1]["text"].startswith("!poison!")
    assert by_id[1][ERROR_COL] == []
    assert by_id[0]["text"] == "text-0" and by_id[0][ERROR_COL] == []


def test_dlq_missing_path_yields_empty_error_col(spark):
    kms = MockKMS()
    df = spark.createDataFrame([Row(doc_id=0)], "doc_id long")
    out = decrypt_fields(df, ["$.absent"], key_id=KEY, kms=kms,
                         on_error="dlq")
    # stable schema contract: ERROR_COL exists even when every path skipped
    (r,) = out.collect()
    assert r[ERROR_COL] == []


def test_dlq_config_validation(spark):
    with pytest.raises(ConfigError, match="decrypt"):
        TransformConfig(mode="encrypt", fields=["$.t"], on_error="dlq")
    with pytest.raises(ConfigError, match="udf backend"):
        TransformConfig(mode="decrypt", fields=["$.t"], on_error="dlq",
                        backend="jvm")
    with pytest.raises(ConfigError, match="exclusive"):
        TransformConfig(mode="decrypt", fields=["$.t"], on_error="dlq",
                        shreddable=True, aad_field="c")
    with pytest.raises(ConfigError, match="one of"):
        TransformConfig(mode="decrypt", fields=["$.t"], on_error="ignore")
    df = spark.createDataFrame([Row(arr=["x"])], "arr array<string>")
    with pytest.raises(ConfigError, match="array"):
        decrypt_fields(df, ["$.arr[*]"], on_error="dlq")


# ------------------------------------------- converter-stage (schemaless)

SL_SCHEMA = "userid string, viewtime bigint"


def _sl_raw(spark):
    # clean / malformed bytes / type mismatch / null payload
    return spark.createDataFrame(
        [(0, '{"userid":"User_0","viewtime":90}'),
         (1, '{"userid":"User_1", viewtime:'),
         (2, '{"userid":"User_2","viewtime":"ninety-two"}'),
         (3, None),
         (4, '{"userid":"User_4","viewtime":94}')],
        "rec_id long, value string")


def test_schemaless_parse_dlq_quarantines_corrupt_payloads(spark):
    """Connect errors.tolerance=all at the CONVERTER stage: a payload
    from_json cannot fully parse passes through byte-unchanged with an
    ERROR_COL entry; clean rows transform normally; split_dlq routes."""
    import json as _json

    from cdcrypt.operators.schemaless import encrypt_json_payload

    kms = MockKMS()
    raw = _sl_raw(spark)
    out = encrypt_json_payload(raw, "value", SL_SCHEMA, ["$.userid"],
                               on_parse_error="dlq", key_id=KEY, kms=kms)
    by_id = {r.rec_id: r for r in out.collect()}
    # clean rows: userid is ciphertext, viewtime intact
    for i in (0, 4):
        v = _json.loads(by_id[i].value)
        assert "User_" not in v["userid"] and len(v["userid"]) > 40
        assert v["viewtime"] == 90 + i
        assert by_id[i][ERROR_COL] == []
    # corrupt rows: BYTE-UNCHANGED passthrough + one converter entry
    orig = {r.rec_id: r.value for r in raw.collect()}
    for i in (1, 2):
        assert by_id[i].value == orig[i]
        (e,) = by_id[i][ERROR_COL]
        assert e["field"] == "value" and e["error"].startswith("parse:")
    # null payload: O2 passthrough, NOT quarantined
    assert by_id[3].value is None and by_id[3][ERROR_COL] == []
    clean, dead = split_dlq(out)
    assert {r.rec_id for r in clean.collect()} == {0, 3, 4}
    assert {r.rec_id for r in dead.collect()} == {1, 2}
    assert ERROR_COL not in clean.columns


def test_schemaless_parse_dlq_shields_strict_decrypt(spark):
    """A quarantined row's half-parsed fields must NOT feed the inner
    transform: with a STRICT decrypt (on_error='fail'), a type-mismatch
    payload whose userid still parsed as a garbage string would fail the
    whole job if it reached the UDF. Tolerant parse nulls the fields for
    quarantined rows (pure O2 passthrough) so the job survives."""
    import json as _json

    from cdcrypt.operators.schemaless import (
        decrypt_json_payload, encrypt_json_payload)

    kms = MockKMS()
    clean = spark.createDataFrame(
        [(0, '{"userid":"User_0","viewtime":90}')], "rec_id long, value string")
    enc = encrypt_json_payload(clean, "value", SL_SCHEMA, ["$.userid"],
                               key_id=KEY, kms=kms)
    # append a payload where userid parses fine as a string but viewtime
    # mistypes -> corrupt slot set, userid holds NON-envelope garbage
    poison = spark.createDataFrame(
        [(1, '{"userid":"not-an-envelope","viewtime":"no"}')],
        "rec_id long, value string")
    dec = decrypt_json_payload(enc.union(poison), "value", SL_SCHEMA,
                               ["$.userid"], on_parse_error="dlq",
                               key_id=KEY, kms=kms)  # on_error defaults fail
    by_id = {r.rec_id: r for r in dec.collect()}  # must not raise
    assert _json.loads(by_id[0].value)["userid"] == "User_0"
    assert by_id[1].value == '{"userid":"not-an-envelope","viewtime":"no"}'
    (e,) = by_id[1][ERROR_COL]
    assert e["field"] == "value"


def test_schemaless_parse_dlq_composes_with_tolerant_decrypt(spark):
    """Converter entries and crypto entries land in the ONE errors array:
    a parse-poisoned row carries (field='value', parse:...) while a
    ciphertext-poisoned row carries (field='$.userid', crypto class)."""
    import json as _json

    from cdcrypt.operators.schemaless import (
        decrypt_json_payload, encrypt_json_payload)

    kms = MockKMS()
    raw = spark.createDataFrame(
        [(0, '{"userid":"User_0","viewtime":90}'),
         (1, '{"userid":"User_1","viewtime":91}')],
        "rec_id long, value string")
    enc = encrypt_json_payload(raw, "value", SL_SCHEMA, ["$.userid"],
                               key_id=KEY, kms=kms)
    # poison row 1's ciphertext INSIDE valid JSON (crypto error), and add
    # row 2 with malformed bytes (converter error)
    poisoned = enc.withColumn(
        "value",
        F.when(F.col("rec_id") == 1,
               F.lit('{"userid":"!poison!","viewtime":91}'))
        .otherwise(F.col("value")))
    mal = spark.createDataFrame([(2, '{"userid": broken')],
                                "rec_id long, value string")
    dec = decrypt_json_payload(poisoned.union(mal), "value", SL_SCHEMA,
                               ["$.userid"], on_parse_error="dlq",
                               on_error="dlq", key_id=KEY, kms=kms)
    by_id = {r.rec_id: r for r in dec.collect()}
    assert _json.loads(by_id[0].value)["userid"] == "User_0"
    assert by_id[0][ERROR_COL] == []
    (e1,) = by_id[1][ERROR_COL]
    assert e1["field"] == "$.userid" and "parse:" not in e1["error"]
    # crypto-quarantined row still repacks (value=NULL for the field)
    assert _json.loads(by_id[1].value)["userid"] is None
    (e2,) = by_id[2][ERROR_COL]
    assert e2["field"] == "value" and e2["error"].startswith("parse:")
    assert by_id[2].value == '{"userid": broken'
    clean, dead = split_dlq(dec)
    assert {r.rec_id for r in dead.collect()} == {1, 2}


def test_schemaless_parse_dlq_tolerant_inference(spark):
    """schema=None + on_parse_error='dlq': corrupt sample records are
    EXCLUDED from inference (they only ever reach the DLQ, so they must
    not shape the schema); an all-corrupt sample still raises loudly."""
    from cdcrypt.operators.schemaless import (
        encrypt_json_payload, infer_payload_schema)

    kms = MockKMS()
    raw = _sl_raw(spark)
    inferred = infer_payload_schema(raw, "value", tolerant=True)
    assert {f.name for f in inferred.fields} == {"userid", "viewtime"}
    # end to end with inference: strict_fields defaults True for inferred
    # schemas; the corrupt rows bypass the strict check via quarantine
    out = encrypt_json_payload(raw, "value", None, ["$.userid"],
                               on_parse_error="dlq", key_id=KEY, kms=kms)
    by_id = {r.rec_id: r for r in out.collect()}
    assert by_id[1][ERROR_COL] != [] and by_id[3][ERROR_COL] == []
    allbad = spark.createDataFrame([('{"x": 1',), ('{"y":',)],
                                   "value string")
    with pytest.raises(ConfigError, match="every sampled payload"):
        infer_payload_schema(allbad, "value", tolerant=True)


def test_schemaless_parse_fail_default_still_failfast(spark):
    """Default tolerance unchanged: one poison payload fails the job
    (Connect errors.tolerance=none), and bad knob values raise."""
    from cdcrypt.operators.schemaless import encrypt_json_payload

    kms = MockKMS()
    raw = _sl_raw(spark)
    strict = encrypt_json_payload(raw, "value", SL_SCHEMA, ["$.userid"],
                                  key_id=KEY, kms=kms)
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        strict.collect()
    with pytest.raises(ConfigError, match="one of"):
        encrypt_json_payload(raw, "value", SL_SCHEMA, ["$.userid"],
                             on_parse_error="ignore", key_id=KEY, kms=kms)


def test_schemaless_parse_dlq_quarantines_late_unknown_keys(spark):
    """A payload key first appearing AFTER the inference sample is a
    CONVERTER error under tolerance, not a job-killer: the row passes
    byte-unchanged with a named-key error entry while covered rows
    transform; strict mode (default) still raises. Triage messages
    distinguish malformed bytes / unknown key / type mismatch."""
    from cdcrypt.operators.schemaless import encrypt_json_payload

    kms = MockKMS()
    raw = spark.createDataFrame(
        [(0, '{"userid":"User_0","viewtime":90}'),
         (1, '{"userid":"User_1","viewtime":91,"surprise":1}'),
         (2, '{"userid":"User_2", broken'),
         (3, '{"userid":"User_3","viewtime":"nope"}')],
        "rec_id long, value string").coalesce(1)
    # schema inferred from row 0 only -> 'surprise' is uncovered
    out = encrypt_json_payload(raw, "value", None, ["$.userid"],
                               on_parse_error="dlq", infer_sample=1,
                               key_id=KEY, kms=kms)
    by_id = {r.rec_id: r for r in out.collect()}  # must not raise
    assert "User_0" not in by_id[0].value and by_id[0][ERROR_COL] == []
    orig = {r.rec_id: r.value for r in raw.collect()}
    errs = {}
    for i in (1, 2, 3):
        assert by_id[i].value == orig[i]
        (e,) = by_id[i][ERROR_COL]
        errs[i] = e["error"]
    assert "absent from the schema" in errs[1] and "surprise" in errs[1]
    assert errs[2].startswith("parse: malformed JSON bytes")
    assert "type mismatch" in errs[3]
    # strict mode still fails loud on the uncovered key
    strict = encrypt_json_payload(
        raw.where("rec_id <= 1"), "value", None, ["$.userid"],
        infer_sample=1, key_id=KEY, kms=kms)
    with pytest.raises(Exception, match="surprise"):
        strict.collect()
