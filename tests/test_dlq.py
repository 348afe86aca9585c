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
