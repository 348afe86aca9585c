"""JVM crypto backend (functions/crypto_jvm.py): envelope parity with the
pandas-UDF backend, cross-backend compatibility in both directions, gate /
null / AAD semantics, lineage-supplied wrapped DEKs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdcrypt.envelope import decrypt_batch, encrypt_batch
from cdcrypt.kms import MockKMS
from cdcrypt.operators.transform import FieldTransform, TransformConfig

KEY = "cdcrypt/jvm-tests"


def _df(spark):
    rows = [
        ("c1", "hello world", "click"),
        ("c2", None, "click"),
        ("c3", "unicode ✓ 日本語", "view"),
        ("c4", "", "click"),
    ]
    return spark.createDataFrame(rows, "conv_id string, text string, ev string")


def _enc(mode="encrypt", **kw):
    return FieldTransform(TransformConfig(
        mode=mode, fields=["$.text"], key_id=KEY, **kw))


def test_jvm_roundtrip_with_aad(spark):
    df = _df(spark)
    enc_t = _enc(backend="jvm", aad_field="conv_id")
    enc = enc_t.apply(df)
    assert len(enc_t.last_wrapped_deks) == 1  # one DEK per micro-batch
    dec = _enc("decrypt", backend="jvm", aad_field="conv_id",
               wrapped_deks=enc_t.last_wrapped_deks).apply(enc)
    got = {r.conv_id: r.text for r in dec.collect()}
    assert got == {"c1": "hello world", "c2": None,
                   "c3": "unicode ✓ 日本語", "c4": ""}


def _materialize(spark, df):
    """Decrypt-side inputs are materialized tables in the engine (lake
    reads); a lazy plan containing a nondeterministic encrypt would mint
    fresh DEKs on every evaluation (incl. the discovery scan)."""
    return spark.createDataFrame(df.collect(), df.schema)


def test_jvm_decrypt_discovers_deks_without_lineage(spark):
    df = _df(spark)
    enc = _materialize(spark, _enc(backend="jvm").apply(df))
    dec = _enc("decrypt", backend="jvm").apply(enc)  # discovery scan path
    got = {r.conv_id: r.text for r in dec.collect()}
    assert got["c1"] == "hello world" and got["c2"] is None


def test_cross_backend_udf_encrypt_jvm_decrypt(spark):
    df = _df(spark)
    enc = _materialize(spark, _enc(backend="udf", aad_field="conv_id").apply(df))
    dec = _enc("decrypt", backend="jvm", aad_field="conv_id").apply(enc)
    got = {r.conv_id: r.text for r in dec.collect()}
    assert got["c1"] == "hello world" and got["c3"].startswith("unicode")


def test_cross_backend_jvm_encrypt_udf_decrypt(spark):
    df = _df(spark)
    enc = _enc(backend="jvm", aad_field="conv_id").apply(df)
    dec = _enc("decrypt", backend="udf", aad_field="conv_id").apply(enc)
    got = {r.conv_id: r.text for r in dec.collect()}
    assert got == {"c1": "hello world", "c2": None,
                   "c3": "unicode ✓ 日本語", "c4": ""}


def test_jvm_envelope_decryptable_by_pure_python(spark):
    # and python-encrypted envelopes decrypt through the JVM expression
    kms = MockKMS()
    df = _df(spark)
    t = _enc(backend="jvm", aad_field="conv_id", kms=kms)
    rows = t.apply(df).collect()
    vals = {r.conv_id: r.text for r in rows}
    assert decrypt_batch([vals["c1"]], kms, aad=["c1"]) == ["hello world"]
    py_env = encrypt_batch(["from python"], KEY, kms, aad=["c9"])
    pdf = spark.createDataFrame([("c9", py_env[0], "click")],
                                "conv_id string, text string, ev string")
    out = _enc("decrypt", backend="jvm", aad_field="conv_id",
               kms=kms).apply(pdf).collect()
    assert out[0].text == "from python"


def test_jvm_condition_gate_passthrough(spark):
    # O6: non-matching rows byte-identical passthrough, no crypto paid
    df = _df(spark)
    enc = _enc(backend="jvm", condition_field="$.ev",
               condition_equals="click").apply(df)
    got = {r.conv_id: r.text for r in enc.collect()}
    assert got["c3"] == "unicode ✓ 日本語"  # gated out
    assert got["c1"] != "hello world" and len(got["c1"]) > 40
    dec = _enc("decrypt", backend="jvm", condition_field="$.ev",
               condition_equals="click").apply(enc)
    got2 = {r.conv_id: r.text for r in dec.collect()}
    assert got2["c1"] == "hello world" and got2["c3"] == got["c3"]


def test_jvm_wrong_aad_raises(spark):
    df = _df(spark)
    enc_t = _enc(backend="jvm", aad_field="conv_id")
    enc = enc_t.apply(df).withColumn("conv_id", F.concat(F.col("conv_id"),
                                                         F.lit("X")))
    dec = _enc("decrypt", backend="jvm", aad_field="conv_id",
               wrapped_deks=enc_t.last_wrapped_deks).apply(enc)
    with pytest.raises(Exception):
        dec.collect()


def test_jvm_foreign_key_id_raises(spark):
    df = _df(spark)
    enc = _enc(backend="jvm").apply(df)
    other = FieldTransform(TransformConfig(
        mode="decrypt", fields=["$.text"], key_id="cdcrypt/other",
        backend="jvm", wrapped_deks=[b"x" * 60]))
    with pytest.raises(Exception, match="key id|unwrap|DEK"):
        other.apply(enc).collect()


def test_jvm_binary_encoding_roundtrip(spark):
    df = _df(spark)
    enc = _enc(backend="jvm", encoding="binary").apply(df)
    assert dict(enc.dtypes)["text"] == "binary"
    dec = _enc("decrypt", backend="jvm").apply(enc)
    got = {r.conv_id: r.text for r in dec.collect()}
    assert got["c1"] == "hello world"


def test_jvm_dek_literals_redacted_in_plan_strings(spark):
    """ADVICE r1: plaintext DEKs ride the plan as 32-byte binary literals;
    the redaction regex must mask them in every rendered plan (explain,
    event logs, UI SQL tab)."""
    import contextlib
    import io

    df = _df(spark)
    t = _enc(backend="jvm")
    enc = t.apply(df)
    kms = MockKMS()
    dek_hexes = [kms.unwrap(w, KEY).hex().upper()
                 for w in t.last_wrapped_deks]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        enc.explain(True)
    plan = buf.getvalue()
    assert "redacted" in plan
    for h in dek_hexes:
        assert h not in plan and h.lower() not in plan
    # decrypt side embeds the hex->dek map literal — also redacted
    dec = _enc("decrypt", backend="jvm",
               wrapped_deks=t.last_wrapped_deks).apply(enc)
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        dec.explain(True)
    plan2 = buf2.getvalue()
    for h in dek_hexes:
        assert h not in plan2 and h.lower() not in plan2


def test_jvm_decrypt_validates_wrapped_len_field(spark):
    """ADVICE r1: a KMS whose wrap size differs must fail loudly at the
    format layer, not as an opaque GCM tag error."""
    import base64
    import struct as pystruct

    from cdcrypt.envelope import _build_header

    kms = MockKMS()
    dek, wrapped = kms.generate_data_key(KEY)
    # forge an envelope claiming a 48-byte wrapped DEK
    hdr = _build_header(KEY, wrapped[:48])
    bogus = base64.b64encode(hdr + b"\x00" * 28).decode()
    assert pystruct.unpack(">H", hdr[2 + len(KEY):4 + len(KEY)])[0] == 48
    df = spark.createDataFrame([("c1", bogus)], "conv_id string, text string")
    dec = _enc("decrypt", backend="jvm",
               wrapped_deks=[wrapped]).apply(df)
    with pytest.raises(Exception, match="wrapped-DEK length"):
        dec.collect()
