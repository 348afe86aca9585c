"""Key-rotation rewrap (C12): envelope.rewrap_batch / transform.rewrap_fields.

The rotation model of the AWS Encryption SDK: rotating the MASTER key
only re-wraps data keys — the AES-GCM payload bytes must be untouched,
KMS work must be O(distinct DEKs), and decryption under the new key id
must succeed while the old id verification fails.
"""

from __future__ import annotations

import base64

import pytest
from pyspark.sql import functions as F

from cdcrypt.envelope import (
    encrypt_batch, decrypt_batch, parse_envelope_full, rewrap_batch,
)
from cdcrypt.errors import ClientErrorException
from cdcrypt.kms import MockKMS
from cdcrypt.operators.transform import (
    ConfigError, decrypt_fields, encrypt_fields, rewrap_fields,
)


def test_rewrap_roundtrip_payload_untouched():
    kms = MockKMS()
    pts = [f"msg {i}" for i in range(50)] + [None]
    env = encrypt_batch(pts, "keys/old", kms)
    rot = rewrap_batch(env, "keys/new", kms)
    assert rot[-1] is None
    for e, r in zip(env[:-1], rot[:-1]):
        v_e, kid_e, w_e, nonce_e, ct_e = parse_envelope_full(
            base64.b64decode(e))
        v_r, kid_r, w_r, nonce_r, ct_r = parse_envelope_full(
            base64.b64decode(r))
        assert (kid_e, kid_r) == ("keys/old", "keys/new")
        assert w_e != w_r
        # the header-only claim: payload bytes identical
        assert (nonce_e, ct_e) == (nonce_r, ct_r)
    assert decrypt_batch(rot, kms, expect_key_id="keys/new") == pts
    with pytest.raises(ClientErrorException, match="keys/old"):
        decrypt_batch(rot, kms, expect_key_id="keys/old")


def test_rewrap_kms_work_is_per_dek_not_per_row():
    kms = MockKMS()
    env = encrypt_batch([f"m{i}" for i in range(500)], "keys/old", kms)
    u0, w0 = kms.unwrap_calls, kms.wrap_calls
    rewrap_batch(env, "keys/new", kms, rewrap_cache={})
    # one batch = one DEK: exactly one unwrap + one wrap for 500 rows
    assert (kms.unwrap_calls - u0, kms.wrap_calls - w0) == (1, 1)
    # binary envelopes rewrap too, preserving their encoding
    benv = encrypt_batch(["x"], "keys/old", kms, encoding="binary")
    rb = rewrap_batch(benv, "keys/new", kms)
    assert isinstance(rb[0], (bytes, bytearray))
    assert decrypt_batch(rb, kms) == ["x"]


def test_rewrap_refuses_convergent_and_checks_expected_key():
    kms = MockKMS()
    det = encrypt_batch(["a"], "keys/old", kms, deterministic=True,
                        context={"t": "1"})
    with pytest.raises(ClientErrorException, match="convergent"):
        rewrap_batch(det, "keys/new", kms)
    env = encrypt_batch(["a"], "keys/old", kms)
    with pytest.raises(ClientErrorException, match="expected"):
        rewrap_batch(env, "keys/new", kms, expect_key_id="keys/other")
    # error carries the failing row index like decrypt_batch
    try:
        rewrap_batch([env[0], "!!!not-base64!!!"], "keys/new", kms)
    except ClientErrorException as e:
        assert e.batch_index == 1
    else:
        raise AssertionError("expected a client error")


def test_rewrap_asymmetric_to_symmetric():
    kms = MockKMS()
    pem = kms.asym_public_pem("keys/rsa")
    env = encrypt_batch(["secret"], "keys/rsa", kms, public_key_pem=pem)
    rot = rewrap_batch(env, "keys/sym", kms)
    v, kid, _, _, _ = parse_envelope_full(base64.b64decode(rot[0]))
    assert (v, kid) == (1, "keys/sym")  # now a symmetric wrap
    assert decrypt_batch(rot, kms, expect_key_id="keys/sym") == ["secret"]


def test_rewrap_fields_end_to_end(spark):
    kms = MockKMS()
    df = spark.createDataFrame(
        [("a", "alpha"), ("b", None), ("c", "gamma")], ["id", "text"])
    enc = encrypt_fields(df, ["$.text"], key_id="keys/old", kms=kms)
    rot = rewrap_fields(enc, ["$.text"], "keys/new", kms=kms)
    dec = decrypt_fields(rot, ["$.text"], key_id="keys/new", kms=kms)
    assert {(r["id"], r["text"]) for r in dec.collect()} \
        == {("a", "alpha"), ("b", None), ("c", "gamma")}
    # old-key verification now fails on the rotated column
    bad = decrypt_fields(rot, ["$.text"], key_id="keys/old", kms=kms)
    with pytest.raises(Exception, match="keys/old"):
        bad.collect()
    # condition gate: only matching rows rotate
    gated = rewrap_fields(enc, ["$.text"], "keys/new", kms=kms,
                          condition_field="$.id", condition_equals="a")
    kid_of = F.udf(lambda s: None if s is None else parse_envelope_full(
        base64.b64decode(s))[1])
    kids = {r["id"]: r["k"] for r in gated.select(
        "id", kid_of("text").alias("k")).collect()}
    assert kids == {"a": "keys/new", "b": None, "c": "keys/old"}
    # missing path skips; array paths refuse
    assert rewrap_fields(enc, ["$.nope"], "keys/new", kms=kms) is enc
    with pytest.raises(ConfigError, match="array"):
        rewrap_fields(enc, ["$.text[*]"], "keys/new", kms=kms)


def test_rewrap_mixed_key_column(spark):
    """A column carrying envelopes from two master keys (mid-rotation
    history) converges onto one key in a single pass."""
    kms = MockKMS()
    a = encrypt_batch(["one"], "keys/k1", kms)
    b = encrypt_batch(["two"], "keys/k3", kms)
    df = spark.createDataFrame([("a", a[0]), ("b", b[0])], ["id", "text"])
    rot = rewrap_fields(df, ["$.text"], "keys/k2", kms=kms)
    dec = decrypt_fields(rot, ["$.text"], key_id="keys/k2", kms=kms)
    assert {(r["id"], r["text"]) for r in dec.collect()} \
        == {("a", "one"), ("b", "two")}
