"""Crypto-shredding (GDPR-style erasure on immutable storage).

A shreddable column gets one data key per (batch x distinct aad identity),
wrapped under KMS context ``{'shred': <identity>}``. Revoking that
(key_id, context) at the KMS destroys the key material: the ciphertext
stays on the lake, the data is permanently unreadable. The reference has
no analogue (its SMT delegates key lifecycle to Vault/AWS/GCP — e.g.
VaultClientImpl.java key-name plumbing); this is the canonical reason a
CDC pipeline field-encrypts transcripts before an immutable lake.

Covers: KMS revocation semantics (unwrap/wrap/derive refusal), typed
KeyRevokedException surviving the batch-index wrap, per-identity grouping
reassembly, the Spark read contracts (strict failure vs revoked_to_null),
and config validation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from cdcrypt.envelope import decrypt_batch, encrypt_batch
from cdcrypt.errors import ClientErrorException, KeyRevokedException, classify
from cdcrypt.functions.crypto_udfs import _per_aad_groups, _shred_context
from cdcrypt.kms import MockKMS
from cdcrypt.operators.transform import (
    ConfigError,
    TransformConfig,
    decrypt_fields,
    encrypt_fields,
)

KEY = "tenant-a/transcripts"


# ---------------------------------------------------------------- KMS layer

def test_revoke_destroys_unwrap_for_context_only():
    kms = MockKMS()
    enc_a = encrypt_batch(["a"], KEY, kms, context={"shred": "conv-a"})
    enc_b = encrypt_batch(["b"], KEY, kms, context={"shred": "conv-b"})
    kms.revoke(KEY, {"shred": "conv-a"})
    with pytest.raises(KeyRevokedException) as ei:
        decrypt_batch(enc_a, kms, context={"shred": "conv-a"})
    # typed subclass survives the row-index wrap (envelope.py) so
    # revocation-aware readers can catch it specifically
    assert ei.value.batch_index == 0 and ei.value.key_id == KEY
    assert isinstance(ei.value, ClientErrorException)  # fatal, not retriable
    assert classify(ei.value) == "fatal"
    # sibling identity under the same master key is untouched
    assert decrypt_batch(enc_b, kms, context={"shred": "conv-b"}) == ["b"]


def test_revoke_refuses_new_writes_and_derivation():
    kms = MockKMS()
    kms.revoke(KEY, {"shred": "gone"})
    # writing under a revoked context would create instantly-dead data:
    # refused at write time, not first read
    with pytest.raises(KeyRevokedException):
        encrypt_batch(["x"], KEY, kms, context={"shred": "gone"})
    with pytest.raises(KeyRevokedException):
        kms.derive_deterministic_dek(KEY, {"shred": "gone"})
    # base context (no identity) unaffected
    assert decrypt_batch(encrypt_batch(["y"], KEY, kms), kms) == ["y"]


def test_revocation_is_context_and_key_scoped():
    kms = MockKMS()
    kms.revoke(KEY, {"shred": "c1"})
    # same context under a DIFFERENT master key is fine
    other = encrypt_batch(["z"], "tenant-b/other", kms,
                          context={"shred": "c1"})
    assert decrypt_batch(other, kms, context={"shred": "c1"}) == ["z"]


# ------------------------------------------------------ grouping primitive

def test_per_aad_groups_reassembles_in_order():
    calls: list[tuple] = []

    def fn(vals, aad, aval):
        calls.append((tuple(vals), aval))
        return [f"{aval}:{v}" for v in vals]

    out = _per_aad_groups(
        ["v0", "v1", "v2", "v3", "v4"],
        ["a", "b", "a", None, "b"], fn)
    assert out == ["a:v0", "b:v1", "a:v2", "None:v3", "b:v4"]
    # one group_fn call per DISTINCT identity (= one KMS wrap each)
    assert sorted(calls, key=str) == sorted(
        [(("v0", "v2"), "a"), (("v1", "v4"), "b"), (("v3",), None)],
        key=str)
    with pytest.raises(ValueError, match="aad"):
        _per_aad_groups(["v"], None, fn)


def test_shred_context_composes_with_base():
    assert _shred_context(None, "c1") == {"shred": "c1"}
    assert _shred_context({"team": "a"}, "c1") == {"team": "a", "shred": "c1"}
    assert _shred_context({"team": "a"}, None) == {"team": "a"}
    assert _shred_context(None, b"c2") == {"shred": "c2"}


# ------------------------------------------------------------- Spark layer

def _fixture(spark):
    rows = [
        Row(conv_id="conv-0", text="alpha"),
        Row(conv_id="conv-1", text="bravo"),
        Row(conv_id="conv-1", text="charlie"),
        Row(conv_id="conv-2", text="delta"),
        Row(conv_id=None, text="echo"),  # no identity -> base context
    ]
    return spark.createDataFrame(rows, "conv_id string, text string")


def _encrypted_rows(spark, kms):
    enc = encrypt_fields(
        _fixture(spark).coalesce(1), ["$.text"],
        key_id=KEY, kms=kms, aad_field="conv_id", shreddable=True)
    rows = enc.collect()  # materialize BEFORE any revocation
    assert all(r["text"] != p for r, p in zip(rows, [""] * 5) if r["text"])
    return spark.createDataFrame(rows, "conv_id string, text string")


def test_shreddable_roundtrip_and_revoked_to_null(spark):
    kms = MockKMS()
    stored = _encrypted_rows(spark, kms)

    # pre-revocation: every row decrypts
    dec = decrypt_fields(stored, ["$.text"], key_id=KEY, kms=kms,
                         aad_field="conv_id", shreddable=True)
    got = {(r["conv_id"], r["text"]) for r in dec.collect()}
    assert got == {("conv-0", "alpha"), ("conv-1", "bravo"),
                   ("conv-1", "charlie"), ("conv-2", "delta"),
                   (None, "echo")}

    # erase conv-1; build the read plan AFTER the revocation
    kms.revoke(KEY, {"shred": "conv-1"})
    dec2 = decrypt_fields(stored, ["$.text"], key_id=KEY, kms=kms,
                          aad_field="conv_id", shreddable=True,
                          revoked_to_null=True)
    got2 = {(r["conv_id"], r["text"]) for r in dec2.collect()}
    assert got2 == {("conv-0", "alpha"), ("conv-1", None),
                    ("conv-2", "delta"), (None, "echo")}


def test_shredded_strict_read_fails_loudly(spark):
    kms = MockKMS()
    stored = _encrypted_rows(spark, kms)
    kms.revoke(KEY, {"shred": "conv-2"})
    strict = decrypt_fields(stored, ["$.text"], key_id=KEY, kms=kms,
                            aad_field="conv_id", shreddable=True)
    with pytest.raises(Exception, match="revoked"):
        strict.collect()


def test_shreddable_config_validation():
    with pytest.raises(ConfigError, match="aad_field"):
        TransformConfig(mode="encrypt", fields=["$.t"], shreddable=True)
    with pytest.raises(ConfigError, match="udf backend"):
        TransformConfig(mode="encrypt", fields=["$.t"], shreddable=True,
                        aad_field="c", backend="jvm")
    with pytest.raises(ConfigError, match="symmetric"):
        TransformConfig(mode="encrypt", fields=["$.t"], shreddable=True,
                        aad_field="c", asymmetric=True)
    with pytest.raises(ConfigError, match="symmetric"):
        TransformConfig(mode="encrypt", fields=["$.t"], shreddable=True,
                        aad_field="c", deterministic=True)
    with pytest.raises(ConfigError, match="revoked_to_null"):
        TransformConfig(mode="decrypt", fields=["$.t"],
                        revoked_to_null=True)


def test_shreddable_rejects_array_paths(spark):
    kms = MockKMS()
    df = spark.createDataFrame(
        [Row(conv_id="c", arr=["x"])], "conv_id string, arr array<string>")
    with pytest.raises(ConfigError, match="array"):
        encrypt_fields(df, ["$.arr[*]"], key_id=KEY, kms=kms,
                       aad_field="conv_id", shreddable=True)
