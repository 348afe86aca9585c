"""Convergent (deterministic) encryption + Key/Value routing (C4 / O11).

Vault's derived-key mode makes ciphertext a pure function of
(key_id, context, aad, plaintext); the engine uses it for KEY columns so
equality — and therefore partitioning, dedup, joins and MERGE — survives
encryption. Value columns keep randomized per-batch-DEK envelopes.
"""

from __future__ import annotations

import base64

import pytest

from cdcrypt.envelope import decrypt_batch, encrypt_batch, parse_envelope_full
from cdcrypt.errors import ClientErrorException
from cdcrypt.kms import MockKMS


def test_det_envelope_is_deterministic_and_roundtrips():
    kms = MockKMS()
    vals = ["conv42", None, "conv42", "conv43", ""]
    enc1 = encrypt_batch(vals, "k/det", kms, deterministic=True)
    enc2 = encrypt_batch(vals, "k/det", MockKMS(), deterministic=True)
    assert enc1 == enc2                      # across batches AND instances
    assert enc1[0] == enc1[2]                # equal plaintext -> equal ct
    assert enc1[0] != enc1[3]
    assert enc1[1] is None                   # null passthrough
    assert kms.wrap_calls == 0               # no per-batch wrap call
    version, key_id, wrapped, _, _ = parse_envelope_full(
        base64.b64decode(enc1[0]))
    assert version == 3 and key_id == "k/det" and wrapped == b""
    assert decrypt_batch(enc1, MockKMS()) == vals


def test_det_aad_and_context_bind():
    kms = MockKMS()
    a = encrypt_batch(["x"], "k", kms, aad=["rowA"], deterministic=True)
    b = encrypt_batch(["x"], "k", kms, aad=["rowB"], deterministic=True)
    assert a != b                            # AAD participates in the PRF
    c = encrypt_batch(["x"], "k", kms, context={"t": "1"}, deterministic=True)
    assert a != c                            # context derives a new DEK
    with pytest.raises(ClientErrorException):
        decrypt_batch(c, kms)                # context required to re-derive
    assert decrypt_batch(c, kms, context={"t": "1"}) == ["x"]


def test_det_groupby_on_ciphertext_matches_plaintext_grouping(spark):
    from pyspark.sql import functions as F

    from cdcrypt.operators.transform import decrypt_fields, encrypt_fields

    rows = [(f"conv{i % 7}", i) for i in range(200)]
    df = spark.createDataFrame(rows, ["conv_id", "n"])
    enc = encrypt_fields(df, ["$.conv_id"], key_id="k/det",
                         deterministic=True)
    # grouping happens ON CIPHERTEXT — equality survived encryption
    grouped = enc.groupBy("conv_id").agg(F.count(F.lit(1)).alias("cnt"))
    dec = decrypt_fields(grouped, ["$.conv_id"], key_id="k/det")
    got = {r.conv_id: r.cnt for r in dec.collect()}
    exp = {f"conv{i}": len([x for x in range(200) if x % 7 == i])
           for i in range(7)}
    assert got == exp


def test_key_value_routing(spark):
    from cdcrypt.operators.routing import KeyValueTransform
    from cdcrypt.operators.transform import ConfigError

    df = spark.createDataFrame(
        [("c1", "same text"), ("c1", "same text"), ("c2", "same text")],
        ["conv_id", "text"])
    enc = KeyValueTransform("encrypt", key_fields=["$.conv_id"],
                            value_fields=["$.text"],
                            key_id="k/route").apply(df)
    rows = enc.collect()
    keys = [r.conv_id for r in rows]
    texts = [r.text for r in rows]
    # key route convergent: equal conv_ids -> equal ciphertext
    assert keys[0] == keys[1] and keys[0] != keys[2]
    # value route randomized: identical texts -> DISTINCT envelopes
    assert len(set(texts)) == 3
    # one decrypt config reads both operands (version auto-detect)
    dec = KeyValueTransform("decrypt", key_fields=["$.conv_id"],
                            value_fields=["$.text"],
                            key_id="k/route").apply(enc)
    got = sorted((r.conv_id, r.text) for r in dec.collect())
    assert got == [("c1", "same text"), ("c1", "same text"),
                   ("c2", "same text")]
    with pytest.raises(ConfigError, match="deterministic"):
        KeyValueTransform("encrypt", key_fields=["$.conv_id"],
                          key_id="k", deterministic=False)
    with pytest.raises(ConfigError):
        KeyValueTransform("encrypt", key_id="k")  # no fields at all


def test_det_nonce_domain_separation():
    """(aad='a\\x00', pt='b') and (aad='a', pt='\\x00b') must NOT share a
    nonce/ciphertext — ambiguous PRF input would be GCM nonce reuse across
    different plaintexts under the shared derived DEK."""
    kms = MockKMS()
    e1 = encrypt_batch([b"b"], "k", kms, aad=[b"a\x00"], deterministic=True)
    e2 = encrypt_batch([b"\x00b"], "k", kms, aad=[b"a"], deterministic=True)
    n1 = parse_envelope_full(base64.b64decode(e1[0]))[3]
    n2 = parse_envelope_full(base64.b64decode(e2[0]))[3]
    assert n1 != n2


def test_det_dek_cache_is_context_keyed():
    """Worker-wide DEK caches serve every decrypt in the process; the
    convergent cache key must include the context or job B's decrypts get
    job A's derived DEK (review find r2)."""
    kms = MockKMS()
    ea = encrypt_batch(["x"], "k", kms, context={"tenant": "A"},
                       deterministic=True)
    eb = encrypt_batch(["y"], "k", kms, context={"tenant": "B"},
                       deterministic=True)
    shared_cache: dict = {}
    assert decrypt_batch(ea, kms, context={"tenant": "A"},
                         dek_cache=shared_cache) == ["x"]
    assert decrypt_batch(eb, kms, context={"tenant": "B"},
                         dek_cache=shared_cache) == ["y"]
    assert len(shared_cache) == 2
