"""Asymmetric (RSA-OAEP) envelope mode — C9/C10 parity.

Mirrors the reference's GCP asymmetric tests: encrypt is local after a
single public-key fetch (``GCPKeyManagementServiceTest.java:106-129``
verifies by decrypting with the real private key); wrong-key decrypt is a
typed client error; the private key never leaves the KMS.
"""

from __future__ import annotations

import pytest

from cdcrypt.envelope import decrypt_batch, encrypt_batch, parse_envelope_full
from cdcrypt.errors import ClientErrorException
from cdcrypt.kms import MockKMS


def test_asym_roundtrip_and_call_accounting():
    kms = MockKMS()
    pem = kms.asym_public_pem("k/asym")          # the ONE fetch (C9 init)
    vals = ["alpha", None, "ünïcode ✓", "", b"raw-bytes"]
    enc = encrypt_batch(vals, "k/asym", kms, public_key_pem=pem)
    assert enc[1] is None                        # null passthrough (O2)
    # encrypt made ZERO symmetric-KMS calls: DEK wrapped locally under pem
    assert kms.wrap_calls == 0 and kms.public_key_fetches == 1
    version, key_id, wrapped, _, _ = parse_envelope_full(
        __import__("base64").b64decode(enc[0]))
    assert version == 2 and key_id == "k/asym"
    assert len(wrapped) == 256                   # RSA-2048 OAEP block
    cache: dict = {}
    dec = decrypt_batch(enc, kms, dek_cache=cache)
    assert dec[:4] == ["alpha", None, "ünïcode ✓", ""]
    assert dec[4] == "raw-bytes"                 # str output decodes utf-8
    # one private-key unwrap for the whole batch (executor-local cache)
    assert kms.asym_unwrap_calls == 1


def test_asym_wrong_private_key_is_client_error():
    kms_a, kms_b = MockKMS(), MockKMS()
    enc = encrypt_batch(["secret"], "k/x", kms_a,
                        public_key_pem=kms_a.asym_public_pem("k/x"))
    with pytest.raises(ClientErrorException, match="wrong key"):
        # kms_b generates a DIFFERENT keypair for the same key id
        decrypt_batch(enc, kms_b)


def test_asym_rejects_context():
    kms = MockKMS()
    with pytest.raises(ClientErrorException, match="context"):
        encrypt_batch(["v"], "k/x", kms, context={"a": "b"},
                      public_key_pem=kms.asym_public_pem("k/x"))


def test_asym_public_fetch_failure_is_typed():
    kms = MockKMS(fail_mode="server")
    with pytest.raises(Exception, match="unavailable"):
        kms.asym_public_pem("k/x")               # init() failure path


def test_asym_dataframe_roundtrip(spark):
    from cdcrypt.operators.transform import (
        ConfigError, TransformConfig, decrypt_fields, encrypt_fields,
    )

    kms = MockKMS()
    df = spark.createDataFrame(
        [("c1", "hello"), ("c2", None), ("c3", "wörld")], ["conv_id", "text"])
    enc = encrypt_fields(df, ["$.text"], key_id="k/asym", kms=kms,
                         asymmetric=True)
    # public key fetched exactly once, at plan-compile time (driver-side)
    assert kms.public_key_fetches == 1
    out = {r.conv_id: r.text
           for r in decrypt_fields(enc, ["$.text"], key_id="k/asym",
                                   kms=kms).collect()}
    assert out == {"c1": "hello", "c2": None, "c3": "wörld"}
    # jvm backend cannot do RSA — config error, not silent fallback
    with pytest.raises(ConfigError):
        TransformConfig(mode="encrypt", fields=["$.text"], key_id="k",
                        asymmetric=True, backend="jvm")


def test_schemaless_json_payload_engine_api(spark):
    """O3 as an engine API (was test-only in round 1): parse -> transform ->
    repack, pageviews shape (e2e/vault_config.json:14-30)."""
    import json

    from pyspark.sql import functions as F

    from cdcrypt.operators.schemaless import (
        decrypt_json_payload, encrypt_json_payload,
    )

    kms = MockKMS()
    raw = spark.createDataFrame(
        [(1, '{"userid":"User_1","pageid":"Page_11","viewtime":91}'),
         (2, '{"userid":"User_2","pageid":null,"viewtime":92}'),
         (3, None)],                              # null payload passthrough
        "rec_id long, value string")
    schema = "userid string, pageid string, viewtime long"
    enc = encrypt_json_payload(raw, "value", schema,
                               ["$.userid", "$.pageid"], key_id="k/e2e",
                               kms=kms)
    dec = decrypt_json_payload(enc, "value", schema, ["$.userid"],
                               key_id="k/e2e", kms=kms)
    rows = {r.rec_id: r.value for r in dec.collect()}
    assert rows[3] is None
    v1, v2 = json.loads(rows[1]), json.loads(rows[2])
    assert v1["userid"] == "User_1" and v2["userid"] == "User_2"
    assert len(v1["pageid"]) > 40                # still ciphertext
    assert v2["pageid"] is None                  # null field kept, not dropped
    assert (v1["viewtime"], v2["viewtime"]) == (91, 92)
    # collision with a frame column is a config error, not shadowing
    from cdcrypt.operators.transform import ConfigError
    bad = raw.withColumnRenamed("rec_id", "userid")
    with pytest.raises(ConfigError, match="collide"):
        encrypt_json_payload(bad, "value", schema, ["$.userid"],
                             key_id="k", kms=kms)
    _ = F  # imported for parity with sibling tests


def test_schemaless_malformed_json_is_a_data_error(spark):
    """Corrupt payload bytes must FAIL the job (Connect converter
    DataException analogue), never be silently replaced by an all-null
    fabricated object (review find r2)."""
    from cdcrypt.operators.schemaless import encrypt_json_payload

    raw = spark.createDataFrame(
        [(1, '{"userid":"u1","viewtime":1}'), (2, "{not json")],
        "rec_id long, value string")
    enc = encrypt_json_payload(raw, "value", "userid string, viewtime long",
                               ["$.userid"], key_id="k")
    with pytest.raises(Exception, match="(?i)malformed|failfast|parse"):
        enc.collect()
