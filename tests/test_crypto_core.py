"""Crypto-core unit tests mirroring the reference service-layer suite
(SURVEY.md §5.2): round-trip under key/context agreement, typed failure under
disagreement, empty-batch short-circuit, encoding modes, null passthrough."""

from __future__ import annotations

import base64

import pytest

from cdcrypt.envelope import decrypt_batch, encrypt_batch, parse_envelope
from cdcrypt.errors import ClientErrorException, ServerErrorException, classify
from cdcrypt.kms import MockKMS

KEY = "tenant-a/transcripts"

PAYLOADS = [
    "hello",
    "",  # empty string is legal plaintext
    "unicode ✓ 日本語 🧪",
    "x" * 20000,  # >16 KB long text
    None,  # null passthrough (Transform.java:57-60)
    "trailing",
]


def test_roundtrip_string_encoding():
    kms = MockKMS()
    enc = encrypt_batch(PAYLOADS, KEY, kms)
    assert enc[4] is None
    for i, v in enumerate(PAYLOADS):
        if v is not None:
            assert isinstance(enc[i], str) and enc[i] != v
            base64.b64decode(enc[i], validate=True)  # valid base64 (Item.java:34-37)
    dec = decrypt_batch(enc, kms)
    assert dec == PAYLOADS
    assert kms.wrap_calls == 1  # ONE data-key wrap per batch
    assert kms.unwrap_calls == 1  # ONE unwrap per distinct wrapped key


def test_roundtrip_binary_encoding():
    kms = MockKMS()
    raw = [b"\x00\x01binary", None, b""]
    enc = encrypt_batch(raw, KEY, kms, encoding="binary")
    assert isinstance(enc[0], bytes)
    dec = decrypt_batch(enc, kms, output="binary")
    assert dec == raw


def test_aad_binds_row_identity():
    kms = MockKMS()
    vals = ["secret-a", "secret-b"]
    aad = ["conv1", "conv2"]
    enc = encrypt_batch(vals, KEY, kms, aad=aad)
    assert decrypt_batch(enc, kms, aad=aad) == vals
    # swapped AAD -> client error (AWSKeyManagementService.java:142-144 analogue)
    with pytest.raises(ClientErrorException):
        decrypt_batch(enc, kms, aad=list(reversed(aad)))


def test_wrap_context_mismatch_is_client_error():
    kms = MockKMS()
    enc = encrypt_batch(["v"], KEY, kms, context={"team": "a"})
    assert decrypt_batch(enc, kms, context={"team": "a"}) == ["v"]
    with pytest.raises(ClientErrorException):
        decrypt_batch(enc, kms, context={"team": "b"})
    with pytest.raises(ClientErrorException):
        decrypt_batch(enc, kms)  # missing context


def test_wrong_key_id_rejected():
    kms = MockKMS()
    enc = encrypt_batch(["v"], KEY, kms)
    with pytest.raises(ClientErrorException):
        decrypt_batch(enc, kms, expect_key_id="other-key")


def test_distinct_deks_per_batch_and_cache_hits():
    kms = MockKMS()
    e1 = encrypt_batch(["a"], KEY, kms)
    e2 = encrypt_batch(["a"], KEY, kms)
    assert e1[0] != e2[0]  # fresh DEK + nonce per batch
    cache: dict = {}
    assert decrypt_batch(e1 + e2, kms, dek_cache=cache) == ["a", "a"]
    assert kms.unwrap_calls == 2 and len(cache) == 2
    # replay through the same cache: zero additional unwraps
    decrypt_batch(e1, kms, dek_cache=cache)
    assert kms.unwrap_calls == 2


def test_empty_batch_short_circuit():
    kms = MockKMS()
    assert encrypt_batch([], KEY, kms) == []
    assert kms.wrap_calls == 0  # VaultClientImpl.java:56-58 analogue


def test_unsupported_type_is_client_error():
    with pytest.raises(ClientErrorException):
        encrypt_batch([123], KEY, MockKMS())  # VaultService.java:76-78 analogue


def test_malformed_envelope_rejected():
    with pytest.raises(ClientErrorException):
        decrypt_batch(["%%%not-base64%%%"], MockKMS())
    with pytest.raises(ClientErrorException):
        decrypt_batch([base64.b64encode(b"\x09short").decode()], MockKMS())


def test_envelope_parse_fields():
    kms = MockKMS()
    enc = encrypt_batch(["v"], KEY, kms, encoding="binary")
    key_id, wrapped, nonce, ct = parse_envelope(enc[0])
    assert key_id == KEY and len(nonce) == 12 and len(ct) >= 17
    # tamper with ciphertext -> InvalidTag -> client error
    bad = enc[0][:-1] + bytes([enc[0][-1] ^ 1])
    with pytest.raises(ClientErrorException):
        decrypt_batch([bad], kms)


def test_error_classification_routing():
    # server error -> retriable (Transform.java:124-125); client -> fatal (:126-129)
    with pytest.raises(ServerErrorException) as srv:
        MockKMS(fail_mode="server").generate_data_key(KEY)
    assert classify(srv.value) == "retriable"
    with pytest.raises(ClientErrorException) as cli:
        MockKMS(fail_mode="client").generate_data_key(KEY)
    assert classify(cli.value) == "fatal"


def test_key_rotation_mixed_envelopes_decrypt():
    """C12: rotation = a new key_id in the envelope header. Decrypt resolves
    each envelope's master key from its own header (no expect check), so a
    batch may mix epochs encrypted under rotated keys."""
    from cdcrypt.envelope import decrypt_batch, encrypt_batch
    from cdcrypt.kms import MockKMS

    kms = MockKMS()
    old = encrypt_batch(["v1-a", "v1-b"], "tenants/t1/v1", kms)
    new = encrypt_batch(["v2-a"], "tenants/t1/v2", kms)
    mixed = [old[0], new[0], old[1]]
    assert decrypt_batch(mixed, kms) == ["v1-a", "v2-a", "v1-b"]

    # strict mode still rejects foreign key ids (the reference's check)
    import pytest as _pytest

    from cdcrypt.errors import ClientErrorException
    with _pytest.raises(ClientErrorException, match="key id"):
        decrypt_batch(mixed, kms, expect_key_id="tenants/t1/v2")


def test_decrypt_batch_reports_failing_item_index():
    """One corrupt envelope in a batch surfaces ITS row index and key id
    (VaultClientImpl.java:86-88 surfaces which batch item failed);
    healthy neighbors are not blamed."""
    kms = MockKMS()
    enc = list(encrypt_batch(["a", "b", "c", "d"], KEY, kms))
    blob = bytearray(base64.b64decode(enc[2]))
    blob[-1] ^= 0x01                       # flip one ciphertext/tag bit
    enc[2] = base64.b64encode(bytes(blob)).decode()
    with pytest.raises(ClientErrorException) as ei:
        decrypt_batch(enc, kms)
    assert ei.value.batch_index == 2
    assert ei.value.key_id == KEY
    assert "batch item 2" in str(ei.value) and KEY in str(ei.value)
    # malformed base64 is indexed too (key id unknown at that point)
    enc2 = list(encrypt_batch(["a", "b"], KEY, kms))
    enc2[1] = "!!not-base64!!"
    with pytest.raises(ClientErrorException) as ei2:
        decrypt_batch(enc2, kms)
    assert ei2.value.batch_index == 1 and ei2.value.key_id is None
    # wrong expected key id: index 0 (first non-null item checked)
    with pytest.raises(ClientErrorException) as ei3:
        decrypt_batch(encrypt_batch(["x"], KEY, kms), kms,
                      expect_key_id="other/key")
    assert ei3.value.batch_index == 0
