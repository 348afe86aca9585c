"""Property-based crypto-core tests (hypothesis).

The load-bearing invariant across every reference service test is
``decrypt(encrypt(x)) == x`` under key/context agreement and TYPED failure
under disagreement (SURVEY §5.2). These properties quantify over arbitrary
unicode/bytes payloads, AAD, and byte-level tampering — the generative
version of ``VaultServiceTest``'s parameterized matrix.
"""

from __future__ import annotations

import base64

import pytest
from hypothesis import given, settings, strategies as st

from cdcrypt.envelope import decrypt_batch, encrypt_batch
from cdcrypt.errors import ClientErrorException
from cdcrypt.kms import MockKMS

KMS = MockKMS()
TEXT = st.text(max_size=200)  # full unicode incl. surrogateless controls
PAYLOAD = st.one_of(TEXT, st.binary(max_size=200))


@settings(max_examples=60, deadline=None)
@given(vals=st.lists(st.one_of(st.none(), TEXT), max_size=8),
       aad=st.one_of(st.none(), TEXT))
def test_roundtrip_symmetric(vals, aad):
    aads = None if aad is None else [aad] * len(vals)
    enc = encrypt_batch(vals, "k/prop", KMS, aad=aads)
    assert decrypt_batch(enc, KMS, aad=aads) == vals
    for v, e in zip(vals, enc):
        assert (v is None) == (e is None)      # null passthrough exactly


@settings(max_examples=40, deadline=None)
@given(v=PAYLOAD)
def test_roundtrip_deterministic_is_a_function(v):
    e1 = encrypt_batch([v], "k/det", KMS, deterministic=True)
    e2 = encrypt_batch([v], "k/det", MockKMS(), deterministic=True)
    assert e1 == e2
    out_mode = "string" if isinstance(v, str) else "binary"
    got = decrypt_batch(e1, KMS, output=out_mode)[0]
    assert got == (v if isinstance(v, str) else bytes(v))


@settings(max_examples=40, deadline=None)
@given(v=TEXT, pos_frac=st.floats(0, 1), delta=st.integers(1, 255))
def test_any_tamper_is_a_typed_client_error(v, pos_frac, delta):
    enc = encrypt_batch([v], "k/prop", KMS)
    blob = bytearray(base64.b64decode(enc[0]))
    pos = min(int(pos_frac * len(blob)), len(blob) - 1)
    blob[pos] = (blob[pos] + delta) % 256
    tampered = base64.b64encode(bytes(blob)).decode()
    with pytest.raises(ClientErrorException):
        decrypt_batch([tampered], KMS)


@settings(max_examples=30, deadline=None)
@given(v=TEXT, aad1=TEXT, aad2=TEXT)
def test_aad_mismatch_rejected(v, aad1, aad2):
    enc = encrypt_batch([v], "k/prop", KMS, aad=[aad1])
    if aad1 == aad2:
        assert decrypt_batch(enc, KMS, aad=[aad2]) == [v]
    else:
        with pytest.raises(ClientErrorException):
            decrypt_batch(enc, KMS, aad=[aad2])


@settings(max_examples=30, deadline=None)
@given(v=TEXT, k1=st.text(min_size=1, max_size=30),
       k2=st.text(min_size=1, max_size=30))
def test_foreign_key_id_rejected(v, k1, k2):
    enc = encrypt_batch([v], k1, KMS)
    if k1 == k2:
        assert decrypt_batch(enc, KMS, expect_key_id=k2) == [v]
    else:
        with pytest.raises(ClientErrorException):
            decrypt_batch(enc, KMS, expect_key_id=k2)
