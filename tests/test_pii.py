"""PII detection / redaction / detect-driven crypto (operators/pii.py)
and repetition quality signals (functions/text.py).

The reference encrypts a HAND-CONFIGURED field list
(/root/reference/README.md:100-141); at corpus scale the engine pairs
the same crypto with a detector. These tests pin the regex semantics,
the redaction order, the marker-gated round trip, and the Gopher-style
duplicate n-gram arithmetic the DuckDB oracles replicate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdcrypt.functions.text import dup_ngram_fraction
from cdcrypt.operators.pii import (
    PII_PATTERNS,
    encrypt_pii_fields,
    pii_any,
    redact_pii,
    scan_pii,
)
from cdcrypt.operators.transform import ConfigError, decrypt_fields

SAMPLES = [
    (0, "write to alice.smith+x@corp.example.org today", {"email"}),
    (1, "ssn is 123-45-6789 ok", {"ssn"}),
    (2, "card 4111 1111 1111 1111 thanks", {"credit_card"}),
    (3, "host 192.168.0.1 down", {"ipv4"}),
    (4, "call +44 207 946-0958 now", {"phone"}),
    (5, "totally clean prose with numbers 42 and 2026", set()),
    (6, None, set()),
    (7, "multi 10.1.2.3 and bob@x.io", {"ipv4", "email"}),
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in SAMPLES], "doc_id long, text string")


def test_pii_flags_and_count(spark):
    out = {r.doc_id: r for r in scan_pii(_df(spark), "text").collect()}
    for i, _, kinds in SAMPLES:
        got = {k for k in PII_PATTERNS if out[i][f"pii_{k}"]}
        assert got == kinds, (i, got, kinds)
        assert out[i]["pii_count"] == len(kinds)


def test_redact_replaces_all_matches_in_order(spark):
    df = spark.createDataFrame(
        [(0, "a@b.co then c@d.io and 1.2.3.4"),
         (1, "card 4111 1111 1111 1111 vs +1 555 123 4567")],
        "doc_id long, text string")
    got = {r.doc_id: r.red for r in df.select(
        "doc_id", redact_pii(F.col("text")).alias("red")).collect()}
    assert got[0] == "[EMAIL] then [EMAIL] and [IPV4]"
    # PAN redacts BEFORE the looser phone shape can half-eat it
    assert "[CREDIT_CARD]" in got[1] and "[PHONE]" in got[1]
    assert "4111" not in got[1] and "4567" not in got[1]
    # kind subsetting + unknown kind refusal
    sub = df.select(redact_pii(F.col("text"), ["email"]).alias("r")).collect()
    assert "1.2.3.4" in sub[0].r
    with pytest.raises(ConfigError, match="unknown PII kind"):
        redact_pii(F.col("text"), ["dna"])


def test_encrypt_pii_roundtrip_with_marker_gate(spark):
    df = _df(spark)
    enc = encrypt_pii_fields(df, ["$.text"], key_id="k/pii")
    rows = {r.doc_id: r for r in enc.collect()}
    for i, t, kinds in SAMPLES:
        assert rows[i].text_pii == bool(kinds)
        if kinds:
            assert rows[i].text != t and len(rows[i].text) > 40
        else:
            assert rows[i].text == t  # byte-unchanged, incl. None
    dec = decrypt_fields(enc, ["$.text"], key_id="k/pii",
                         condition_field="$.text_pii",
                         condition_equals="true")
    got = {r.doc_id: r.text for r in dec.collect()}
    assert got == {i: t for i, t, _ in SAMPLES}
    # marker collision and nested-path refusal
    with pytest.raises(ConfigError, match="exists"):
        encrypt_pii_fields(enc, ["$.text"], key_id="k/pii")
    with pytest.raises(ConfigError, match="top-level"):
        encrypt_pii_fields(df, ["$.a.b"], key_id="k/pii")


def test_pii_detector_never_matches_ciphertext(spark):
    """The base64 envelope alphabet carries none of the separator chars
    the patterns require, so a second detector pass over an encrypted
    corpus is a no-op — double-encryption by re-scan cannot happen."""
    df = _df(spark)
    enc = encrypt_pii_fields(df, ["$.text"], key_id="k/pii")
    twice = enc.drop("text_pii")
    re_flag = twice.select(
        "doc_id", pii_any(F.col("text")).alias("f")).collect()
    assert not any(r.f for r in re_flag)


def test_dup_ngram_fraction_values(spark):
    rows = [(1, "a b a b a b"), (2, "x"), (3, ""), (4, None),
            (5, "spam spam spam spam spam")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.d1, r.d2, r.d3) for r in df.select(
        "doc_id",
        dup_ngram_fraction(F.col("text"), 1).alias("d1"),
        dup_ngram_fraction(F.col("text"), 2).alias("d2"),
        dup_ngram_fraction(F.col("text"), 3).alias("d3")).collect()}
    # "a b a b a b": 6 tokens 2 distinct; 5 bigrams {a b, b a}; 4 trigrams
    # {a b a, b a b}
    assert out[1] == (round(1 - 2 / 6, 6), 0.6, 0.5)
    assert out[2] == (0.0, 0.0, 0.0)   # shorter than n -> 0, not negative
    assert out[3] == (0.0, 0.0, 0.0)
    assert out[4] == (0.0, 0.0, 0.0)   # null-safe
    assert out[5] == (0.8, 0.75, round(1 - 1 / 3, 6))
