"""PII detection, redaction, and detect-driven field crypto.

The reference SMT encrypts fields a human CONFIGURED as sensitive
(``/root/reference/README.md:100-141``: an explicit field list per
task); at training-corpus scale nobody hand-lists which of 10^10
documents contain a phone number, so the engine pairs the same crypto
machinery with a DETECTOR: regex classifiers for the classic structured
PII shapes (email, E.164-ish phone, US SSN, IPv4, 16-digit PAN), each a
pure Column ``rlike``/``regexp_replace`` — JVM-side, whole-stage
codegen, zero Python — and all engine-portable (no lookarounds or
backreferences, so Java regex and DuckDB's RE2 agree; the driver oracle
replicates every pattern verbatim).

Three layers, smallest to largest:

- :func:`pii_flags` / :func:`pii_any` — per-type boolean Columns.
- :func:`redact_pii` — in-place ``[TYPE]`` substitution (the
  irreversible path: training corpora that must never carry the raw
  value).
- :func:`encrypt_pii_fields` — the reversible path: fields that CONTAIN
  detected PII are envelope-encrypted via the standard
  ``FieldTransform`` condition gate (O6), others pass through
  byte-unchanged. Decrypt is the ordinary ``decrypt_fields`` with the
  same gate derivation, so authorized readers recover the original
  text while the lake never stores a detected value in the clear.

Detection is intentionally shape-based (regex), not semantic: it has
the usual recall limits of structured-PII matching, and the module
makes no NER claims. A caller with an ML detector plugs it in as the
``flag_col`` of :func:`encrypt_where`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdcrypt.operators.transform import (
    ConfigError,
    FieldTransform,
    TransformConfig,
)

# ordered dict: redaction applies in this order (PAN before phone, so a
# 16-digit card number is never half-eaten by the looser phone shape)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "credit_card": r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3}[- ]?[0-9]{2,4}\b",
}


def _kinds(kinds: list[str] | None) -> list[str]:
    ks = list(PII_PATTERNS) if kinds is None else list(kinds)
    bad = [k for k in ks if k not in PII_PATTERNS]
    if bad:
        raise ConfigError(
            f"unknown PII kind(s) {bad}; known: {list(PII_PATTERNS)}")
    return ks


def pii_flags(col: Column, kinds: list[str] | None = None) -> dict[str, Column]:
    """``{kind: boolean Column}`` — one ``rlike`` per kind, null text
    detects nothing (null-safe false)."""
    return {k: F.coalesce(col.rlike(PII_PATTERNS[k]), F.lit(False))
            for k in _kinds(kinds)}


def pii_any(col: Column, kinds: list[str] | None = None) -> Column:
    """True iff any selected kind matches."""
    flags = list(pii_flags(col, kinds).values())
    out = flags[0]
    for f in flags[1:]:
        out = out | f
    return out


def redact_pii(col: Column, kinds: list[str] | None = None) -> Column:
    """Replace every match of every selected kind with ``[KIND]``
    (uppercased), in :data:`PII_PATTERNS` order. Irreversible by design —
    for the reversible path use :func:`encrypt_pii_fields`."""
    out = col
    for k in _kinds(kinds):
        out = F.regexp_replace(out, PII_PATTERNS[k], f"[{k.upper()}]")
    return out


def scan_pii(df: DataFrame, text_col: str = "text",
             kinds: list[str] | None = None) -> DataFrame:
    """Append ``pii_<kind>`` boolean columns plus ``pii_count`` (number of
    distinct kinds present) — the corpus-audit projection."""
    flags = pii_flags(F.col(text_col), kinds)
    out = df
    total = F.lit(0)
    for k, c in flags.items():
        out = out.withColumn(f"pii_{k}", c)
        total = total + c.cast("int")
    return out.withColumn("pii_count", total)


def encrypt_where(df: DataFrame, fields: list[str], flag_col: Column,
                  **kw) -> DataFrame:
    """Encrypt ``fields`` only on rows where ``flag_col`` is true — the
    standard O6 condition gate driven by a COMPUTED predicate instead of
    a stored field. The flag is materialized into a temp column so the
    gate compiles against the frame exactly like a stored condition
    field, then dropped."""
    tmp = "__cdcrypt_pii_gate"
    if tmp in df.columns:
        raise ConfigError(f"column {tmp!r} already exists")
    staged = df.withColumn(tmp, flag_col.cast("string"))
    out = FieldTransform(TransformConfig(
        mode="encrypt", fields=fields,
        condition_field=f"$.{tmp}", condition_equals="true", **kw,
    )).apply(staged)
    return out.drop(tmp)


def encrypt_pii_fields(df: DataFrame, fields: list[str],
                       kinds: list[str] | None = None,
                       mark: bool = True, **kw) -> DataFrame:
    """Detect-then-encrypt: each field in ``fields`` is envelope-encrypted
    on rows where THAT field contains any selected PII kind; clean rows
    pass through byte-unchanged. One pass per field (each field gets its
    own detector gate).

    With ``mark=True`` (default) a boolean ``<field>_pii`` column records
    each gate decision — the detector cannot be re-derived downstream
    (it matches neither ciphertext nor clean plaintext), so the marker
    is both the decrypt gate (standard stored-field O6:
    ``decrypt_fields(..., condition_field='$.<field>_pii',
    condition_equals='true')``) and the audit trail of what was deemed
    sensitive at write time. ``mark=False`` is for redact-style
    one-way flows that will never decrypt selectively."""
    from cdcrypt.functions.fieldpath import compile_path

    out = df
    for fpath in fields:
        cp = compile_path(fpath)
        if len(cp.names) != 1 or cp.is_array:
            raise ConfigError(
                f"encrypt_pii_fields requires plain top-level paths; "
                f"got {fpath!r}")
        name = cp.names[0]
        gate = pii_any(F.col(name), kinds)
        if mark:
            mark_col = f"{name}_pii"
            if mark_col in out.columns:
                raise ConfigError(f"marker column {mark_col!r} exists")
            out = out.withColumn(mark_col, gate)
            gate = F.col(mark_col)
        out = encrypt_where(out, [fpath], gate, **kw)
    return out
