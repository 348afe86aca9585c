"""JVM-native crypto backend: the same envelope bytes, zero Python boundary.

The pandas-UDF backend (crypto_udfs.py) is the engine's canonical path — the
north rule's "vectorized Arrow/pandas UDFs with per-Arrow-batch data keys".
This module is the measured fast path for local/cluster deployments where the
Arrow JVM<->Python transfer dominates (microbench: the *identity* pandas UDF
costs ~15 us/row on 700-byte rows, ~50x the AES itself): it builds the
IDENTICAL envelope layout (envelope.py)

    version(1) | kid_len(1) | kid | wrapped_len(2) | wrapped | nonce(12) | ct+tag

out of Spark's builtin ``aes_encrypt``/``aes_decrypt`` (AES-GCM, Spark 3.3+),
so ciphertexts are cross-compatible both directions (tested): a JVM-encrypted
field decrypts through the pandas UDF and vice versa.

Key-material granularity: ONE data key per ``apply()`` call, i.e. per
micro-batch/epoch, generated driver-side and wrapped by the KMS (the UDF
backend refreshes per Arrow batch). The wrapped DEK is returned to the caller
so ingest lineage can record it — decrypt can then skip discovery.

Decrypt needs plaintext DEKs for every distinct wrapped DEK in the column.
``discover_wrapped_deks`` runs one narrow scan (substring + distinct on the
fixed 60-byte wrapped field) when the caller has no lineage to consult; the
per-epoch key count is tiny (one per producer batch).

Notes anchored in measured behavior:
- Spark's ``base64`` emits MIME-chunked text (CRLF every 76 chars); we strip
  it to keep the canonical unchunked form (decrypt_batch tolerates both).
- GCM output of ``aes_encrypt`` is iv(12) || ct || tag(16) — byte-identical
  to the UDF envelope's nonce || ct layout.
- NULL plaintext propagates to NULL envelope through concat/encode (the O2
  null-passthrough contract) with no special casing.
"""

from __future__ import annotations

import struct as _struct

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cdcrypt.envelope import _NONCE_LEN, _build_header
from cdcrypt.errors import ClientErrorException
from cdcrypt.kms import MockKMS

_MAX_LEN = 2147483647
_WRAPPED_LEN = 60  # kms.py: nonce(12) + AESGCM(dek 32 + tag 16); fixed

# Spark renders a 32-byte binary literal as 0x + 64 hex chars in plan
# strings (explain, event logs, the UI SQL tab) — exactly the shape of a
# plaintext DEK this backend must embed in the plan.
_DEK_LIT_PATTERN = "0x[0-9A-Fa-f]{64}"

# NIST SP 800-38D §8.3: at most 2^32 invocations with random 96-bit IVs
# under one key. The jvm backend draws a random IV per row under ONE
# per-micro-batch DEK, so micro-batches must stay under this bound (the udf
# backend is immune: counter nonces under per-Arrow-batch keys).
MAX_ROWS_PER_DEK = 2**32


def _enable_dek_redaction() -> None:
    """Mask plaintext-DEK literals in every plan rendering Spark controls.

    The jvm backend necessarily places the per-batch DEK into the query plan
    (``F.lit(dek)`` feeding ``aes_encrypt``; the hex->dek map literal on
    decrypt). ``spark.sql.redaction.string.regex`` makes explain/event-log/
    UI renderings print ``*********(redacted)`` instead (verified in
    tests). Residual exposure: code that walks the UNREDACTED logical plan
    programmatically still sees key bytes — deployments where that matters
    should use the udf backend, whose keys never leave the KMS/executor
    call path (round-1 ADVICE item)."""
    spark = SparkSession.getActiveSession()
    if spark is None:
        return
    key = "spark.sql.redaction.string.regex"
    cur = spark.conf.get(key, None)
    if not cur:
        spark.conf.set(key, _DEK_LIT_PATTERN)
    elif _DEK_LIT_PATTERN not in cur:
        spark.conf.set(key, f"(?:{cur})|(?:{_DEK_LIT_PATTERN})")


def _aad_col(aad_field: str | None) -> Column:
    if aad_field is None:
        return F.lit(b"")
    # per-row AAD; NULL aad means "no AAD" == empty (matches the UDF path)
    return F.coalesce(F.encode(F.col(aad_field), "utf-8"), F.lit(b""))


def jvm_encrypt_col(
    col: Column,
    key_id: str,
    kms: MockKMS,
    *,
    aad_field: str | None = None,
    encoding: str = "string",
    context: dict[str, str] | None = None,
    gate: Column | None = None,
) -> tuple[Column, bytes]:
    """Column expression encrypting ``col`` into an envelope; returns
    ``(expr, wrapped_dek)`` — the wrapped DEK goes to lineage."""
    _enable_dek_redaction()
    dek, wrapped = kms.generate_data_key(key_id, context)
    header = _build_header(key_id, wrapped)
    body = F.aes_encrypt(
        F.encode(col, "utf-8"), F.lit(dek),
        F.lit("GCM"), F.lit("DEFAULT"), F.lit(b""), _aad_col(aad_field),
    )
    blob = F.concat(F.lit(header), body)
    if encoding == "string":
        out = F.replace(F.base64(blob), F.lit("\r\n"), F.lit(""))
    else:
        out = blob
    if gate is not None:
        # JVM CASE WHEN is lazily evaluated per row, so gated-out rows pay no
        # crypto (unlike Python UDFs, which Spark evaluates eagerly — that
        # backend ships the gate INTO the UDF instead). Binary output mode
        # renders gated-out plaintext as utf-8 bytes (Item.Encoding parity).
        passthrough = col if encoding == "string" else col.cast("binary")
        out = F.when(gate, out).otherwise(passthrough)
    return out, wrapped


def discover_wrapped_deks(
    df: DataFrame, col: Column, key_id: str, encoding: str = "string"
) -> list[bytes]:
    """One narrow pass: distinct wrapped DEKs present in an envelope column.

    ``df`` must be materialized data (a table/file read). A lazy plan whose
    lineage contains a nondeterministic encrypt (the pandas-UDF backend mints
    a fresh DEK per batch per evaluation) would re-encrypt with NEW keys when
    the decrypt plan later re-executes it, invalidating the discovered set.
    The engine always decrypts lake reads, which are materialized."""
    kid = key_id.encode("utf-8")
    blob = F.unbase64(col) if encoding == "string" else col
    prefix = bytes([1, len(kid)]) + kid
    w = F.substring(blob, 5 + len(kid), _WRAPPED_LEN)
    rows = (
        df.where(col.isNotNull())
        # skip non-envelope values (rows a condition gate passed through as
        # plaintext) — they carry no DEK and must not poison the unwrap set
        .where(F.substring(blob, 1, len(prefix)) == F.lit(prefix))
        .select(w.alias("w")).distinct().collect()
    )
    return [bytes(r.w) for r in rows]


def jvm_decrypt_col(
    col: Column,
    key_id: str,
    kms: MockKMS,
    wrapped_deks: list[bytes],
    *,
    aad_field: str | None = None,
    encoding: str = "string",
    output: str = "string",
    context: dict[str, str] | None = None,
    gate: Column | None = None,
) -> Column:
    """Column expression decrypting envelopes produced by either backend.

    ``wrapped_deks``: every wrapped DEK expected in the column (from ingest
    lineage or :func:`discover_wrapped_deks`). Each is unwrapped ONCE here,
    driver-side; executors see only a small literal hex->dek map.
    Rows carrying an unknown wrapped DEK or a foreign key id raise
    (mirroring the UDF path's ClientErrorException / the reference's
    key-id verification, AWSKeyManagementService.java:138-140)."""
    if not wrapped_deks:
        raise ClientErrorException("no wrapped DEKs supplied for decrypt")
    _enable_dek_redaction()
    kid = key_id.encode("utf-8")
    deks = {w.hex().upper(): kms.unwrap(w, key_id, context) for w in wrapped_deks}
    km = F.map_from_arrays(
        F.array(*[F.lit(h) for h in deks]),
        F.array(*[F.lit(d) for d in deks.values()]),
    )
    blob = F.unbase64(col) if encoding == "string" else col
    prefix = bytes([1, len(kid)]) + kid  # version || kid_len || kid
    wrapped_col = F.substring(blob, 5 + len(kid), _WRAPPED_LEN)
    payload = F.substring(blob, len(prefix) + 2 + _WRAPPED_LEN + 1, _MAX_LEN)
    key_col = F.element_at(km, F.hex(wrapped_col))
    plain = F.aes_decrypt(
        payload, key_col, F.lit("GCM"), F.lit("DEFAULT"), _aad_col(aad_field)
    )
    if output == "string":
        plain = F.decode(plain, "utf-8")
    err_t = "string" if output == "string" else "binary"
    checked = (
        F.when(col.isNull(), F.lit(None).cast(err_t))
        .when(
            F.substring(blob, 1, len(prefix)) != F.lit(prefix),
            F.raise_error(F.lit(
                f"envelope key id != configured {key_id!r}")).cast(err_t),
        )
        .when(
            # validate the envelope's own wrapped_len field so a KMS whose
            # wrap size differs fails LOUDLY at the format layer instead of
            # surfacing as an opaque GCM tag error (round-1 ADVICE item)
            F.substring(blob, len(prefix) + 1, 2)
            != F.lit(_struct.pack(">H", _WRAPPED_LEN)),
            F.raise_error(F.lit(
                f"envelope wrapped-DEK length != {_WRAPPED_LEN} "
                "(unsupported KMS wrap format for the jvm backend)"
            )).cast(err_t),
        )
        .when(
            key_col.isNull(),
            F.raise_error(F.lit("unknown wrapped DEK in envelope")).cast(err_t),
        )
        .otherwise(plain)
    )
    if gate is not None:
        checked = F.when(gate, checked).otherwise(col)
    return checked


def payload_len_check(blob: Column) -> Column:
    """Sanity predicate: envelope long enough to hold nonce+tag."""
    return F.length(blob) >= F.lit(2 + _WRAPPED_LEN + 2 + _NONCE_LEN + 16)
