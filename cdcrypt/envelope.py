"""AES-GCM envelope encryption with per-batch data keys.

Envelope layout (self-contained, like the AWS Encryption SDK message the
reference emits at ``AWSKeyManagementService.java:113-115`` — decrypt needs no
side lookup):

    version(1) | key_id_len(1) | key_id | wrapped_len(2 BE) | wrapped_dek
    | nonce(12) | aes_gcm_ciphertext(+tag)

Output encoding mirrors the reference's ``Item.Encoding``
(``Item.java:8-21``): ``string`` renders the envelope as base64 text
(``Item.java:34-37``), ``binary`` keeps raw bytes. Decrypted plaintext is
UTF-8 text for string fields (``Item.java:96-99``) or raw bytes for binary
fields; only str/bytes payloads are legal, anything else is a client error
(``VaultService.java:76-78`` et al.).

AAD: the optional per-row associated data (we use ``conv_id``) binds a
ciphertext to its row key — the proper version of the reference's encryption
context (C4/C6); mismatch on decrypt raises ``ClientErrorException`` like
``AWSKeyManagementService.java:142-144``.

Scale notes: ONE ``generate_data_key`` KMS call per batch; row nonces are a
96-bit counter under the fresh random per-batch DEK (unique by construction,
no RNG cost per row); decrypt unwraps each distinct wrapped DEK once via the
caller-supplied executor-local cache.
"""

from __future__ import annotations

import base64
import struct
from collections.abc import Sequence

from cryptography.exceptions import InvalidTag
from cryptography.hazmat.primitives.ciphers.aead import AESGCM

from cdcrypt.errors import ClientErrorException
from cdcrypt.kms import DEFAULT_KMS, MockKMS

_VERSION = 1          # symmetric wrap (mock-KMS AES-GCM wrapped DEK)
_VERSION_ASYM = 2     # asymmetric wrap (RSA-OAEP under a fetched public key)
_VERSION_DET = 3      # convergent: derived DEK, synthetic SIV-style nonce
_NONCE_LEN = 12


def _build_header(key_id: str, wrapped: bytes, version: int = _VERSION) -> bytes:
    kid = key_id.encode("utf-8")
    if len(kid) > 255:
        raise ClientErrorException("key id too long")
    return struct.pack(">BB", version, len(kid)) + kid + struct.pack(">H", len(wrapped)) + wrapped


def parse_envelope_full(blob: bytes) -> tuple[int, str, bytes, bytes, bytes]:
    """Return ``(version, key_id, wrapped_dek, nonce, ciphertext)``."""
    try:
        version, kid_len = struct.unpack_from(">BB", blob, 0)
        if version not in (_VERSION, _VERSION_ASYM, _VERSION_DET):
            raise ClientErrorException(f"unsupported envelope version {version}")
        off = 2
        key_id = blob[off : off + kid_len].decode("utf-8")
        off += kid_len
        (wrapped_len,) = struct.unpack_from(">H", blob, off)
        off += 2
        wrapped = blob[off : off + wrapped_len]
        off += wrapped_len
        nonce = blob[off : off + _NONCE_LEN]
        ct = blob[off + _NONCE_LEN :]
        if len(wrapped) != wrapped_len or len(nonce) != _NONCE_LEN or len(ct) < 16:
            raise ClientErrorException("truncated envelope")
        if version == _VERSION_DET and wrapped_len != 0:
            raise ClientErrorException(
                "convergent envelope must not carry a wrapped DEK")
        return version, key_id, wrapped, nonce, ct
    except (struct.error, UnicodeDecodeError) as e:
        raise ClientErrorException(f"malformed envelope: {e}") from e


def parse_envelope(blob: bytes) -> tuple[str, bytes, bytes, bytes]:
    """Return ``(key_id, wrapped_dek, nonce, ciphertext)``."""
    return parse_envelope_full(blob)[1:]


def _to_plain_bytes(v: object) -> bytes:
    # str and bytes only — reference rejects other types (VaultService.java:76-78)
    if isinstance(v, str):
        return v.encode("utf-8")
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    raise ClientErrorException(f"unsupported plaintext type {type(v).__name__}")


def encrypt_batch(
    values: Sequence[object],
    key_id: str,
    kms: MockKMS | None = None,
    aad: Sequence[object] | None = None,
    encoding: str = "string",
    context: dict[str, str] | None = None,
    public_key_pem: bytes | None = None,
    deterministic: bool = False,
) -> list[object]:
    """Encrypt a batch of str/bytes values under ONE fresh data key.

    ``None`` values pass through as ``None`` (null passthrough, O2,
    ``Transform.java:57-60``). ``aad`` (optional, same length) supplies
    per-row associated data. ``encoding``: 'string' -> base64 str,
    'binary' -> bytes.

    ``public_key_pem`` switches to the ASYMMETRIC wrap (C9): the DEK is
    generated locally and RSA-OAEP-wrapped under the supplied public key —
    zero KMS calls on the encrypt path (the pem was fetched once at
    plan-compile time, ``GCPKeyManagementService.java:119-165``). The
    encryption context authenticates only the symmetric wrap; it is not
    supported with RSA-OAEP (same as the reference's GCP asymmetric mode).

    ``deterministic`` switches to CONVERGENT encryption (Vault derived-key
    semantics, the reference's C4 context mode): the DEK is derived from
    (key_id, context) and the nonce is an SIV-style PRF of (aad, plaintext)
    — equal inputs produce byte-equal envelopes, so encrypted KEY columns
    keep their equality semantics (group/join/MERGE on ciphertext).
    Equality leakage is inherent and intended; use only for key/identifier
    columns, never free text. Zero KMS wrap calls (derivation is local to
    the mock; a real KMS would be called once per (key_id, context) per
    executor).
    """
    kms = kms or DEFAULT_KMS
    n = len(values)
    out: list[object] = [None] * n
    if n == 0:
        return out  # empty-batch short-circuit (VaultClientImpl.java:56-58)
    if deterministic:
        if public_key_pem is not None:
            raise ClientErrorException(
                "deterministic and asymmetric modes are mutually exclusive")
        import hashlib as _hl
        import hmac as _hmac
        dek = kms.derive_deterministic_dek(key_id, context)
        header = _build_header(key_id, b"", version=_VERSION_DET)
        gcm = AESGCM(dek)
        as_string = encoding == "string"
        for i in range(n):
            v = values[i]
            if v is None:
                continue
            pt = _to_plain_bytes(v)
            ad = None
            if aad is not None and aad[i] is not None:
                ad = _to_plain_bytes(aad[i])
            # SIV-style PRF nonce with LENGTH-PREFIXED domain separation:
            # a bare separator byte would let (aad="a\\x00", pt="b") and
            # (aad="a", pt="\\x00b") collide on one nonce — GCM nonce reuse
            # across different plaintexts under the shared derived DEK
            adb = ad or b""
            nonce = _hmac.new(
                dek, struct.pack(">Q", len(adb)) + adb + pt,
                _hl.sha256).digest()[:_NONCE_LEN]
            blob = header + nonce + gcm.encrypt(nonce, pt, ad)
            out[i] = base64.b64encode(blob).decode("ascii") if as_string else blob
        return out
    if public_key_pem is not None:
        if context:
            raise ClientErrorException(
                "encryption context is not supported with asymmetric wrap")
        from cdcrypt.kms import rsa_oaep_wrap
        import os as _os
        dek = _os.urandom(32)
        wrapped = rsa_oaep_wrap(dek, public_key_pem)
        header = _build_header(key_id, wrapped, version=_VERSION_ASYM)
    else:
        dek, wrapped = kms.generate_data_key(key_id, context)
        header = _build_header(key_id, wrapped)
    gcm = AESGCM(dek)
    as_string = encoding == "string"
    pack_nonce = struct.pack  # local bind for the hot loop
    for i in range(n):
        v = values[i]
        if v is None:
            continue
        nonce = pack_nonce(">4xQ", i)  # 96-bit counter; DEK is unique per batch
        ad = None
        if aad is not None and aad[i] is not None:
            ad = _to_plain_bytes(aad[i])
        blob = header + nonce + gcm.encrypt(nonce, _to_plain_bytes(v), ad)
        out[i] = base64.b64encode(blob).decode("ascii") if as_string else blob
    return out


def decrypt_batch(
    values: Sequence[object],
    kms: MockKMS | None = None,
    aad: Sequence[object] | None = None,
    output: str = "string",
    dek_cache: dict[bytes, AESGCM] | None = None,
    context: dict[str, str] | None = None,
    expect_key_id: str | None = None,
    errors_out: list | None = None,
) -> list[object]:
    """Decrypt a batch of envelopes (base64 str or raw bytes).

    ``errors_out``: pass a ``[None] * len(values)`` list to enable CAPTURE
    mode — per-item DATA errors (malformed envelope, tamper, AAD/key-id
    mismatch, revoked key) are recorded as ``"<ExcClass>: <msg>"`` at the
    failing index and decryption continues with ``None`` at that slot,
    instead of failing the batch. The Kafka Connect ``errors.tolerance``
    semantics the reference inherits from its runtime: only data errors
    are tolerable; transient SERVER errors still raise (they are
    infrastructure, and epoch replay is the correct handler).

    Each distinct wrapped DEK is unwrapped once via ``dek_cache`` (the
    executor-local cache lives in the UDF module; pass a dict here for reuse
    across batches). ``expect_key_id`` mirrors the reference's master-key-id
    verification on decrypt (``AWSKeyManagementService.java:138-140``).

    Data errors carry the failing batch row index (and the envelope's key
    id once parsed) in the message and as ``exc.batch_index`` — the
    reference's Vault client surfaces which batch item failed
    (``VaultClientImpl.java:86-88``); without this, one corrupt envelope
    in a 10k-row batch is undebuggable. Transient (server) errors
    propagate unwrapped so retry routing is unaffected.
    """
    kms = kms or DEFAULT_KMS
    cache = dek_cache if dek_cache is not None else {}
    n = len(values)
    out: list[object] = [None] * n
    as_string = output == "string"
    for i in range(n):
        v = values[i]
        if v is None:
            continue
        key_id: str | None = None
        try:
            if isinstance(v, str):
                try:
                    # tolerate MIME line breaks (JVM base64 producers chunk
                    # at 76 chars); our own encoder never emits them
                    blob = base64.b64decode(
                        v.replace("\r", "").replace("\n", ""), validate=True)
                except Exception as e:  # noqa: BLE001 - data error
                    raise ClientErrorException(
                        f"invalid base64 envelope: {e}") from e
            else:
                blob = bytes(v)
            version, key_id, wrapped, nonce, ct = parse_envelope_full(blob)
            if expect_key_id is not None and key_id != expect_key_id:
                raise ClientErrorException(
                    f"envelope key id {key_id!r} != configured "
                    f"{expect_key_id!r}")
            # convergent envelopes carry no wrapped DEK — cache by key id
            # AND canonical context (the module-global worker cache serves
            # every decrypt UDF in the process; omitting the context would
            # poison decrypts across jobs using different contexts under
            # one key id)
            if version == _VERSION_DET:
                from cdcrypt.kms import _canon_context
                ckey = (b"\x03" + key_id.encode("utf-8") + b"\x00"
                        + _canon_context(context))
            else:
                ckey = wrapped
            gcm = cache.get(ckey)
            if gcm is None:
                if version == _VERSION_DET:
                    gcm = AESGCM(kms.derive_deterministic_dek(key_id, context))
                elif version == _VERSION_ASYM:
                    # private key never leaves the KMS: one remote unwrap
                    # per distinct wrapped DEK per executor (C10)
                    gcm = AESGCM(kms.asym_unwrap(wrapped, key_id))
                else:
                    gcm = AESGCM(kms.unwrap(wrapped, key_id, context))
                cache[ckey] = gcm
            ad = None
            if aad is not None and aad[i] is not None:
                ad = _to_plain_bytes(aad[i])
            try:
                pt = gcm.decrypt(nonce, ct, ad)
            except InvalidTag as e:
                raise ClientErrorException(
                    "decrypt failed: AAD or ciphertext mismatch") from e
        except ClientErrorException as e:
            if errors_out is not None:
                errors_out[i] = f"{type(e).__name__}: {e}"
                continue                   # out[i] stays None (quarantined)
            if getattr(e, "batch_index", None) is not None:
                raise                      # already indexed (nested call)
            where = f"batch item {i}"
            if key_id is not None:
                where += f" (key id {key_id!r})"
            # type(e), not ClientErrorException: subclasses (e.g.
            # KeyRevokedException) must survive the row-index wrap so
            # revocation-aware readers can catch them specifically
            indexed = type(e)(f"{where}: {e}")
            indexed.batch_index = i
            indexed.key_id = key_id
            raise indexed from e
        out[i] = pt.decode("utf-8") if as_string else pt
    return out


def rewrap_batch(
    values: Sequence[object],
    new_key_id: str,
    kms: MockKMS | None = None,
    rewrap_cache: dict[bytes, bytes] | None = None,
    context: dict[str, str] | None = None,
    new_context: dict[str, str] | None = None,
    expect_key_id: str | None = None,
) -> list[object]:
    """Rotate a batch of envelopes to ``new_key_id`` WITHOUT touching the
    payload: parse the header, unwrap the DEK under the old master key,
    wrap it under the new one, splice the new header onto the unchanged
    ``nonce | ciphertext`` tail. The AES-GCM payload is never decrypted,
    so rotation CPU is O(distinct DEKs) KMS work per batch (one DEK per
    writing epoch by construction) plus a byte splice per row — the
    KMS-key-rotation model of the AWS Encryption SDK / Iceberg envelope
    encryption, where re-encrypting data for a master-key rotation is
    explicitly NOT required, only rewrapping.

    ``rewrap_cache`` memoizes old-header -> new-header across batches
    (executor-local, like the decrypt DEK cache). Symmetric (v1) and
    asymmetric (v2) envelopes rewrap to a symmetric wrap under
    ``new_key_id``; CONVERGENT envelopes (v3) derive their DEK from the
    key id itself — rotating them changes every ciphertext byte, so they
    require a full decrypt/re-encrypt pass and this raises a client
    error pointing there. Output encoding mirrors each input value
    (base64 str in -> str out, bytes in -> bytes out); nulls pass
    through. Errors carry the failing row index like decrypt_batch.
    """
    kms = kms or DEFAULT_KMS
    cache = rewrap_cache if rewrap_cache is not None else {}
    n = len(values)
    out: list[object] = [None] * n
    for i in range(n):
        v = values[i]
        if v is None:
            continue
        key_id: str | None = None
        try:
            if isinstance(v, str):
                try:
                    blob = base64.b64decode(
                        v.replace("\r", "").replace("\n", ""), validate=True)
                except Exception as e:  # noqa: BLE001 - data error
                    raise ClientErrorException(
                        f"invalid base64 envelope: {e}") from e
                as_string = True
            else:
                blob = bytes(v)
                as_string = False
            version, key_id, wrapped, nonce, ct = parse_envelope_full(blob)
            if expect_key_id is not None and key_id != expect_key_id:
                raise ClientErrorException(
                    f"envelope key id {key_id!r} != expected "
                    f"{expect_key_id!r}")
            if version == _VERSION_DET:
                raise ClientErrorException(
                    "convergent envelope cannot be header-rewrapped (its "
                    "DEK is derived from the key id); re-encrypt via "
                    "decrypt_batch + encrypt_batch(deterministic=True)")
            header_len = len(blob) - _NONCE_LEN - len(ct)
            old_header = bytes(blob[:header_len])
            new_header = cache.get(old_header)
            if new_header is None:
                if version == _VERSION_ASYM:
                    dek = kms.asym_unwrap(wrapped, key_id)
                else:
                    dek = kms.unwrap(wrapped, key_id, context)
                new_header = _build_header(
                    new_key_id, kms.wrap(dek, new_key_id, new_context))
                cache[old_header] = new_header
            nb = new_header + nonce + ct
            out[i] = (base64.b64encode(nb).decode("ascii")
                      if as_string else nb)
        except ClientErrorException as e:
            if getattr(e, "batch_index", None) is not None:
                raise
            where = f"batch item {i}"
            if key_id is not None:
                where += f" (key id {key_id!r})"
            indexed = ClientErrorException(f"{where}: {e}")
            indexed.batch_index = i
            indexed.key_id = key_id
            raise indexed from e
    return out
