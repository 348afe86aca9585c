"""KMS service layer + pluggable transport seam.

Mirrors the reference's two-layer split (``Service.java:5-10`` semantics
over ``VaultClientImpl.java:29-107`` transport): :class:`MockKMS` is the
SERVICE — call counting, fault injection, and the retriable-vs-fatal
error mapping the pipeline's O10 routing consumes — while the actual key
operations live behind the :class:`KmsTransport` protocol. A real
HashiCorp Vault Transit / AWS KMS / GCP Cloud KMS client is a drop-in:
implement the five transport methods over REST/gRPC and raise
:class:`KmsTransportError` with the HTTP status; the service maps 4xx to
``ClientErrorException`` (fail the record — data error) and everything
else to ``ServerErrorException`` (retriable), exactly the reference's
status split (``VaultClientImpl.java:100-106``) feeding its
``RetriableException``/``DataException`` routing (``Transform.java:124-130``).

The default transport is :class:`InProcessKmsTransport` — the sandbox
has no network, so key wrapping is an in-process call. The
scaling-relevant property is preserved regardless of transport: the
engine performs ONE ``generate_data_key`` (wrap) call per Arrow batch on
encrypt and ONE ``unwrap`` per *distinct wrapped key* per executor on
decrypt (executor-local cache), never a per-record call — the vectorized
analogue of the reference's fetch-once public-key cache
(``GCPKeyManagementService.java:119-132``).

Master keys are derived deterministically from ``key_id`` so that any
executor process can unwrap without shared mutable state — this mirrors
a real KMS where every caller reaches the same key material by key id.

Encryption context (AAD) parity: the reference binds an optional context
to each wrap call (Vault derived keys ``EncryptParameter.java:14-20``;
AWS encryption context verified on decrypt
``AWSKeyManagementService.java:142-144``). Here the context is
authenticated as AAD of the wrap itself; a mismatched context on unwrap
raises ``ClientErrorException`` exactly like the reference's
wrong-context test (``AWSKeyManagementServiceTest.java:138-160``). Note
the reference has a config bug that silently drops ``awskms.contexts``
(``Config.java:279-288``); we implement context properly and test it.
"""

from __future__ import annotations

import hashlib
import hmac
import os
from typing import Protocol, runtime_checkable

from cryptography.exceptions import InvalidTag
from cryptography.hazmat.primitives.ciphers.aead import AESGCM

from cdcrypt.errors import ClientErrorException, ServerErrorException

_MASTER_SECRET = b"cdcrypt-mock-kms-master-secret-v1"  # mock: deterministic per key_id
_WRAP_NONCE_LEN = 12
_DEK_LEN = 32  # AES-256


def _master_key(key_id: str) -> bytes:
    if not key_id:
        raise ClientErrorException("empty key id")
    return hmac.new(_MASTER_SECRET, key_id.encode("utf-8"), hashlib.sha256).digest()


def _canon_context(context: dict[str, str] | None) -> bytes:
    """Canonical byte form of an encryption context (sorted k=v pairs)."""
    if not context:
        return b""
    return "\x1f".join(f"{k}\x1e{context[k]}" for k in sorted(context)).encode("utf-8")


class KmsTransportError(Exception):
    """A transport-level KMS failure (HTTP error, timeout, connection
    reset). ``status`` carries the HTTP status when one exists;
    ``retriable`` overrides the status-based classification explicitly.
    Classification default mirrors ``VaultClientImpl.java:100-106``: 4xx
    is a client/data error, anything else (5xx, no status — a timeout or
    reset whose request may have succeeded) is retriable."""

    def __init__(self, message: str, status: int | None = None,
                 retriable: bool | None = None):
        super().__init__(message)
        self.status = status
        self._retriable = retriable

    @property
    def retriable(self) -> bool:
        if self._retriable is not None:
            return self._retriable
        if self.status is None:
            return True
        return not (400 <= self.status < 500)


@runtime_checkable
class KmsTransport(Protocol):
    """The primitive key operations a real KMS client implements.

    Implementations may raise :class:`KmsTransportError` for transport
    faults (mapped by the service layer) or the engine's typed
    ``ClientErrorException``/``ServerErrorException`` directly (passed
    through). Instances ship inside UDF closures — keep them picklable
    (hold key NAMES and endpoints, not live connections)."""

    def generate_data_key(self, key_id: str,
                          context: dict[str, str] | None
                          ) -> tuple[bytes, bytes]: ...

    def unwrap(self, wrapped: bytes, key_id: str,
               context: dict[str, str] | None) -> bytes: ...

    def derive_deterministic_dek(self, key_id: str,
                                 context: dict[str, str] | None) -> bytes: ...

    def fetch_public_pem(self, key_id: str) -> bytes: ...

    def asym_unwrap(self, wrapped: bytes, key_id: str) -> bytes: ...

    def wrap(self, dek: bytes, key_id: str,
             context: dict[str, str] | None) -> bytes: ...

    def revoke(self, key_id: str,
               context: dict[str, str] | None) -> None: ...


class InProcessKmsTransport:
    """Default transport: the mock KMS crypto, in-process (no network in
    the sandbox). Asymmetric keypairs are generated per key id on first
    use and stored as PEM bytes, so the instance pickles cleanly into UDF
    closures (a real deployment would hold only the key *name* and call
    out)."""

    def __init__(self) -> None:
        self._asym_pems: dict[str, tuple[bytes, bytes]] = {}
        # crypto-shred revocation list: canonical (key_id, context)
        # tokens whose key material is gone. Server-side state in a real
        # KMS; in-process here, so a revocation is visible to closures
        # built AFTER it (and any KMS client sharing this transport).
        self._revoked: set[bytes] = set()

    @staticmethod
    def _ctx_token(key_id: str, context: dict[str, str] | None) -> bytes:
        return key_id.encode("utf-8") + b"\x00" + _canon_context(context)

    def revoke(self, key_id: str,
               context: dict[str, str] | None = None) -> None:
        """Destroy the key material for (key_id, context) — every wrap
        bound to that context becomes permanently un-unwrappable and the
        convergent DEK underivable (crypto-shredding). Irreversible."""
        self._revoked.add(self._ctx_token(key_id, context))

    def _check_revoked(self, key_id: str,
                       context: dict[str, str] | None) -> None:
        if self._ctx_token(key_id, context) in self._revoked:
            from cdcrypt.errors import KeyRevokedException
            raise KeyRevokedException(
                f"key material revoked for key_id={key_id!r} "
                f"context={context!r} (crypto-shred)")

    def generate_data_key(
        self, key_id: str, context: dict[str, str] | None = None
    ) -> tuple[bytes, bytes]:
        dek = os.urandom(_DEK_LEN)
        return dek, self.wrap(dek, key_id, context)

    def wrap(self, dek: bytes, key_id: str,
             context: dict[str, str] | None = None) -> bytes:
        # writing under a revoked context would create immediately
        # unreadable data — refuse at write time, not first read
        self._check_revoked(key_id, context)
        mk = _master_key(key_id)
        nonce = os.urandom(_WRAP_NONCE_LEN)
        ct = AESGCM(mk).encrypt(nonce, dek, _canon_context(context))
        return nonce + ct

    def unwrap(self, wrapped: bytes, key_id: str,
               context: dict[str, str] | None = None) -> bytes:
        self._check_revoked(key_id, context)
        if len(wrapped) < _WRAP_NONCE_LEN + 16:
            raise ClientErrorException("malformed wrapped data key")
        mk = _master_key(key_id)
        nonce, ct = wrapped[:_WRAP_NONCE_LEN], wrapped[_WRAP_NONCE_LEN:]
        try:
            dek = AESGCM(mk).decrypt(nonce, ct, _canon_context(context))
        except InvalidTag as e:
            raise ClientErrorException(
                f"unwrap failed for key_id={key_id!r}: wrong key or context"
            ) from e
        if len(dek) != _DEK_LEN:
            raise ClientErrorException("unwrapped data key has wrong length")
        return dek

    def derive_deterministic_dek(
        self, key_id: str, context: dict[str, str] | None = None
    ) -> bytes:
        self._check_revoked(key_id, context)
        mk = _master_key(key_id)
        return hmac.new(mk, b"cdcrypt-det-dek\x00" + _canon_context(context),
                        hashlib.sha256).digest()

    # ---- asymmetric (RSA-OAEP) key material: C9/C10 ----

    def _asym_pair(self, key_id: str) -> tuple[bytes, bytes]:
        if not key_id:
            raise ClientErrorException("empty key id")
        if key_id not in self._asym_pems:
            from cryptography.hazmat.primitives import serialization
            from cryptography.hazmat.primitives.asymmetric import rsa

            key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
            priv = key.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.PKCS8,
                serialization.NoEncryption(),
            )
            pub = key.public_key().public_bytes(
                serialization.Encoding.PEM,
                serialization.PublicFormat.SubjectPublicKeyInfo,
            )
            self._asym_pems[key_id] = (pub, priv)
        return self._asym_pems[key_id]

    def fetch_public_pem(self, key_id: str) -> bytes:
        return self._asym_pair(key_id)[0]

    def asym_unwrap(self, wrapped: bytes, key_id: str) -> bytes:
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import padding

        priv = serialization.load_pem_private_key(
            self._asym_pair(key_id)[1], password=None)
        try:
            dek = priv.decrypt(
                wrapped,
                padding.OAEP(mgf=padding.MGF1(hashes.SHA256()),
                             algorithm=hashes.SHA256(), label=None),
            )
        except ValueError as e:
            raise ClientErrorException(
                f"asymmetric unwrap failed for key_id={key_id!r}: wrong key"
            ) from e
        if len(dek) != _DEK_LEN:
            raise ClientErrorException("unwrapped data key has wrong length")
        return dek


class FaultInjectingTransport(InProcessKmsTransport):
    """Chaos transport for retry-path tests (the transport-layer analogue
    of ``MockKMS.fail_mode``): ``generate_data_key`` raises
    :class:`KmsTransportError` with the configured ``status``. With
    ``once_marker`` set, the fault fires exactly once across ALL processes
    (a marker file — the pickled closure lands in separate Python
    workers, so an attribute flag would re-fire per worker); without it,
    every call fails. Lives in the library so UDF closures can unpickle
    it inside executors."""

    def __init__(self, status: int | None = None,
                 retriable: bool | None = None,
                 once_marker: str | None = None):
        super().__init__()
        self.status = status
        self.retriable = retriable
        self.once_marker = once_marker

    def generate_data_key(self, key_id, context=None):
        if self.once_marker is not None:
            if not os.path.exists(self.once_marker):
                with open(self.once_marker, "w") as f:
                    f.write("tripped")
                raise KmsTransportError("injected transient fault",
                                        status=self.status,
                                        retriable=self.retriable)
            return super().generate_data_key(key_id, context)
        raise KmsTransportError("injected transport fault",
                                status=self.status, retriable=self.retriable)


class MockKMS:
    """KMS service: the engine-facing API over a pluggable transport.

    ``fail_mode`` injects faults for retry-path tests. ``transport``
    defaults to :class:`InProcessKmsTransport`; pass a real client for
    Vault/AWS/GCP. The service maps :class:`KmsTransportError` to the
    engine's typed errors (retriable server vs fatal client, C3/O10) —
    transports never need to know the engine's exception taxonomy.

    Asymmetric (RSA-OAEP) mode mirrors the reference's GCP asymmetric
    mode (``GCPKeyManagementService.java:119-199``): the public key is
    fetched ONCE at plan-compile time and shipped to executors so
    encrypt-side DEK wrapping is fully local (C9); the private key never
    leaves the KMS — decrypt unwraps via :meth:`asym_unwrap`, once per
    distinct wrapped DEK thanks to the executor-local cache (C10)."""

    def __init__(self, fail_mode: str | None = None,
                 transport: KmsTransport | None = None):
        self.fail_mode = fail_mode  # None | 'server' | 'client'
        self.transport = transport or InProcessKmsTransport()
        self.wrap_calls = 0
        self.unwrap_calls = 0
        self.public_key_fetches = 0
        self.asym_unwrap_calls = 0

    def _maybe_fail(self) -> None:
        if self.fail_mode == "server":
            raise ServerErrorException("mock KMS unavailable (injected)")
        if self.fail_mode == "client":
            raise ClientErrorException("mock KMS rejected request (injected)")

    def _call(self, fn, *args):
        """Invoke a transport op with the C3 error mapping: transport
        faults become retriable server errors or fatal client errors by
        HTTP-status split; already-typed engine errors pass through."""
        self._maybe_fail()
        try:
            return fn(*args)
        except (ClientErrorException, ServerErrorException):
            raise
        except KmsTransportError as e:
            if e.retriable:
                raise ServerErrorException(
                    f"KMS transport error (retriable): {e}") from e
            raise ClientErrorException(
                f"KMS rejected request (status={e.status}): {e}") from e

    def generate_data_key(
        self, key_id: str, context: dict[str, str] | None = None
    ) -> tuple[bytes, bytes]:
        """Return ``(plaintext_dek, wrapped_dek)``.

        One call per Arrow batch on the encrypt path (C5 envelope pattern,
        ``AWSKeyManagementService.java:113-115``).
        """
        self.wrap_calls += 1
        return self._call(self.transport.generate_data_key, key_id, context)

    def wrap(self, dek: bytes, key_id: str,
             context: dict[str, str] | None = None) -> bytes:
        self.wrap_calls += 1
        return self._call(self.transport.wrap, dek, key_id, context)

    def unwrap(
        self, wrapped: bytes, key_id: str, context: dict[str, str] | None = None
    ) -> bytes:
        """Unwrap a data key. One call per distinct wrapped key per executor
        (callers cache the result keyed by the wrapped bytes)."""
        self.unwrap_calls += 1
        return self._call(self.transport.unwrap, wrapped, key_id, context)

    def derive_deterministic_dek(
        self, key_id: str, context: dict[str, str] | None = None
    ) -> bytes:
        """Stable data key for CONVERGENT encryption (Vault's derived-key
        mode, ``EncryptParameter.java:14-20`` context semantics): the same
        (key_id, context) always yields the same DEK, on any executor,
        with no stored state — equality of plaintexts then survives
        encryption, which is what makes encrypted KEY columns group-,
        join- and MERGE-able. One derivation per (key_id, context) per
        executor (callers cache)."""
        return self._call(self.transport.derive_deterministic_dek,
                          key_id, context)

    def revoke(self, key_id: str,
               context: dict[str, str] | None = None) -> None:
        """Crypto-shred: destroy the key material for (key_id, context).
        Server-side state — visible to every client of this transport;
        executor-side closures pickled BEFORE the revocation keep their
        snapshot (like any KMS client with a key cache TTL), so build
        read plans after revoking."""
        self.transport.revoke(key_id, context)

    def asym_public_pem(self, key_id: str) -> bytes:
        """Fetch the public key (PEM) — the ONE remote call of the
        asymmetric encrypt path, made at plan-compile time and cached by the
        caller (``GCPKeyManagementService.java:119-132`` fetch-once)."""
        self.public_key_fetches += 1
        return self._call(self.transport.fetch_public_pem, key_id)

    def asym_unwrap(self, wrapped: bytes, key_id: str) -> bytes:
        """RSA-OAEP unwrap of a data key — the private key stays inside the
        KMS (``GCPKeyManagementService.java:184-199``); called once per
        distinct wrapped DEK per executor (cache on the caller side)."""
        self.asym_unwrap_calls += 1
        return self._call(self.transport.asym_unwrap, wrapped, key_id)


def rsa_oaep_wrap(dek: bytes, public_key_pem: bytes) -> bytes:
    """Local RSA-OAEP wrap under a fetched public key — the executor-side
    half of C9 (``GCPKeyManagementService.java:147-165``): after the one
    public-key fetch, encryption makes ZERO KMS calls."""
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding

    pub = serialization.load_pem_public_key(public_key_pem)
    return pub.encrypt(
        dek,
        padding.OAEP(mgf=padding.MGF1(hashes.SHA256()),
                     algorithm=hashes.SHA256(), label=None),
    )


# Default shared instance: executors construct their own (module import is
# per Python worker), which is correct — the mock derives master keys
# deterministically, so no cross-process state is needed.
DEFAULT_KMS = MockKMS()
