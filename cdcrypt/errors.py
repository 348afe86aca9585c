"""Typed error hierarchy mirroring the reference's retry-vs-fail routing.

Reference parity: ``exception/ServiceException.java:3-19``,
``ServerErrorException.java:3-19``, ``ClientErrorException.java:3-19``;
routing at ``Transform.java:124-130`` (server error -> RetriableException,
client/data error -> DataException).

In the Spark engine the split decides *epoch replay* (transient, safe because
the sink commit is idempotent) vs *job abort* (data error, operator bug or
corrupt input).
"""

from __future__ import annotations


class ServiceException(Exception):
    """Base class for crypto-service failures."""


class ClientErrorException(ServiceException):
    """Caller/data error (bad key id, AAD mismatch, unsupported type).

    Non-retriable: replaying the epoch would fail identically, so the
    pipeline aborts the job (reference: DataException, Transform.java:126-129).
    """


class KeyRevokedException(ClientErrorException):
    """The key material for this (key id, context) was revoked —
    crypto-shredding (GDPR-style erasure on immutable storage): the
    ciphertext still exists but is permanently unreadable. A subclass of
    the fatal client error so retry routing is unchanged, while readers
    that EXPECT shredded rows (decrypt with ``revoked_to_null``) can
    catch it specifically and surface nulls instead of failing."""


class ServerErrorException(ServiceException):
    """Transient service-side error. Retriable via epoch replay
    (reference: RetriableException, Transform.java:124-125)."""


class RetriableEpochError(Exception):
    """Raised by the pipeline driver when an epoch should be replayed."""

    def __init__(self, epoch: int, cause: Exception):
        super().__init__(f"epoch {epoch} failed transiently: {cause}")
        self.epoch = epoch
        self.cause = cause


class EpochAuditError(Exception):
    """An epoch's staged commit failed its write-audit-publish gate
    (IngestPipeline ``audit=...``, ``audit_action='fail'``). The staged
    snapshot was abandoned and no checkpoint was written, so fixing the
    input/transform and re-running replays the SAME epoch — data failing
    its quality gate never becomes current."""

    def __init__(self, epoch: int, version: int, lineage: dict):
        super().__init__(
            f"epoch {epoch} rejected by audit (staged v{version} abandoned)")
        self.epoch = epoch
        self.version = version
        self.lineage = lineage


def classify(exc: Exception) -> str:
    """Classify an exception as 'retriable' | 'fatal' (O10 semantics)."""
    if isinstance(exc, ServerErrorException):
        return "retriable"
    return "fatal"
