"""Persisted-intermediate bookkeeping for operators with a ``cache=`` knob.

Operators like :func:`cdcrypt.operators.docdedup.minhash_lsh_candidates`
persist an intermediate relation (the banded LSH rows) when ``cache=True``
so the shingle/signature pipeline runs once instead of feeding each
self-join side a recompute. Spark keeps a persisted RDD in executor
storage until it is explicitly unpersisted or the session ends — a leak
when the helper is called repeatedly in a long-lived session.

The contract here: the operator attaches its persisted handle(s) to the
RETURNED DataFrame, and the caller releases them with
:func:`unpersist_intermediates` once the result has been materialized
(collected / written). Unreleased handles still die with the session, so
one-shot jobs may ignore this entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_cdcrypt_persisted"


def register_persisted(result: DataFrame, *handles: DataFrame) -> DataFrame:
    """Attach persisted intermediate handles to ``result`` (operator-side)."""
    existing = list(getattr(result, _ATTR, ()))
    setattr(result, _ATTR, existing + list(handles))
    return result


def persisted_intermediates(result: DataFrame) -> list[DataFrame]:
    """The persisted intermediates backing ``result`` (empty if none)."""
    return list(getattr(result, _ATTR, ()))


def unpersist_intermediates(result: DataFrame, blocking: bool = False) -> int:
    """Release every persisted intermediate attached to ``result``.

    Call AFTER the result is materialized (``.collect()`` / write) — the
    handles feed the result's plan, so releasing earlier forfeits the
    cache benefit (correctness is unaffected; Spark recomputes).
    Returns the number of handles released.
    """
    handles = persisted_intermediates(result)
    for h in handles:
        h.unpersist(blocking=blocking)
    if handles:
        setattr(result, _ATTR, [])
    return len(handles)
