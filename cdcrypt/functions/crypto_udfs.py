"""Vectorized (Arrow-batched) pandas UDFs for envelope encrypt/decrypt.

This is the engine's ONLY Python hot path — everything else stays in Catalyst
Columns. Design contract (north rule: "no per-row Python, no per-record KMS
round-trips"):

- one pandas UDF invocation per Arrow batch (spark.sql.execution.arrow.
  maxRecordsPerBatch rows), one ``generate_data_key`` KMS call per batch on
  encrypt (C5 envelope pattern, ``AWSKeyManagementService.java:113-115``);
- decrypt unwraps each distinct wrapped DEK once per Python worker via the
  module-global ``_DEK_CACHE`` — the executor-local analogue of the
  reference's fetch-once public-key cache
  (``GCPKeyManagementService.java:119-132``); safe across task retries
  because the cache is a pure function of the wrapped bytes;
- the "batch axis flip" (SURVEY.md O7): the reference batches *fields within
  a record* into one Vault call (``VaultService.java:42-61``); Spark batches
  *rows within an Arrow batch* — same network-amortization idea, vectorized.

Condition gate (O6) rides INSIDE the UDF as a boolean Series: Spark's
ExtractPythonUDFs rule evaluates Python UDFs eagerly on every row before a
surrounding CASE WHEN selects, so an outer ``F.when(cond, udf(...))`` would
(a) pay crypto for gated-out rows and (b) crash decrypt on rows whose value
is not an envelope. Passing the gate in keeps the reference's per-row-branch
semantics (non-matching rows pass through unmodified,
``TransformTest.java:165-173``) with zero wasted crypto.

UDF variants: scalar string/binary and array<string> (for ``path[*]``
wildcards, O5 — elements of all gated rows of the batch are flattened into
ONE crypto batch, so an array column still costs one KMS wrap per Arrow
batch).
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    StringType,
    StructField,
    StructType,
)

from cdcrypt.envelope import decrypt_batch, encrypt_batch
from cdcrypt.kms import MockKMS

# Executor-local (per Python worker process) cache: wrapped DEK bytes -> AESGCM.
# Bounded: wrapped keys are ~60 B and one per (job, batch); a worker sees at
# most a few thousand per long job. Evict wholesale at the cap to stay O(MBs).
_DEK_CACHE: dict[bytes, object] = {}
_DEK_CACHE_MAX = 65536


def _cache() -> dict[bytes, object]:
    if len(_DEK_CACHE) > _DEK_CACHE_MAX:
        _DEK_CACHE.clear()
    return _DEK_CACHE


# old envelope header -> new header, for key-rotation rewrap (same
# executor-locality and bound rationale as the DEK cache)
_REWRAP_CACHE: dict[bytes, bytes] = {}


def _rewrap_cache() -> dict[bytes, bytes]:
    if len(_REWRAP_CACHE) > _DEK_CACHE_MAX:
        _REWRAP_CACHE.clear()
    return _REWRAP_CACHE


def _clean(values: Sequence[object]) -> list[object]:
    return [None if v is None or v is pd.NA else v for v in values]


def _gated_apply(
    values: list[object],
    gate: list[object] | None,
    aad: list[object] | None,
    batch_fn: Callable[[list[object], list[object] | None], list[object]],
    passthrough: Callable[[object], object],
) -> list[object]:
    """Run ``batch_fn`` over only the gate-true rows; others pass through.

    The selected rows still form ONE crypto batch (one KMS wrap)."""
    if gate is None:
        return batch_fn(values, aad)
    sel_idx = [i for i, g in enumerate(gate) if g is True or g == 1]
    out = [passthrough(v) for v in values]
    if not sel_idx:
        return out
    sub_vals = [values[i] for i in sel_idx]
    sub_aad = [aad[i] for i in sel_idx] if aad is not None else None
    sub_out = batch_fn(sub_vals, sub_aad)
    for j, i in enumerate(sel_idx):
        out[i] = sub_out[j]
    return out


def _per_aad_groups(values, aad, group_fn):
    """Apply ``group_fn(sub_values, sub_aad, aad_value)`` once per
    DISTINCT aad value in the batch, reassembling in order.

    The crypto-shredding granularity trade (SURVEY C4/C12): one data key
    per (batch x distinct identity) instead of one per batch, so the KMS
    can later revoke a single identity's material. Rows with a NULL aad
    form their own group bound to the base context (no identity — not
    shreddable, by construction)."""
    if aad is None:
        raise ValueError("per-identity crypto requires an aad column")
    out = [None] * len(values)
    groups: dict[object, list[int]] = {}
    for i, a in enumerate(aad):
        groups.setdefault(a, []).append(i)
    for a, idxs in groups.items():
        sub = group_fn([values[i] for i in idxs],
                       [aad[i] for i in idxs], a)
        for j, i in enumerate(idxs):
            out[i] = sub[j]
    return out


def _shred_context(base: dict[str, str] | None, aad_value) -> dict[str, str] | None:
    if aad_value is None:
        return base
    v = (aad_value.decode("utf-8", "replace")
         if isinstance(aad_value, (bytes, bytearray)) else str(aad_value))
    return {**(base or {}), "shred": v}


def _build_udf(core, ret, use_aad: bool, use_gate: bool):
    """Assemble a pandas UDF with the right positional signature:
    (value[, aad][, gate])."""
    if use_aad and use_gate:

        def f(v: pd.Series, a: pd.Series, g: pd.Series) -> pd.Series:
            return pd.Series(core(_clean(v.tolist()), _clean(a.tolist()),
                                  g.tolist()), dtype=object)
    elif use_aad:

        def f(v: pd.Series, a: pd.Series) -> pd.Series:  # type: ignore[misc]
            return pd.Series(core(_clean(v.tolist()), _clean(a.tolist()), None),
                             dtype=object)
    elif use_gate:

        def f(v: pd.Series, g: pd.Series) -> pd.Series:  # type: ignore[misc]
            return pd.Series(core(_clean(v.tolist()), None, g.tolist()),
                             dtype=object)
    else:

        def f(v: pd.Series) -> pd.Series:  # type: ignore[misc]
            return pd.Series(core(_clean(v.tolist()), None, None), dtype=object)

    return F.pandas_udf(f, ret)


def _str_passthrough_for(encoding: str):
    if encoding == "binary":
        # gated-out plaintext in a binary output column: utf-8 bytes
        return lambda v: v.encode("utf-8") if isinstance(v, str) else v
    return lambda v: v


def make_encrypt_udf(
    key_id: str,
    *,
    encoding: str = "string",
    kms: MockKMS | None = None,
    context: dict[str, str] | None = None,
    use_aad: bool = False,
    use_gate: bool = False,
    asymmetric: bool = False,
    deterministic: bool = False,
    per_aad_context: bool = False,
) -> Callable:
    """Pandas UDF: (value[, aad][, gate]) -> envelope (base64 str or bytes).

    ``per_aad_context=True`` (requires ``use_aad``) makes the column
    CRYPTO-SHREDDABLE: rows are grouped by aad value and each group gets
    its own data key wrapped under context ``{'shred': <aad>}`` — one
    wrap per (batch x distinct identity) instead of one per batch, the
    price of per-identity erasure (``MockKMS.revoke``).

    ``asymmetric=True`` fetches the RSA public key ONCE here (driver-side,
    plan-compile time — the reference's ``init()`` fetch-once pattern,
    ``GCPKeyManagementService.java:119-132``) and ships the PEM in the
    closure: executors then wrap per-batch DEKs locally with ZERO KMS calls
    on the encrypt path (C9). ``deterministic=True`` selects convergent
    encryption (equal input -> byte-equal envelope; see envelope.py)."""
    ret = StringType() if encoding == "string" else BinaryType()
    kms_inst = kms or MockKMS()
    passthrough = _str_passthrough_for(encoding)
    pub_pem = kms_inst.asym_public_pem(key_id) if asymmetric else None
    if per_aad_context and not use_aad:
        raise ValueError("per_aad_context requires use_aad")

    def _enc(v, a, ctx):
        return encrypt_batch(v, key_id, kms_inst, aad=a,
                             encoding=encoding, context=ctx,
                             public_key_pem=pub_pem,
                             deterministic=deterministic)

    def core(vals, aad, gate):
        if per_aad_context:
            fn = lambda v, a: _per_aad_groups(  # noqa: E731
                v, a, lambda sv, sa, av: _enc(sv, sa,
                                              _shred_context(context, av)))
        else:
            fn = lambda v, a: _enc(v, a, context)  # noqa: E731
        return _gated_apply(vals, gate, aad, fn, passthrough)

    return _build_udf(core, ret, use_aad, use_gate)


def make_decrypt_udf(
    *,
    output: str = "string",
    kms: MockKMS | None = None,
    context: dict[str, str] | None = None,
    use_aad: bool = False,
    use_gate: bool = False,
    expect_key_id: str | None = None,
    per_aad_context: bool = False,
    revoked_to_null: bool = False,
) -> Callable:
    """Pandas UDF: (envelope[, aad][, gate]) -> plaintext.

    ``per_aad_context=True`` decrypts a crypto-shreddable column (see
    make_encrypt_udf): rows group by aad value, each group unwraps under
    context ``{'shred': <aad>}``. ``revoked_to_null=True`` turns a
    revoked identity's rows into NULLs instead of failing the job — the
    read-side contract of crypto-shredding (the ciphertext is still on
    disk; the data is gone). Leave False to surface KeyRevokedException
    loudly (an audit read that does not expect shredded rows)."""
    ret = StringType() if output == "string" else BinaryType()
    kms_inst = kms or MockKMS()
    if per_aad_context and not use_aad:
        raise ValueError("per_aad_context requires use_aad")

    def _dec(v, a, ctx, cache=None):
        return decrypt_batch(v, kms_inst, aad=a, output=output,
                             dek_cache=_cache() if cache is None else cache,
                             context=ctx,
                             expect_key_id=expect_key_id)

    def core(vals, aad, gate):
        if per_aad_context:
            from cdcrypt.errors import KeyRevokedException

            def per_group(sv, sa, av):
                try:
                    # shreddable reads MUST NOT trust the cross-batch
                    # executor DEK cache: a DEK unwrapped before a
                    # revocation would keep decrypting the revoked
                    # identity (observed as a flaky leak in
                    # test_crypto_shred). A fresh per-group dict keeps
                    # the one-unwrap-per-distinct-wrapped-DEK
                    # amortization inside the group (a group shares its
                    # DEK by construction) while making every
                    # micro-batch re-validate revocation with the KMS.
                    return _dec(sv, sa, _shred_context(context, av),
                                cache={})
                except KeyRevokedException:
                    if revoked_to_null:
                        return [None] * len(sv)
                    raise
            fn = lambda v, a: _per_aad_groups(v, a, per_group)  # noqa: E731
        else:
            fn = lambda v, a: _dec(v, a, context)  # noqa: E731
        return _gated_apply(vals, gate, aad, fn, lambda v: v)

    return _build_udf(core, ret, use_aad, use_gate)


def _build_struct_udf(core, ret: StructType, use_aad: bool, use_gate: bool):
    """Like :func:`_build_udf` but the core returns (value, error) tuples
    and the UDF yields a struct<value, error> column (one Arrow batch,
    two child arrays — no extra Python crossings)."""
    cols = [f.name for f in ret.fields]

    def frame(pairs):
        return pd.DataFrame(pairs, columns=cols, dtype=object)

    if use_aad and use_gate:

        def f(v: pd.Series, a: pd.Series, g: pd.Series) -> pd.DataFrame:
            return frame(core(_clean(v.tolist()), _clean(a.tolist()),
                              g.tolist()))
    elif use_aad:

        def f(v: pd.Series, a: pd.Series) -> pd.DataFrame:  # type: ignore[misc]
            return frame(core(_clean(v.tolist()), _clean(a.tolist()), None))
    elif use_gate:

        def f(v: pd.Series, g: pd.Series) -> pd.DataFrame:  # type: ignore[misc]
            return frame(core(_clean(v.tolist()), None, g.tolist()))
    else:

        def f(v: pd.Series) -> pd.DataFrame:  # type: ignore[misc]
            return frame(core(_clean(v.tolist()), None, None))

    return F.pandas_udf(f, ret)


def make_decrypt_tolerant_udf(
    *,
    output: str = "string",
    kms: MockKMS | None = None,
    context: dict[str, str] | None = None,
    use_aad: bool = False,
    use_gate: bool = False,
    expect_key_id: str | None = None,
) -> Callable:
    """Pandas UDF: (envelope[, aad][, gate]) -> struct<value, error>.

    The error-TOLERANT decrypt (Kafka Connect ``errors.tolerance=all`` +
    dead-letter-queue semantics, which the reference SMT inherits from its
    runtime rather than implementing — this engine owns the runtime, so it
    owns the tolerance): per-row DATA errors (malformed envelope, tamper,
    AAD/key-id mismatch, revoked key) yield ``value=NULL`` plus a typed
    ``"<ExcClass>: <msg>"`` in ``error`` instead of failing the task — one
    poison record must not kill a 10^10-event replay. Transient SERVER
    errors still raise (infra faults route to epoch replay, reference
    Transform.java:124-125). Gated-out rows pass through with error NULL.
    """
    ret = StructType([
        StructField("value",
                    StringType() if output == "string" else BinaryType()),
        StructField("error", StringType()),
    ])
    kms_inst = kms or MockKMS()

    def tolerant(v, a):
        errs: list = [None] * len(v)
        vals = decrypt_batch(v, kms_inst, aad=a, output=output,
                             dek_cache=_cache(), context=context,
                             expect_key_id=expect_key_id, errors_out=errs)
        return list(zip(vals, errs))

    def core(vals, aad, gate):
        return _gated_apply(vals, gate, aad, tolerant, lambda v: (v, None))

    return _build_struct_udf(core, ret, use_aad, use_gate)


def make_rewrap_udf(
    new_key_id: str,
    *,
    encoding: str = "string",
    kms: MockKMS | None = None,
    context: dict[str, str] | None = None,
    new_context: dict[str, str] | None = None,
    expect_key_id: str | None = None,
    use_gate: bool = False,
) -> Callable:
    """Pandas UDF: (envelope[, gate]) -> envelope rewrapped under
    ``new_key_id`` (C12 key rotation). Header-only: the AES-GCM payload
    is never decrypted — O(distinct DEKs) KMS work per executor via the
    rewrap cache, a byte splice per row (envelope.rewrap_batch)."""
    from cdcrypt.envelope import rewrap_batch

    ret = StringType() if encoding == "string" else BinaryType()
    kms_inst = kms or MockKMS()

    def core(vals, aad, gate):
        return _gated_apply(
            vals, gate, aad,
            lambda v, a: rewrap_batch(v, new_key_id, kms_inst,
                                      rewrap_cache=_rewrap_cache(),
                                      context=context,
                                      new_context=new_context,
                                      expect_key_id=expect_key_id),
            lambda v: v,
        )

    return _build_udf(core, ret, False, use_gate)


def _flatten_arrays(lists, index: int | None):
    """Flatten list-of-lists (or the single ``index`` element of each) into one
    crypto batch; remember spans for regrouping."""
    flat: list[object] = []
    spans: list[tuple[int, int] | None] = []
    for lst in lists:
        if lst is None:
            spans.append(None)
            continue
        start = len(flat)
        if index is None:
            flat.extend(lst)
        elif 0 <= index < len(lst):
            flat.append(lst[index])
        spans.append((start, len(flat)))
    return flat, spans


def _regroup_arrays(lists, spans, new_flat, index: int | None):
    out = []
    for lst, span in zip(lists, spans):
        if span is None:
            out.append(None)
            continue
        s, e = span
        if index is None:
            out.append(list(new_flat[s:e]))
        else:
            new = list(lst)
            if s < e:
                new[index] = new_flat[s]
            out.append(new)
    return out


def _flatten_nested(cells):
    """Flatten list-of-list-of-leaves cells (nested ``[*]...[*]`` paths) into
    one crypto batch; spans remember inner sizes (None = null inner array)."""
    flat: list[object] = []
    spans: list[list[int | None] | None] = []
    for cell in cells:
        if cell is None:
            spans.append(None)
            continue
        cs: list[int | None] = []
        for inner in cell:
            if inner is None:
                cs.append(None)
            else:
                cs.append(len(inner))
                flat.extend(inner)
        spans.append(cs)
    return flat, spans


def _regroup_nested(spans, new_flat):
    out = []
    pos = 0
    for cs in spans:
        if cs is None:
            out.append(None)
            continue
        rebuilt: list[list | None] = []
        for n in cs:
            if n is None:
                rebuilt.append(None)
            else:
                rebuilt.append(list(new_flat[pos:pos + n]))
                pos += n
        out.append(rebuilt)
    return out


def _make_array_udf(batch_fn, index: int | None, use_gate: bool,
                    nested: bool = False):
    if nested:
        assert index is None, "nested array paths carry no terminal index"

    def core(lists, _aad, gate):
        if gate is not None:
            work = [lst if (g is True or g == 1) else None
                    for lst, g in zip(lists, gate)]
        else:
            work = lists
        if nested:
            flat, spans = _flatten_nested(work)
            rewritten = _regroup_nested(spans, batch_fn(flat))
        else:
            flat, spans = _flatten_arrays(work, index)
            rewritten = _regroup_arrays(work, spans, batch_fn(flat), index)
        if gate is None:
            return rewritten
        return [rw if (g is True or g == 1) else lst
                for lst, rw, g in zip(lists, rewritten, gate)]

    out_type = (ArrayType(ArrayType(StringType())) if nested
                else ArrayType(StringType()))
    return _build_udf(core, out_type, use_aad=False, use_gate=use_gate)


def make_encrypt_array_udf(
    key_id: str,
    *,
    kms: MockKMS | None = None,
    context: dict[str, str] | None = None,
    index: int | None = None,
    use_gate: bool = False,
    nested: bool = False,
) -> Callable:
    """array<string> -> array<string>: encrypt every element (``[*]``) or only
    element ``index`` (``[n]``). ``nested=True``: array<array<string>> cells
    (``[*]...[*]`` paths) — leaves flatten into the SAME one crypto batch and
    regroup by inner spans, so ragged/null inner arrays realign exactly."""
    kms_inst = kms or MockKMS()
    return _make_array_udf(
        lambda flat: encrypt_batch(flat, key_id, kms_inst, context=context),
        index, use_gate, nested,
    )


def make_decrypt_array_udf(
    *,
    kms: MockKMS | None = None,
    context: dict[str, str] | None = None,
    index: int | None = None,
    use_gate: bool = False,
    nested: bool = False,
) -> Callable:
    """Inverse of :func:`make_encrypt_array_udf`."""
    kms_inst = kms or MockKMS()
    return _make_array_udf(
        lambda flat: decrypt_batch(flat, kms_inst, dek_cache=_cache(),
                                   context=context),
        index, use_gate, nested,
    )
