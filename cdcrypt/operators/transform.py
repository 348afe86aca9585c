"""FieldTransform — the engine's equivalent of the reference SMT.

One configured transform = one Catalyst projection rewrite over a micro-batch
DataFrame (the whole of ``Transform.java:56-131`` becomes a single
``withColumn`` chain):

    df.withColumn(field, WHEN(cond, crypto_udf(field[, aad])).OTHERWISE(field))

Parity map (SURVEY.md §2.1):
- O1 record map      -> the projection itself
- O2 null passthrough-> UDF returns None for None input
- O4/O5 field paths  -> fieldpath.compile_path / rewrite (wildcards stay
                        vectorized instead of per-record expansion)
- O6 condition gate  -> condition.compile_condition, per-row CASE WHEN
                        (non-matching rows pass through unmodified,
                        TransformTest.java:165-173)
- O7/O8 batching     -> Arrow batch = the crypto batch (one KMS wrap each)
- O9 writeback       -> withField/withColumn rewrite
- O10 error routing  -> typed exceptions surface through the driver
                        (streaming/pipeline.py maps them to replay vs abort)
- O12/O13 config     -> TransformConfig validation + compile() here, once,
                        driver-side

Config validation mirrors ``OneOfValidator.java:10-24`` (enum membership) and
the both-or-neither condition rule (``Config.java:170-180``).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdcrypt.functions.condition import compile_condition
from cdcrypt.functions.crypto_udfs import (
    make_decrypt_array_udf,
    make_decrypt_tolerant_udf,
    make_decrypt_udf,
    make_encrypt_array_udf,
    make_encrypt_udf,
)
from cdcrypt.functions.fieldpath import (
    CompiledPath,
    PathCompileError,
    compile_path,
    path_exists,
    rewrite,
    select_column,
)
from cdcrypt.kms import MockKMS

_MODES = ("encrypt", "decrypt")
_ENCODINGS = ("string", "binary")

# on_error='dlq' appends this array<struct<field, error>> column: empty for
# clean rows, one entry per failed field otherwise (split_dlq routes on it)
ERROR_COL = "_cdcrypt_errors"


class ConfigError(ValueError):
    """Invalid transform configuration (driver-side, pre-execution)."""


def _one_of(name: str, value: str, allowed: tuple[str, ...]) -> str:
    # OneOfValidator.java:10-24 analogue
    if value not in allowed:
        raise ConfigError(f"{name}={value!r} must be one of {allowed}")
    return value


@dataclass
class TransformConfig:
    mode: str  # encrypt | decrypt
    fields: list[str]  # limited-JsonPath strings
    key_id: str = "cdcrypt/default"
    encoding: str = "string"  # output encoding, Item.Encoding analogue
    condition_field: str | None = None
    condition_equals: str | None = None
    aad_field: str | None = None  # per-row AAD column (e.g. conv_id)
    kms: MockKMS = dc_field(default_factory=MockKMS)
    context: dict[str, str] | None = None
    # 'udf' = pandas-UDF envelope crypto, per-Arrow-batch data keys (the north
    # rule's canonical path); 'jvm' = builtin aes_encrypt/aes_decrypt building
    # the identical envelope with a per-micro-batch data key — no Python
    # boundary (functions/crypto_jvm.py; array paths fall back to 'udf')
    backend: str = "udf"
    # decrypt + backend='jvm': wrapped DEKs expected in the column (e.g. from
    # ingest lineage); None -> one-pass discovery scan at plan build
    wrapped_deks: list[bytes] | None = None
    # decrypt: verify each envelope's key id against ``key_id`` (the
    # reference's master-key check, AWSKeyManagementService.java:138-140).
    # False enables KEY ROTATION reads (C12): the UDF backend resolves each
    # row's master key from its own envelope header, so one column may mix
    # epochs encrypted under rotated key ids. (The jvm backend requires a
    # single key id per read and always verifies.)
    verify_key_id: bool = True
    # encrypt: wrap per-batch DEKs with RSA-OAEP under a public key fetched
    # ONCE at compile (C9, GCPKeyManagementService.java:119-165) — zero KMS
    # calls on the encrypt path. Decrypt auto-detects the envelope version;
    # the private key stays in the KMS (C10). udf backend only.
    asymmetric: bool = False
    # encrypt: CONVERGENT mode (Vault derived-key semantics, C4): derived
    # DEK + SIV-style nonce, equal plaintext+AAD -> byte-equal envelope, so
    # encrypted KEY columns keep equality (group/join/MERGE on ciphertext).
    # Leaks equality by design — key/identifier columns only. udf backend.
    deterministic: bool = False
    # CRYPTO-SHREDDABLE column: one data key per (Arrow batch x distinct
    # aad value), wrapped under context {'shred': <aad>} — so
    # kms.revoke(key_id, {'shred': conv}) permanently erases ONE
    # conversation from an immutable lake (GDPR-style). Costs one KMS
    # wrap per distinct identity per batch instead of one per batch.
    # Requires aad_field; udf backend; symmetric only.
    shreddable: bool = False
    # decrypt + shreddable: surface a revoked identity's rows as NULLs
    # (the expected post-erasure read) instead of failing the job
    revoked_to_null: bool = False
    # decrypt error tolerance (Kafka Connect errors.tolerance + dead-letter
    # semantics, which the reference SMT inherits from its runtime — this
    # engine owns the runtime, so it owns the tolerance):
    #   'fail' -> first data error fails the task (default, reference parity)
    #   'dlq'  -> per-row data errors yield value=NULL and append
    #             {field, "<ExcClass>: <msg>"} to the ERROR_COL array column;
    #             split_dlq() then routes quarantined rows to a dead-letter
    #             sink. Transient server errors still raise (epoch replay is
    #             the correct handler). udf backend, scalar paths only.
    on_error: str = "fail"

    def __post_init__(self) -> None:
        _one_of("mode", self.mode, _MODES)
        _one_of("encoding", self.encoding, _ENCODINGS)
        _one_of("backend", self.backend, ("udf", "jvm"))
        if not self.fields:
            raise ConfigError("at least one field path is required")
        if (self.condition_field is None) != (self.condition_equals is None):
            raise ConfigError(
                "condition.field and condition.equals must be set together"
            )
        if not self.key_id:
            raise ConfigError("key_id is required")
        if self.asymmetric and self.backend == "jvm":
            raise ConfigError(
                "asymmetric mode requires the udf backend (no RSA builtin)")
        if self.asymmetric and self.context:
            raise ConfigError(
                "encryption context is not supported with asymmetric wrap")
        if self.deterministic and self.asymmetric:
            raise ConfigError(
                "deterministic and asymmetric modes are mutually exclusive")
        if self.deterministic and self.backend == "jvm":
            raise ConfigError(
                "deterministic mode requires the udf backend")
        if self.shreddable:
            if self.aad_field is None:
                raise ConfigError(
                    "shreddable requires aad_field (the shred identity)")
            if self.backend != "udf":
                raise ConfigError("shreddable requires the udf backend")
            if self.asymmetric or self.deterministic:
                raise ConfigError(
                    "shreddable is symmetric-envelope only")
        if self.revoked_to_null and not self.shreddable:
            raise ConfigError(
                "revoked_to_null only applies to shreddable columns")
        _one_of("on_error", self.on_error, ("fail", "dlq"))
        if self.on_error == "dlq":
            if self.mode != "decrypt":
                raise ConfigError(
                    "on_error='dlq' applies to decrypt (encrypt-side data "
                    "errors are producer bugs — fail loudly)")
            if self.backend != "udf":
                raise ConfigError("on_error='dlq' requires the udf backend")
            if self.shreddable:
                raise ConfigError(
                    "on_error='dlq' and shreddable are mutually exclusive "
                    "(use revoked_to_null for expected-shredded reads)")


class FieldTransform:
    """Compiled transform; construct once per job, apply per micro-batch.

    After an ``apply()`` with ``backend='jvm'`` in encrypt mode,
    ``last_wrapped_deks`` holds the wrapped data key(s) minted for that
    micro-batch — the ingest pipeline records them in commit lineage so
    later decrypts skip key discovery."""

    def __init__(self, config: TransformConfig):
        self.config = config
        self.last_wrapped_deks: list[bytes] = []
        try:
            self._paths: list[tuple[str, CompiledPath]] = [
                (p, compile_path(p)) for p in config.fields
            ]
        except PathCompileError as e:
            raise ConfigError(str(e)) from e

    def apply(self, df: DataFrame) -> DataFrame:
        """Rewrite the configured fields; everything else passes through.

        The condition gate is shipped INTO the UDF as a boolean column
        (see crypto_udfs module docstring for why an outer CASE WHEN would
        be wrong): non-matching rows pass through unmodified and pay no
        crypto.
        """
        cfg = self.config
        use_gate = cfg.condition_field is not None
        gate = (
            compile_condition(df, cfg.condition_field, cfg.condition_equals)
            if use_gate
            else None
        )
        use_aad = cfg.aad_field is not None
        if cfg.mode == "encrypt":
            self.last_wrapped_deks = []
        dlq = cfg.mode == "decrypt" and cfg.on_error == "dlq"
        err_sources: list[tuple[str, str]] = []  # (field path, tmp col)

        for pstr, cp in self._paths:
            if not path_exists(df, cp):
                continue  # missing optional target -> skip (Transform.java:99-101)
            cur = select_column(cp)
            if cfg.backend == "jvm" and not cp.is_array:
                from cdcrypt.functions.crypto_jvm import (
                    discover_wrapped_deks,
                    jvm_decrypt_col,
                    jvm_encrypt_col,
                )

                if cfg.mode == "encrypt":
                    new, wrapped = jvm_encrypt_col(
                        cur, cfg.key_id, cfg.kms, aad_field=cfg.aad_field,
                        encoding=cfg.encoding, context=cfg.context, gate=gate,
                    )
                    self.last_wrapped_deks.append(wrapped)
                else:
                    from pyspark.sql.types import BinaryType

                    env_enc = ("binary" if isinstance(
                        df.select(cur).schema[0].dataType, BinaryType)
                        else "string")
                    wd = cfg.wrapped_deks or discover_wrapped_deks(
                        df, cur, cfg.key_id, encoding=env_enc)
                    new = jvm_decrypt_col(
                        cur, cfg.key_id, cfg.kms, wd,
                        aad_field=cfg.aad_field, encoding=env_enc,
                        output=cfg.encoding, context=cfg.context, gate=gate,
                    )
                df = rewrite(df, cp, new)
                continue
            if cp.vector_crypto:
                if cfg.shreddable:
                    raise ConfigError(
                        "shreddable does not support array paths (array "
                        "UDFs carry no per-row aad identity)")
                if dlq:
                    raise ConfigError(
                        "on_error='dlq' does not support array paths (an "
                        "array cell has no single per-row error slot)")
                # terminal [*]/[n] pass the raw array (UDF applies the
                # index); [*].field and nested-array shapes pass the
                # extracted leaf array, so the UDF sees index=None and
                # encrypts every leaf
                idx = (cp.array_index
                       if not cp.suffix and not cp.has_inner else None)
                # [*]...[*]: nested array<array> cells, flattened into one
                # crypto batch inside the UDF (span-exact regroup)
                nested = cp.array_wildcard and cp.inner_wildcard
                if cfg.mode == "encrypt":
                    udf = make_encrypt_array_udf(
                        cfg.key_id, kms=cfg.kms, context=cfg.context,
                        index=idx, use_gate=use_gate, nested=nested,
                    )
                else:
                    udf = make_decrypt_array_udf(
                        kms=cfg.kms, context=cfg.context,
                        index=idx, use_gate=use_gate, nested=nested,
                    )
                new = udf(cur, gate) if use_gate else udf(cur)
            else:
                if cfg.mode == "encrypt":
                    udf = make_encrypt_udf(
                        cfg.key_id, encoding=cfg.encoding, kms=cfg.kms,
                        context=cfg.context, use_aad=use_aad, use_gate=use_gate,
                        asymmetric=cfg.asymmetric,
                        deterministic=cfg.deterministic,
                        per_aad_context=cfg.shreddable,
                    )
                elif dlq:
                    udf = make_decrypt_tolerant_udf(
                        output=cfg.encoding,
                        kms=cfg.kms, context=cfg.context, use_aad=use_aad,
                        use_gate=use_gate,
                        expect_key_id=cfg.key_id if cfg.verify_key_id else None,
                    )
                else:
                    udf = make_decrypt_udf(
                        output=cfg.encoding,
                        kms=cfg.kms, context=cfg.context, use_aad=use_aad,
                        use_gate=use_gate,
                        expect_key_id=cfg.key_id if cfg.verify_key_id else None,
                        per_aad_context=cfg.shreddable,
                        revoked_to_null=cfg.revoked_to_null,
                    )
                args = [cur]
                if use_aad:
                    args.append(F.col(cfg.aad_field))
                if use_gate:
                    args.append(gate)
                new = udf(*args)
                if dlq:
                    # struct lands in a temp column so value and error are
                    # both projected from ONE UDF evaluation
                    tmp = f"_cdcrypt_tol_{len(err_sources)}"
                    df = df.withColumn(tmp, new)
                    err_sources.append((pstr, tmp))
                    new = F.col(tmp)["value"]
            df = rewrite(df, cp, new)
        if dlq:
            entries = [
                F.struct(F.lit(p).alias("field"),
                         F.col(t)["error"].alias("error"))
                for p, t in err_sources
            ]
            errs = (
                F.filter(F.array(*entries),
                         lambda x: x["error"].isNotNull())
                if entries
                else F.lit([]).cast(
                    "array<struct<field:string,error:string>>")
            )
            df = df.withColumn(ERROR_COL, errs)
            if err_sources:
                df = df.drop(*[t for _, t in err_sources])
        return df


def split_dlq(
    df: DataFrame, *, drop_error_col: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Split a tolerant-decrypt result into (clean, dead_letter).

    ``clean`` holds rows where every field decrypted (``ERROR_COL`` empty;
    dropped unless ``drop_error_col=False``); ``dead_letter`` holds the
    quarantined rows WITH their per-field error entries — the payload the
    Connect runtime would ship to the DLQ topic, here a DataFrame the
    caller appends to a quarantine table.

    Both halves are filters over one input plan: inside ``foreachBatch``
    (the intended use) the micro-batch source feeds both sinks from one
    scan; for an expensive ad-hoc plan, ``df.persist()`` first so the
    decrypt UDF runs once, not twice.
    """
    has = F.size(F.col(ERROR_COL)) > 0
    clean = df.where(~has)
    if drop_error_col:
        clean = clean.drop(ERROR_COL)
    return clean, df.where(has)


def encrypt_fields(df: DataFrame, fields: list[str], **kw) -> DataFrame:
    """Convenience: one-shot encrypt transform."""
    return FieldTransform(TransformConfig(mode="encrypt", fields=fields, **kw)).apply(df)


def decrypt_fields(df: DataFrame, fields: list[str], **kw) -> DataFrame:
    """Convenience: one-shot decrypt transform."""
    return FieldTransform(TransformConfig(mode="decrypt", fields=fields, **kw)).apply(df)


def rewrap_fields(
    df: DataFrame,
    fields: list[str],
    new_key_id: str,
    *,
    kms: MockKMS | None = None,
    encoding: str = "string",
    context: dict[str, str] | None = None,
    new_context: dict[str, str] | None = None,
    expect_key_id: str | None = None,
    condition_field: str | None = None,
    condition_equals: str | None = None,
) -> DataFrame:
    """KEY ROTATION rewrap (C12): re-wrap each envelope's data key under
    ``new_key_id`` without decrypting the payload — the master-key
    rotation model of the AWS Encryption SDK, where data re-encryption
    is explicitly not required (envelope.rewrap_batch). Same field-path
    compiler, condition gate, and null/missing passthrough as the crypto
    transform; decrypt afterwards with ``key_id=new_key_id`` (or
    ``verify_key_id=False`` while a rotation is mid-flight). Scalar
    paths only — array-element rotation would rewrap per element and is
    better done as a full re-encrypt."""
    from cdcrypt.functions.crypto_udfs import make_rewrap_udf

    if (condition_field is None) != (condition_equals is None):
        raise ConfigError(
            "condition.field and condition.equals must be set together")
    use_gate = condition_field is not None
    gate = (compile_condition(df, condition_field, condition_equals)
            if use_gate else None)
    udf = make_rewrap_udf(
        new_key_id, encoding=encoding, kms=kms or MockKMS(),
        context=context, new_context=new_context,
        expect_key_id=expect_key_id, use_gate=use_gate)
    for p in fields:
        cp = compile_path(p)
        if cp.is_array:
            raise ConfigError(
                f"rewrap does not support array paths ({p!r}); "
                "re-encrypt instead")
        if not path_exists(df, cp):
            continue  # missing optional target -> skip
        cur = select_column(cp)
        df = rewrite(df, cp, udf(cur, gate) if use_gate else udf(cur))
    return df
