"""Schemaless (JSON-string) payload mode — the reference's Map dispatch.

The reference SMT dispatches per record on whether a Connect schema is
attached: Struct path vs ``Map<String,Object>`` path
(``Transform.java:62-69``; schemaless fixture ``TransformTest.java:62-72``).
Spark DataFrames are always schema'd, so the engine's equivalent is a
*column-level* dispatch: a payload that arrives as a JSON string column is
promoted to typed columns with ``from_json`` (the caller supplies the
payload schema, as Connect's JSON converter does via its envelope), the SAME
FieldTransform runs over the promoted columns, and the payload is re-packed
with ``to_json`` — one Catalyst projection chain, fused into the same stage
as the crypto UDF; the JSON parse/serialize never touches Python.

Null payload rows pass through as null output (O2,
``Transform.java:57-60``). MALFORMED JSON is a converter-level data error
— the analogue of Connect's JSON converter raising a DataException BEFORE
the SMT runs. Two tolerances, mirroring Connect's ``errors.tolerance``:

- ``on_parse_error='fail'`` (default): ``from_json`` FAILFAST — one poison
  payload fails the job, exactly Connect's ``errors.tolerance=none``.
  PERMISSIVE-without-quarantine would silently fabricate an all-null
  payload in place of the corrupt bytes, which is the wrong failure mode
  for a byte-faithful pipeline, so plain PERMISSIVE is never used.
- ``on_parse_error='dlq'``: Connect's ``errors.tolerance=all`` + DLQ at
  the converter stage. Corrupt payloads pass through BYTE-UNCHANGED (never
  a fabricated repack) and gain an entry in the same
  ``array<struct<field,error>>`` errors column the tolerant decrypt uses
  (``transform.ERROR_COL``), so :func:`~cdcrypt.operators.transform.split_dlq`
  routes converter errors and crypto errors to the dead-letter sink
  uniformly. Detection is ``columnNameOfCorruptRecord`` fused into the
  same ``from_json`` call — no second parse, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from cdcrypt.operators.transform import (
    ERROR_COL,
    ConfigError,
    FieldTransform,
    TransformConfig,
)

_PAYLOAD = "__cdcrypt_payload"
_WAS_NULL = "__cdcrypt_payload_null"
_ORIG = "__cdcrypt_payload_orig"
_CORRUPT = "__cdcrypt_corrupt"
_BAD = "__cdcrypt_payload_bad"
_ERR_TYPE = "array<struct<field:string,error:string>>"


def infer_payload_schema(df: DataFrame, json_col: str,
                         sample: int = 1000,
                         tolerant: bool = False) -> StructType:
    """Runtime payload-type discovery — the reference's Map mode discovers
    value types at runtime (``Transform.java:64-65``); this closes the gap
    for JSON payloads arriving with no declared schema.

    Samples up to ``sample`` non-null payload strings (a BOUNDED driver
    collect, same contract as the IVF quantizer's training sample) and
    lets Spark's own JSON inference unify their types. The inferred
    schema is compiled once driver-side and then drives the same
    vectorized ``from_json`` path as a caller-supplied schema — inference
    cost is one small job at plan time, never per record.

    Malformed JSON in the sample surfaces as ``ConfigError`` (FAILFAST
    philosophy: fabricating an all-null payload for corrupt bytes is the
    wrong failure mode for a byte-faithful pipeline). With
    ``tolerant=True`` (the ``on_parse_error='dlq'`` path) corrupt sample
    records are instead EXCLUDED from inference — they only ever reach the
    dead-letter route, so they must not shape the schema — and the error
    is raised only if no parseable record exists to infer from."""
    spark = df.sparkSession
    rows = (df.select(F.col(json_col).cast("string").alias("j"))
            .where(F.col("j").isNotNull())
            .limit(sample).collect())
    if not rows:
        raise ConfigError(
            f"cannot infer payload schema: no non-null {json_col!r} "
            "values in the sample")
    inferred = spark.read.json(
        spark.sparkContext.parallelize([r[0] for r in rows]))
    fields = [f for f in inferred.schema.fields
              if f.name != "_corrupt_record"]
    if len(fields) != len(inferred.schema.fields):
        if not tolerant:
            raise ConfigError(
                "malformed JSON in schema-inference sample (corrupt records "
                "present); fix the payload or supply an explicit schema")
        if not fields:
            raise ConfigError(
                "cannot infer payload schema: every sampled payload is "
                "malformed JSON; supply an explicit schema")
    return StructType(fields)


def transform_json_payload(
    df: DataFrame,
    json_col: str,
    schema: StructType | str | None,
    transform: FieldTransform,
    infer_sample: int = 1000,
    strict_fields: bool | None = None,
    on_parse_error: str = "fail",
) -> DataFrame:
    """Parse ``json_col`` with ``schema``, apply ``transform`` to the
    promoted payload fields, re-serialize into ``json_col``.

    ``schema=None`` discovers it from the data at plan time
    (:func:`infer_payload_schema`) — the schemaless-Map analogue.

    ``strict_fields`` guards against silent field loss: the repack
    serializes only the schema's fields, so a payload key the schema
    doesn't know (e.g. one that first appears AFTER the inference sample)
    would vanish from the output. When strict, any such key raises at
    execution (JVM-side ``json_object_keys`` check fused into the repack
    projection — no extra pass). Defaults to True when the schema was
    inferred (the sample cannot promise coverage) and False when the
    caller declared it (an explicit schema is a projection contract,
    matching the reference's declared-schema Struct mode). Top-level keys
    only — nested drift is bounded by from_json's FAILFAST parse.

    The payload field names become top-level columns while the transform
    runs (field paths in the transform config address them as ``$.name``,
    exactly like the schema'd path), so they must not collide with the
    frame's other columns — a collision raises ``ConfigError`` rather than
    silently shadowing.

    ``on_parse_error='dlq'`` (Connect ``errors.tolerance=all`` at the
    converter stage, module docstring): a payload ``from_json`` cannot
    fully parse — malformed bytes OR a type mismatch against the schema —
    passes through byte-unchanged, skips the transform, and gains a
    ``(field=json_col, error=...)`` entry in ``ERROR_COL``; route with
    :func:`~cdcrypt.operators.transform.split_dlq`. Composes with a
    tolerant inner decrypt (``on_error='dlq'``): converter entries and
    crypto entries land in the ONE errors array."""
    if on_parse_error not in ("fail", "dlq"):
        raise ConfigError(
            f"on_parse_error={on_parse_error!r} must be one of "
            "('fail', 'dlq')")
    tolerant = on_parse_error == "dlq"
    if strict_fields is None:
        strict_fields = schema is None
    if schema is None:
        schema = infer_payload_schema(df, json_col, infer_sample,
                                      tolerant=tolerant)
    payload_schema = (
        schema if isinstance(schema, StructType)
        else StructType.fromDDL(schema)
    )
    payload_fields = [f.name for f in payload_schema.fields]
    others = [c for c in df.columns if c != json_col]
    collisions = set(payload_fields) & set(others)
    if collisions:
        raise ConfigError(
            f"payload fields {sorted(collisions)} collide with frame columns")
    if tolerant and _CORRUPT in payload_fields:
        raise ConfigError(
            f"payload field {_CORRUPT!r} collides with the reserved "
            "corrupt-record slot")

    if tolerant:
        # corrupt-record capture rides the SAME parse: PERMISSIVE fills
        # the reserved slot with the raw bytes on any malformed/mistyped
        # payload (empirically: type mismatch also sets it, with the
        # well-typed fields still parsed — those rows are quarantined
        # whole, never half-transformed)
        parse_schema = StructType(
            list(payload_schema.fields)
            + [StructField(_CORRUPT, StringType())])
        opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT}
    else:
        parse_schema = payload_schema
        opts = {"mode": "FAILFAST"}
    parsed = df.withColumn(
        _PAYLOAD, F.from_json(F.col(json_col), parse_schema, opts))
    keep_orig = strict_fields or tolerant
    unknown_keys = F.array_except(
        F.json_object_keys(F.col(json_col)),
        F.array(*[F.lit(f) for f in payload_fields]))
    bad = (F.col(_PAYLOAD).getField(_CORRUPT).isNotNull()
           if tolerant else F.lit(False))
    if tolerant and strict_fields:
        # a payload key the schema doesn't cover is a CONVERTER error in
        # tolerant mode, not a job-killer: repacking would silently drop
        # the key, so the row quarantines byte-unchanged like any other
        # poison record (json_object_keys is null on malformed bytes —
        # those rows are already bad via the corrupt slot)
        bad = bad | F.coalesce(F.size(unknown_keys) > 0, F.lit(False))
    flat = parsed.select(
        *others,
        F.col(_PAYLOAD).isNull().alias(_WAS_NULL),
        *([F.col(json_col).alias(_ORIG)] if keep_orig else []),
        *([bad.alias(_BAD)] if tolerant else []),
        # quarantined rows enter the transform all-null (pure O2
        # passthrough): a half-parsed field must not feed a strict
        # decrypt — its garbage would fail the job the tolerance exists
        # to survive — and the repack for those rows is _ORIG anyway
        *[F.when(~bad, F.col(_PAYLOAD).getField(f)).alias(f)
          for f in payload_fields],
    )
    out = transform.apply(flat)
    repack_val = (
        # keep null fields in the output object so the round trip is
        # shape-faithful (to_json drops them by default)
        F.to_json(F.struct(*payload_fields), {"ignoreNullFields": "false"}))
    if strict_fields:
        unknown = F.array_except(
            F.json_object_keys(F.col(_ORIG)),
            F.array(*[F.lit(f) for f in payload_fields]))
        repack_val = F.when(
            F.size(unknown) > 0,
            F.raise_error(F.concat(
                F.lit("schemaless payload key(s) absent from the schema "
                      "would be silently dropped on repack: "),
                F.to_json(unknown),
                F.lit(" — widen infer_sample, supply an explicit schema, "
                      "or pass strict_fields=False"))),
        ).otherwise(repack_val)
    repack = F.when(F.col(_WAS_NULL), F.lit(None).cast("string"))
    if tolerant:
        # quarantined BEFORE the strict-keys check: json_object_keys is
        # null on malformed bytes, and a corrupt payload must leave
        # byte-for-byte, not raise or repack
        repack = repack.when(F.col(_BAD), F.col(_ORIG))
    repacked = out.withColumn(json_col, repack.otherwise(repack_val))
    extra: list[str] = []
    if tolerant:
        orig_keys = F.json_object_keys(F.col(_ORIG))
        orig_unknown = F.array_except(
            orig_keys, F.array(*[F.lit(f) for f in payload_fields]))
        msg = (
            # cause triage from the original bytes: unparseable (keys
            # null) / schema-uncovered key (strict only) / type mismatch
            F.when(orig_keys.isNull(), F.concat(
                F.lit("parse: malformed JSON bytes: "),
                F.substring(F.col(_ORIG), 1, 128)))
            .when(F.lit(strict_fields) & (F.size(orig_unknown) > 0),
                  F.concat(
                      F.lit("parse: payload key(s) absent from the "
                            "schema: "), F.to_json(orig_unknown)))
            .otherwise(F.concat(
                F.lit("parse: payload rejected by converter "
                      "(type mismatch): "),
                F.substring(F.col(_ORIG), 1, 128))))
        parse_err = F.when(
            F.col(_BAD) & ~F.col(_WAS_NULL),
            F.array(F.struct(
                F.lit(json_col).alias("field"), msg.alias("error"))),
        ).otherwise(F.lit([]).cast(_ERR_TYPE))
        if ERROR_COL in out.columns:
            # prior entries accumulate: an inner tolerant decrypt's crypto
            # entries, or an upstream pass's ERROR_COL riding the frame.
            # A quarantined row's fields parsed null -> null passthrough,
            # so the halves never double-report one row's real error
            parse_err = F.concat(F.col(ERROR_COL), parse_err)
        repacked = repacked.withColumn(ERROR_COL, parse_err)
        extra = [ERROR_COL]
    elif ERROR_COL in out.columns:
        extra = [ERROR_COL]
    # withColumn REPLACES an ERROR_COL the frame already had
    extra = [c for c in extra if c not in df.columns]
    return repacked.select(*df.columns, *extra)


def encrypt_json_payload(df: DataFrame, json_col: str,
                         schema: StructType | str | None, fields: list[str],
                         on_parse_error: str = "fail",
                         infer_sample: int = 1000, **kw) -> DataFrame:
    """One-shot schemaless encrypt (``fields`` address the payload;
    ``schema=None`` infers it from the data)."""
    return transform_json_payload(
        df, json_col, schema,
        FieldTransform(TransformConfig(mode="encrypt", fields=fields, **kw)),
        on_parse_error=on_parse_error, infer_sample=infer_sample)


def decrypt_json_payload(df: DataFrame, json_col: str,
                         schema: StructType | str | None, fields: list[str],
                         on_parse_error: str = "fail",
                         infer_sample: int = 1000, **kw) -> DataFrame:
    """One-shot schemaless decrypt (``schema=None`` infers)."""
    return transform_json_payload(
        df, json_col, schema,
        FieldTransform(TransformConfig(mode="decrypt", fields=fields, **kw)),
        on_parse_error=on_parse_error, infer_sample=infer_sample)
