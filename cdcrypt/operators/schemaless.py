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
``Transform.java:57-60``); MALFORMED JSON is a data error that fails the
job (``from_json`` in FAILFAST mode) — the analogue of Connect's converter
rejecting the record with a DataException before the SMT runs (O10 fatal
routing). PERMISSIVE mode would silently fabricate an all-null payload in
place of the corrupt bytes, which is exactly the wrong failure mode for a
pipeline whose sink must match a reference byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from cdcrypt.operators.transform import (
    ConfigError,
    FieldTransform,
    TransformConfig,
)

_PAYLOAD = "__cdcrypt_payload"
_WAS_NULL = "__cdcrypt_payload_null"
_ORIG = "__cdcrypt_payload_orig"


def infer_payload_schema(df: DataFrame, json_col: str,
                         sample: int = 1000) -> StructType:
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
    wrong failure mode for a byte-faithful pipeline)."""
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
    bad = [f.name for f in inferred.schema.fields
           if f.name == "_corrupt_record"]
    if bad:
        raise ConfigError(
            "malformed JSON in schema-inference sample (corrupt records "
            "present); fix the payload or supply an explicit schema")
    return inferred.schema


def transform_json_payload(
    df: DataFrame,
    json_col: str,
    schema: StructType | str | None,
    transform: FieldTransform,
    infer_sample: int = 1000,
    strict_fields: bool | None = None,
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
    silently shadowing."""
    if strict_fields is None:
        strict_fields = schema is None
    if schema is None:
        schema = infer_payload_schema(df, json_col, infer_sample)
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

    parsed = df.withColumn(
        _PAYLOAD,
        F.from_json(F.col(json_col), payload_schema, {"mode": "FAILFAST"}))
    flat = parsed.select(
        *others,
        F.col(_PAYLOAD).isNull().alias(_WAS_NULL),
        *([F.col(json_col).alias(_ORIG)] if strict_fields else []),
        F.col(f"{_PAYLOAD}.*"),
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
    repacked = out.withColumn(
        json_col,
        F.when(F.col(_WAS_NULL), F.lit(None).cast("string"))
        .otherwise(repack_val),
    )
    return repacked.select(*df.columns)


def encrypt_json_payload(df: DataFrame, json_col: str,
                         schema: StructType | str | None, fields: list[str],
                         **kw) -> DataFrame:
    """One-shot schemaless encrypt (``fields`` address the payload;
    ``schema=None`` infers it from the data)."""
    return transform_json_payload(
        df, json_col, schema,
        FieldTransform(TransformConfig(mode="encrypt", fields=fields, **kw)))


def decrypt_json_payload(df: DataFrame, json_col: str,
                         schema: StructType | str | None, fields: list[str],
                         **kw) -> DataFrame:
    """One-shot schemaless decrypt (``schema=None`` infers)."""
    return transform_json_payload(
        df, json_col, schema,
        FieldTransform(TransformConfig(mode="decrypt", fields=fields, **kw)))
