"""Debezium change-event envelope adapter (SURVEY.md P1 breadth).

The reference SMT's canonical deployment is downstream of Debezium CDC
(`/root/reference/README.md:20` links the debezium-encrypt-example demo) —
records reaching the transform are Debezium envelopes. This adapter maps
that envelope onto the engine's change-event contract so a Debezium topic
dump (JSON lines) replays through :class:`~cdcrypt.streaming.pipeline.
IngestPipeline` unchanged.

Envelope (JsonConverter, per Debezium's documented event shape)::

    {"payload": {"before": {...}|null, "after": {...}|null,
                 "op": "c"|"u"|"d"|"r", "ts_ms": 1700000000123,
                 "source": {"lsn": 123456, ...}}}

With ``schemas.enable=false`` the same object arrives un-nested (no
``payload`` wrapper); both shapes are accepted (the flat fields are read
when ``payload`` is absent).

Mapping:

- ``op``: ``c``/``r`` -> ``I`` (``r`` = snapshot read), ``u`` -> ``U``,
  ``d`` -> ``D``; anything else raises at execution (malformed feed —
  fail loud, mirroring the reference's DataException contract,
  ``Transform.java:127-130``).
- row image: ``after`` for I/U, ``before`` for D. A delete without a
  ``before`` image (source table without REPLICA IDENTITY FULL) raises:
  the engine's MERGE needs the key columns, and silently dropping the
  delete would corrupt the table.
- ``op_seq``: ``source.lsn`` (the WAL position — the authoritative LWW
  order), falling back to ``ts_ms`` for connectors that carry no LSN.
- ``ts``: ``ts_ms`` as a timestamp.
- Kafka tombstones (null/empty line or an envelope with neither image nor
  op) are dropped — they are deletion *markers for log compaction*, not
  change events; Debezium emits the real delete separately.

Everything is pure Column expressions over one ``from_json`` — no UDF, so
Catalyst fuses the parse into the ingest scan stage and the 100 TB cost is
one vectorized JSON parse per line.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType


def debezium_envelope_schema(row_schema: StructType) -> StructType:
    """The from_json read schema: nested payload plus the same fields flat
    (schemas.enable=false), so one parse handles both wire shapes."""
    source = StructType([StructField("lsn", LongType(), True)])
    inner = [
        StructField("before", row_schema, True),
        StructField("after", row_schema, True),
        StructField("op", StringType(), True),
        StructField("ts_ms", LongType(), True),
        StructField("source", source, True),
    ]
    return StructType([StructField("payload", StructType(inner), True)]
                      + inner)


def _envelope(parsed: Column) -> Column:
    """payload when wrapped, else the flat fields re-packed (same type)."""
    flat = F.struct(
        parsed.getField("before").alias("before"),
        parsed.getField("after").alias("after"),
        parsed.getField("op").alias("op"),
        parsed.getField("ts_ms").alias("ts_ms"),
        parsed.getField("source").alias("source"),
    )
    return F.when(parsed.getField("payload").isNotNull(),
                  parsed.getField("payload")).otherwise(flat)


def parse_debezium(
    df: DataFrame,
    json_col: str,
    row_schema: StructType,
) -> DataFrame:
    """Debezium JSON lines -> engine change events.

    ``df[json_col]`` holds one envelope per row (e.g. ``spark.read.text``
    over a topic dump). Output: the ``row_schema`` columns of the row
    image, plus ``op`` (I/U/D), ``op_seq`` (lsn, ts_ms fallback) and
    ``ts`` — exactly the contract ``IngestPipeline`` resolves and merges
    (the caller/pipeline supplies ``epoch``)."""
    env = _envelope(F.from_json(F.col(json_col),
                                debezium_envelope_schema(row_schema)))
    op_raw = env.getField("op")
    op = (
        F.when(op_raw.isin("c", "r"), F.lit("I"))
        .when(op_raw == "u", F.lit("U"))
        .when(op_raw == "d", F.lit("D"))
        .otherwise(F.raise_error(F.concat(
            F.lit("malformed debezium envelope: unknown op "),
            F.coalesce(op_raw, F.lit("<null>")))))
    )
    # each op branch validates its own image: when() short-circuits per
    # branch, so the raise must live INSIDE the branch that needs the image
    # (a top-level otherwise never fires for a matched op with a null image)
    no_image = F.raise_error(F.lit(
        "malformed debezium envelope: delete without before-image "
        "(REPLICA IDENTITY FULL required) or c/u/r without after"))
    image = F.when(
        op_raw == "d",
        F.when(env.getField("before").isNotNull(),
               env.getField("before")).otherwise(no_image),
    ).otherwise(
        F.when(env.getField("after").isNotNull(),
               env.getField("after")).otherwise(no_image))
    tombstone = (
        F.col(json_col).isNull()
        | (F.length(F.trim(F.col(json_col))) == 0)
        | (op_raw.isNull()
           & env.getField("before").isNull()
           & env.getField("after").isNull())
    )
    out = (
        df.where(~tombstone)
        .select(
            image.alias("_img"),
            op.alias("op"),
            F.coalesce(env.getField("source").getField("lsn"),
                       env.getField("ts_ms")).alias("op_seq"),
            F.timestamp_millis(env.getField("ts_ms")).alias("_dbz_ts"),
        )
    )
    cols = [F.col("_img").getField(f.name).alias(f.name)
            for f in row_schema.fields]
    ts_col = ([] if "ts" in row_schema.fieldNames()
              else [F.col("_dbz_ts").alias("ts")])
    return out.select("op", "op_seq", *cols, *ts_col)
