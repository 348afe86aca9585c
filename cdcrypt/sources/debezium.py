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


_CORRUPT = "__cdcrypt_corrupt"


def _parse(df: DataFrame, json_col: str, row_schema: StructType,
           tolerant: bool) -> tuple[DataFrame, DataFrame | None]:
    """Shared envelope classifier. Strict mode fails loud on any
    malformed line; tolerant mode returns (events, dead_letter)."""
    schema = debezium_envelope_schema(row_schema)
    # the corrupt-record slot rides the one parse either way: WITHOUT it,
    # PERMISSIVE null-fills a malformed line, which is indistinguishable
    # from a field-less tombstone — poison bytes would be DROPPED silently
    # instead of raising (the bug this slot fixes)
    read = StructType(list(schema.fields)
                      + [StructField(_CORRUPT, StringType())])
    blank = (F.col(json_col).isNull()
             | (F.length(F.trim(F.col(json_col))) == 0))
    # blank lines parse as NULL input, never as "": from_json over an
    # empty/whitespace string leaves a null parser state that NPEs in
    # generated code when a struct is rebuilt from the result's fields
    # (_envelope's otherwise-branch), and predicate pushdown can evaluate
    # those expressions even behind a pre-filter. A null input is the
    # same tombstone either way.
    parsed = F.from_json(
        F.when(~blank, F.col(json_col)), read,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT})
    # null/blank-LINE tombstones drop first — they carry no information
    df = df.where(~blank)
    env = _envelope(parsed)
    op_raw = env.getField("op")
    bad_bytes = parsed.getField(_CORRUPT).isNotNull()
    # the remaining tombstone shape: a PARSEABLE envelope with neither
    # image nor op (compaction marker) — never malformed bytes
    tombstone = (
        ~bad_bytes
        & op_raw.isNull()
        & env.getField("before").isNull()
        & env.getField("after").isNull()
    )
    # isNotNull guard: isin(null) is NULL, and ~NULL would skip the
    # unknown-op branch — an envelope carrying an image but no op must
    # classify as unknown, not fall through as a bogus delete
    known = op_raw.isNotNull() & op_raw.isin("c", "r", "u", "d")
    img_missing = F.when(
        op_raw == "d", env.getField("before").isNull()
    ).otherwise(env.getField("after").isNull())
    error = (
        F.when(tombstone, F.lit(None).cast("string"))
        .when(bad_bytes, F.concat(
            F.lit("parse: malformed debezium envelope bytes: "),
            F.substring(F.col(json_col), 1, 128)))
        .when(~known, F.concat(
            F.lit("malformed debezium envelope: unknown op "),
            F.coalesce(op_raw, F.lit("<null>"))))
        .when(img_missing, F.lit(
            "malformed debezium envelope: delete without before-image "
            "(REPLICA IDENTITY FULL required) or c/u/r without after"))
    )
    if not tolerant:
        # fail loud AT THE PARSE, reference DataException contract
        # (Transform.java:127-130): first bad line kills the job with
        # its own message
        error = F.when(error.isNotNull(), F.raise_error(error))
    op = (
        F.when(op_raw.isin("c", "r"), F.lit("I"))
        .when(op_raw == "u", F.lit("U"))
        .otherwise(F.lit("D")))
    image = F.when(op_raw == "d", env.getField("before")) \
             .otherwise(env.getField("after"))
    classified = df.select(
        F.col(json_col),
        error.alias("_err"),
        tombstone.alias("_tomb"),
        image.alias("_img"),
        op.alias("op"),
        F.coalesce(env.getField("source").getField("lsn"),
                   env.getField("ts_ms")).alias("op_seq"),
        F.timestamp_millis(env.getField("ts_ms")).alias("_dbz_ts"),
    )
    cols = [F.col("_img").getField(f.name).alias(f.name)
            for f in row_schema.fields]
    ts_col = ([] if "ts" in row_schema.fieldNames()
              else [F.col("_dbz_ts").alias("ts")])
    events = (classified
              .where(~F.col("_tomb") & F.col("_err").isNull())
              .select("op", "op_seq", *cols, *ts_col))
    if not tolerant:
        return events, None
    dead = (classified.where(F.col("_err").isNotNull())
            .select(F.col(json_col), F.col("_err").alias("error")))
    return events, dead


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
    (the caller/pipeline supplies ``epoch``). Any malformed line —
    unparseable bytes, unknown op, required image missing — fails the job
    with that line's own message (Connect DataException contract); for
    Connect ``errors.tolerance=all`` use :func:`parse_debezium_dlq`."""
    events, _ = _parse(df, json_col, row_schema, tolerant=False)
    return events


def parse_debezium_dlq(
    df: DataFrame,
    json_col: str,
    row_schema: StructType,
) -> tuple[DataFrame, DataFrame]:
    """Tolerant :func:`parse_debezium`: Connect ``errors.tolerance=all``
    + DLQ at the SOURCE stage. Returns ``(events, dead_letter)`` —
    ``events`` is the strict function's output minus poison lines;
    ``dead_letter`` holds each poison line's original bytes plus a typed
    ``error`` (malformed bytes / unknown op / missing image), the payload
    Connect would ship to the DLQ topic. Tombstones are dropped from
    BOTH halves (deletion markers, not errors). Both halves filter ONE
    parse plan — persist upstream if the scan is expensive, same contract
    as ``transform.split_dlq``."""
    events, dead = _parse(df, json_col, row_schema, tolerant=True)
    return events, dead
