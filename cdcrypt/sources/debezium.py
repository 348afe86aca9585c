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
    source = StructType([StructField("lsn", LongType(), True),
                         StructField("table", StringType(), True)])
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
           tolerant: bool,
           with_table: bool = False) -> tuple[DataFrame, DataFrame | None]:
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
        *([env.getField("source").getField("table").alias("table")]
          if with_table else []),
    )
    cols = [F.col("_img").getField(f.name).alias(f.name)
            for f in row_schema.fields]
    ts_col = ([] if "ts" in row_schema.fieldNames()
              else [F.col("_dbz_ts").alias("ts")])
    events = (classified
              .where(~F.col("_tomb") & F.col("_err").isNull())
              .select("op", "op_seq",
                      *(["table"] if with_table else []),
                      *cols, *ts_col))
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


def merged_row_schema(row_schemas: dict[str, StructType]) -> StructType:
    """Union of every routed table's row schema, for the ONE-parse
    multi-table read. A column name shared by two tables must carry the
    same type (one from_json read schema per scan); conflicting shapes
    need separate topics/parses, same constraint Connect's single-converter
    -per-topic model imposes."""
    fields: dict[str, object] = {}
    owner: dict[str, str] = {}
    for tname, sch in row_schemas.items():
        for f in sch.fields:
            if f.name in fields and fields[f.name] != f.dataType:
                raise ValueError(
                    f"column {f.name!r} has conflicting types across "
                    f"routed tables {owner[f.name]!r} ({fields[f.name]}) "
                    f"and {tname!r} ({f.dataType}); parse those topics "
                    "separately")
            fields.setdefault(f.name, f.dataType)
            owner.setdefault(f.name, tname)
    return StructType([StructField(n, t, True)
                       for n, t in fields.items()])


def parse_debezium_multi(
    df: DataFrame,
    json_col: str,
    row_schemas: dict[str, StructType],
) -> DataFrame:
    """Multi-table Debezium stream -> routed change events, ONE parse.

    A Debezium connector emits every captured table's envelopes, each
    naming its origin in ``source.table``; this parses the whole stream
    once against the merged row schema (columns owned by other tables
    null-fill) and emits a ``table`` routing column for
    ``operators/multitable.apply_multi``. Strict error semantics
    (malformed line fails the job, :func:`parse_debezium`); unknown or
    missing ``source.table`` values are NOT an error here — routing
    policy (fail vs DLQ) belongs to the fan-out operator."""
    events, _ = _parse(df, json_col, merged_row_schema(row_schemas),
                       tolerant=False, with_table=True)
    return events


# ---------------------------------------------------------------------------
# sink side: engine changes -> Debezium envelopes (CDC-out)
# ---------------------------------------------------------------------------

# to_json's DEFAULT timestamp format truncates to milliseconds — image
# columns would silently lose microsecond precision over the wire (the
# events fixture carries us timestamps). These formats round-trip exactly
# through from_json's lenient default parser. TIMESTAMP_NTZ columns (what
# Spark infers from parquet us-timestamps without tz metadata) are
# governed by the SEPARATE timestampNTZFormat option — without it they
# truncate even when timestampFormat is set.
DBZ_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
DBZ_TS_NTZ_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
_EMIT_OPTS = {"timestampFormat": DBZ_TS_FMT,
              "timestampNTZFormat": DBZ_TS_NTZ_FMT}


def _emit_value(before: Column, after: Column, op: Column, ts_ms: Column,
                lsn: Column, source_name: str, wrap: bool) -> Column:
    env = F.struct(
        before.alias("before"),
        after.alias("after"),
        op.alias("op"),
        ts_ms.alias("ts_ms"),
        F.struct(F.lit(source_name).alias("name"),
                 lsn.alias("lsn")).alias("source"),
    )
    if wrap:
        env = F.struct(env.alias("payload"))
    return F.to_json(env, _EMIT_OPTS)


def emit_debezium(
    events: DataFrame,
    row_cols: list[str] | None = None,
    *,
    key_cols: list[str] | None = None,
    op_col: str = "op",
    seq_col: str = "op_seq",
    ts_col: str = "ts",
    source_name: str = "cdcrypt",
    wrap_payload: bool = True,
    emit_tombstones: bool = False,
) -> DataFrame:
    """Engine change events -> Debezium envelope JSON lines (the exact
    inverse of :func:`parse_debezium`): the CDC-out role, so a lake
    table's change stream can feed ANOTHER Debezium-speaking consumer.

    ``events`` carries the engine contract: ``op_col`` in I/U/D,
    ``seq_col`` (LWW order, becomes ``source.lsn``), plus the row columns
    (``row_cols``, default = everything except op/seq; ``ts_col`` stays
    INSIDE the image when present and additionally populates the
    envelope's ``ts_ms``). Mapping mirrors the parser: I -> ``c``,
    U -> ``u`` (after-image only — the engine contract carries no before
    image; REPLICA IDENTITY DEFAULT shape; use
    :func:`changelog_to_debezium` for true before/after envelopes),
    D -> ``d`` (before-image). Any other op value fails the job at
    execution with the offending value (DataException contract, same as
    the parse side).

    Output: one ``value`` JSON line per event; with ``key_cols``, also a
    ``key`` JSON column (the Connect message key — Debezium partitions
    topics by it, so a downstream Kafka producer keeps per-key order).
    ``emit_tombstones`` (requires ``key_cols``) appends a null-value
    (key, NULL) row AFTER each delete — the log-compaction marker
    Debezium emits so compacted topics drop the key; :func:`parse_debezium`
    drops them on the way back in.

    Everything is one pure-Column ``to_json`` projection — no UDF, no
    shuffle; Catalyst fuses it into the upstream scan, and timestamps are
    written at microsecond precision (``DBZ_TS_FMT``) so a
    parse(emit(x)) round trip is lossless.
    """
    if row_cols is None:
        row_cols = [c for c in events.columns if c not in (op_col, seq_col)]
    opc = F.col(op_col)
    bad = opc.isNull() | ~opc.isin("I", "U", "D")
    dbz_op = (
        F.when(bad, F.raise_error(F.concat(
            F.lit("emit: unknown engine op "),
            F.coalesce(opc, F.lit("<null>")))))
        .when(opc == "I", F.lit("c"))
        .when(opc == "U", F.lit("u"))
        .otherwise(F.lit("d")))
    image = F.struct(*[F.col(c).alias(c) for c in row_cols])
    before = F.when(opc == "D", image)
    after = F.when(opc != "D", image)
    ts_ms = (F.unix_millis(F.col(ts_col).cast("timestamp"))
             if ts_col in events.columns else F.lit(None).cast("long"))
    value = _emit_value(before, after, dbz_op, ts_ms,
                        F.col(seq_col).cast("long"), source_name,
                        wrap_payload)
    if key_cols is None:
        if emit_tombstones:
            raise ValueError("emit_tombstones requires key_cols (a "
                             "tombstone is a keyed null value)")
        return events.select(value.alias("value"))
    key = F.to_json(F.struct(*[F.col(c).alias(c) for c in key_cols]))
    out = events.select(key.alias("key"), value.alias("value"))
    if emit_tombstones:
        tomb = events.where(opc == "D").select(
            key.alias("key"), F.lit(None).cast("string").alias("value"))
        out = out.unionByName(tomb)
    return out


def changelog_to_debezium(
    changelog: DataFrame,
    *,
    key_cols: list[str],
    seq_col: str = "op_seq",
    ts_col: str = "ts",
    source_name: str = "cdcrypt",
    wrap_payload: bool = True,
    emit_tombstones: bool = False,
) -> DataFrame:
    """``LakeTable.read_changelog`` output -> Debezium envelopes with TRUE
    before/after images (the resolved per-key diff carries both sides,
    unlike the raw event stream): insert -> ``c`` (after only),
    update -> ``u`` (both images), delete -> ``d`` (before only).

    Image rows are the FULL row (key columns + the changelog's payload
    struct fields), matching what a Debezium source with REPLICA IDENTITY
    FULL publishes. ``source.lsn`` is the image row's ``seq_col`` (after
    side wins — it is the change's own LWW position; the before side
    serves deletes), ``ts_ms`` likewise from ``ts_col``; either is null
    when the payload lacks the column (parse falls back per its contract).
    Output is always keyed (``key``/``value``) — the changelog IS per-key.
    One pure-Column projection, no UDF, no shuffle.
    """
    payload_fields = changelog.schema["before"].dataType.fieldNames()

    def full(side: str) -> Column:
        img = F.struct(
            *[F.col(k).alias(k) for k in key_cols],
            *[F.col(side).getField(f).alias(f) for f in payload_fields])
        return F.when(F.col(side).isNotNull(), img)

    before, after = full("before"), full("after")
    opc = F.col("change_op")
    dbz_op = (
        F.when(opc == "insert", F.lit("c"))
        .when(opc == "update", F.lit("u"))
        .when(opc == "delete", F.lit("d"))
        .otherwise(F.raise_error(F.concat(
            F.lit("changelog: unknown change_op "),
            F.coalesce(opc, F.lit("<null>"))))))

    def payload_of(name: str, cast: str) -> Column:
        if name not in payload_fields:
            return F.lit(None).cast(cast)
        return F.coalesce(F.col("after").getField(name),
                          F.col("before").getField(name)).cast(cast)

    ts_ms = (F.unix_millis(payload_of(ts_col, "timestamp"))
             if ts_col in payload_fields else F.lit(None).cast("long"))
    value = _emit_value(before, after, dbz_op, ts_ms,
                        payload_of(seq_col, "long"), source_name,
                        wrap_payload)
    key = F.to_json(F.struct(*[F.col(c).alias(c) for c in key_cols]))
    out = changelog.select(key.alias("key"), value.alias("value"))
    if emit_tombstones:
        tomb = changelog.where(opc == "delete").select(
            key.alias("key"), F.lit(None).cast("string").alias("value"))
        out = out.unionByName(tomb)
    return out
