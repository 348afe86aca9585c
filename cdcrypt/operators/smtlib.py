"""Kafka Connect built-in SMT standard library, compiled to Column chains.

The reference transform (`Transform.java:56-131`) is ONE link in a Connect
`transforms=` chain — real deployments sandwich it between the stock
`org.apache.kafka.connect.transforms.*` SMTs (ExtractField, Flatten, Cast,
ReplaceField, InsertField, MaskField, TimestampConverter, RegexRouter,
TimestampRouter, Filter, ValueToKey, HoistField). A user switching from the
reference needs the whole chain, so this engine owns the stock set natively.

Record model: a DataFrame row IS the record value (the same convention as
operators/transform.py); routing SMTs act on an explicit topic column
(default ``_topic``, matching sources/changegen's metadata naming), and
key-producing SMTs emit a ``_key`` struct column.

Execution model — the scale story: every stage below is a pure Column
projection (zero UDFs, zero shuffles). Chaining N SMTs produces N narrow
projections that Catalyst collapses into ONE whole-stage-codegen'd map over
the scan, exactly like the reference chain runs N cheap per-record rewrites
inside one poll loop — except here the fused projection also pushes column
pruning through to the parquet reader. ``compile_smt_chain`` is driver-side
and once-per-job (O12/O13 parity: validation errors raise before any
executor work, mirroring ``Config.java`` / ``OneOfValidator.java:10-24``).

Connect semantics sources (public docs/code): each stage docstring names the
upstream class it mirrors; behavior checked against the Connect docs'
examples, e.g. Flatten's delimiter joining and Cast's whole-value vs
per-field spec forms.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from cdcrypt.operators.transform import ConfigError

DEFAULT_TOPIC_COL = "_topic"

# Connect schema type name -> Spark cast target
# (org.apache.kafka.connect.data.Schema.Type)
_CAST_TYPES = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float32": "float",
    "float64": "double",
    "boolean": "boolean",
    "string": "string",
    "bytes": "binary",
}

Stage = Callable[[DataFrame], DataFrame]


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise ConfigError(msg)


def _struct_fields(df: DataFrame, name: str) -> StructType:
    dt = df.schema[name].dataType
    _require(isinstance(dt, StructType),
             f"field {name!r} must be a struct, got {dt.simpleString()}")
    return dt


# ---------------------------------------------------------------------------
# individual SMTs (each returns a Stage closure; validation happens inside
# the stage because Connect validates field existence per-record-schema,
# which for us is per-DataFrame)
# ---------------------------------------------------------------------------

def _extract_field(props: dict) -> Stage:
    """ExtractField$Value: the record value becomes one field of itself.

    A struct field promotes to the new value (its subfields become the
    columns); a scalar field becomes a single-column value. Non-value
    metadata columns (topic/key/headers) ride along untouched.
    """
    fname = props["field"]

    def stage(df: DataFrame) -> DataFrame:
        _require(fname in df.columns, f"ExtractField: no field {fname!r}")
        meta = [c for c in df.columns if c.startswith("_")]
        dt = df.schema[fname].dataType
        if isinstance(dt, StructType):
            return df.select(F.col(fname + ".*"), *meta)
        return df.select(fname, *meta)

    return stage


def _hoist_field(props: dict) -> Stage:
    """HoistField$Value: wrap the entire value in a struct under ``field``."""
    fname = props["field"]

    def stage(df: DataFrame) -> DataFrame:
        meta = [c for c in df.columns if c.startswith("_")]
        value = [c for c in df.columns if not c.startswith("_")]
        _require(bool(value), "HoistField: record value is empty")
        return df.select(F.struct(*value).alias(fname), *meta)

    return stage


def _flatten(props: dict) -> Stage:
    """Flatten$Value: recursively lift nested struct fields to the top level,
    joining path segments with ``delimiter`` (Connect default ``.``).

    Maps/arrays pass through as-is at whatever depth they sit (Connect
    flattens structs only).
    """
    delim = props.get("delimiter", ".")

    def cols_of(prefix: str, col: Column, dt, out: list[Column]) -> None:
        if isinstance(dt, StructType):
            for f in dt.fields:
                cols_of(prefix + delim + f.name if prefix else f.name,
                        col.getField(f.name), f.dataType, out)
        else:
            out.append(col.alias(prefix))

    def stage(df: DataFrame) -> DataFrame:
        out: list[Column] = []
        for f in df.schema.fields:
            if f.name.startswith("_"):
                out.append(F.col(f.name))
            else:
                cols_of(f.name, F.col(f.name), f.dataType, out)
        return df.select(*out)

    return stage


def _replace_field(props: dict) -> Stage:
    """ReplaceField$Value: drop (``exclude``), keep-only (``include``), and
    rename (``renames`` = "old:new,..." pairs), applied in Connect's order:
    include/exclude filter first, then renames."""
    exclude = [s for s in props.get("exclude", "").split(",") if s]
    include = [s for s in props.get("include", "").split(",") if s]
    renames: dict[str, str] = {}
    for pair in (s for s in props.get("renames", "").split(",") if s):
        _require(":" in pair, f"ReplaceField: bad rename {pair!r}")
        old, new = pair.split(":", 1)
        renames[old] = new

    def stage(df: DataFrame) -> DataFrame:
        out: list[Column] = []
        for name in df.columns:
            if name.startswith("_"):
                out.append(F.col(name))
                continue
            if include and name not in include:
                continue
            if name in exclude:
                continue
            out.append(F.col(name).alias(renames.get(name, name)))
        _require(bool(out), "ReplaceField: all value fields removed")
        return df.select(*out)

    return stage


def _insert_field(props: dict) -> Stage:
    """InsertField$Value: add a static field and/or copy record metadata
    (topic/timestamp/offset columns) into the value.

    ``static.field``/``static.value`` add a literal; ``topic.field`` /
    ``timestamp.field`` / ``offset.field`` copy the engine's metadata
    columns (``_topic``/``_ts``/``_offset``) into named value fields —
    the Connect behavior of materializing record coordinates."""
    static_field = props.get("static.field")
    static_value = props.get("static.value")
    _require((static_field is None) == (static_value is None),
             "InsertField: static.field and static.value go together")
    copies = [(props.get("topic.field"), DEFAULT_TOPIC_COL),
              (props.get("timestamp.field"), "_ts"),
              (props.get("offset.field"), "_offset")]

    def stage(df: DataFrame) -> DataFrame:
        if static_field is not None:
            df = df.withColumn(static_field, F.lit(static_value))
        for dest, src in copies:
            if dest is not None:
                _require(src in df.columns,
                         f"InsertField: metadata column {src!r} absent")
                df = df.withColumn(dest, F.col(src))
        return df

    return stage


def _mask_field(props: dict) -> Stage:
    """MaskField$Value: null out fields, or substitute a literal
    ``replacement`` cast to the field's type (Connect requires the
    replacement to parse as the field type — the cast mirrors that)."""
    fields = [s for s in props.get("fields", "").split(",") if s]
    _require(bool(fields), "MaskField: fields is required")
    replacement = props.get("replacement")

    def stage(df: DataFrame) -> DataFrame:
        for fname in fields:
            _require(fname in df.columns, f"MaskField: no field {fname!r}")
            dt = df.schema[fname].dataType
            col = (F.lit(None) if replacement is None
                   else F.lit(replacement)).cast(dt)
            df = df.withColumn(fname, col)
        return df

    return stage


def _cast(props: dict) -> Stage:
    """Cast$Value: per-field ``spec`` ("f1:int32,f2:string") or whole-value
    ("int64") casts using Connect's schema type names."""
    spec = props["spec"]
    pairs: list[tuple[str | None, str]] = []
    for part in spec.split(","):
        if ":" in part:
            fname, tname = part.split(":", 1)
            pairs.append((fname, tname))
        else:
            _require(len(spec.split(",")) == 1,
                     "Cast: whole-value spec must be a single type")
            pairs.append((None, part))
    for _, tname in pairs:
        _require(tname in _CAST_TYPES,
                 f"Cast: unknown type {tname!r} (one of {list(_CAST_TYPES)})")

    def stage(df: DataFrame) -> DataFrame:
        for fname, tname in pairs:
            target = _CAST_TYPES[tname]
            if fname is None:
                value = [c for c in df.columns if not c.startswith("_")]
                _require(len(value) == 1,
                         "Cast: whole-value spec needs a single-field value")
                fname = value[0]
            _require(fname in df.columns, f"Cast: no field {fname!r}")
            df = df.withColumn(fname, F.col(fname).cast(target))
        return df

    return stage


def _timestamp_converter(props: dict) -> Stage:
    """TimestampConverter$Value: convert ``field`` between epoch millis
    (Connect ``unix`` with ``unix.precision``), formatted ``string``
    (SimpleDateFormat patterns — Spark's date_format dialect is the same
    Java pattern language), and native ``Timestamp``/``Date``."""
    fname = props["field"]
    target = props["target.type"]
    _require(target in ("string", "unix", "Timestamp", "Date"),
             f"TimestampConverter: bad target.type {target!r}")
    fmt = props.get("format")
    if target == "string":
        _require(fmt is not None,
                 "TimestampConverter: target.type=string requires format")
    precision = props.get("unix.precision", "milliseconds")
    _require(precision in ("milliseconds", "seconds"),
             f"TimestampConverter: bad unix.precision {precision!r}")

    def to_ts(col: Column, dt) -> Column:
        s = dt.simpleString()
        if s in ("bigint", "int"):
            ms = col if precision == "milliseconds" else col * 1000
            return F.timestamp_millis(ms.cast("bigint"))
        if s == "string":
            return (F.to_timestamp(col, fmt) if fmt is not None
                    else F.to_timestamp(col))
        return col.cast("timestamp")

    def stage(df: DataFrame) -> DataFrame:
        _require(fname in df.columns,
                 f"TimestampConverter: no field {fname!r}")
        ts = to_ts(F.col(fname), df.schema[fname].dataType)
        if target == "unix":
            out = F.unix_millis(ts) if precision == "milliseconds" \
                else F.unix_millis(ts) / F.lit(1000)
            out = out.cast("bigint")
        elif target == "string":
            out = F.date_format(ts, fmt)
        elif target == "Date":
            out = ts.cast("date")
        else:
            out = ts
        return df.withColumn(fname, out)

    return stage


def _regex_router(props: dict) -> Stage:
    """RegexRouter: rewrite the topic column via regex + replacement.

    Connect applies Java-regex ``replacement`` with ``$1`` group refs ONLY
    when the whole topic matches; Spark's regexp_replace substitutes every
    match, so the stage anchors the pattern and gates on full-match to keep
    Connect's semantics."""
    regex = props["regex"]
    replacement = props["replacement"]
    anchored = regex if regex.startswith("^") else "^" + regex
    if not anchored.endswith("$"):
        anchored = anchored + "$"

    def stage(df: DataFrame) -> DataFrame:
        topic = props.get("topic.column", DEFAULT_TOPIC_COL)
        _require(topic in df.columns, f"RegexRouter: no column {topic!r}")
        routed = F.regexp_replace(F.col(topic), anchored, replacement)
        return df.withColumn(
            topic,
            F.when(F.col(topic).rlike(anchored), routed)
             .otherwise(F.col(topic)))

    return stage


def _timestamp_router(props: dict) -> Stage:
    """TimestampRouter: topic -> ``topic.format`` with ``${topic}`` and
    ``${timestamp}`` (record timestamp via ``timestamp.format``) expanded —
    the stock daily-index routing pattern."""
    topic_fmt = props.get("topic.format", "${topic}-${timestamp}")
    ts_fmt = props.get("timestamp.format", "yyyyMMdd")

    def stage(df: DataFrame) -> DataFrame:
        topic = props.get("topic.column", DEFAULT_TOPIC_COL)
        ts_col = props.get("ts.column", "_ts")
        _require(topic in df.columns, f"TimestampRouter: no {topic!r}")
        _require(ts_col in df.columns, f"TimestampRouter: no {ts_col!r}")
        stamp = F.date_format(F.col(ts_col).cast("timestamp"), ts_fmt)
        parts: list[Column] = []
        rest = topic_fmt
        while rest:
            nxt = min((i for i in (rest.find("${topic}"),
                                   rest.find("${timestamp}")) if i >= 0),
                      default=-1)
            if nxt < 0:
                parts.append(F.lit(rest))
                break
            if nxt > 0:
                parts.append(F.lit(rest[:nxt]))
                rest = rest[nxt:]
            if rest.startswith("${topic}"):
                parts.append(F.col(topic))
                rest = rest[len("${topic}"):]
            else:
                parts.append(stamp)
                rest = rest[len("${timestamp}"):]
        return df.withColumn(topic, F.concat(*parts))

    return stage


def _filter(props: dict) -> Stage:
    """Filter (+ predicate): drop records matching the predicate — or keep
    only matches with ``negate=true`` flipping it, Connect's
    ``predicate``/``negate`` wiring. Predicates: ``topic.regex``
    (TopicNameMatches) and ``field``/``equals`` (the reference's own
    condition shape, condition.py).

    A full Connect-style ``predicate`` BLOCK on a Filter spec (the
    canonical ``transforms.filter.predicate=...`` wiring) is handled in
    :func:`compile_smt_chain` directly — it compiles to a plain
    ``df.where`` over any supported predicate type, bypassing this
    factory's inline-prop shapes."""
    topic_regex = props.get("topic.regex")
    cfield = props.get("field")
    cequals = props.get("equals")
    _require((cfield is None) == (cequals is None),
             "Filter: field and equals go together")
    _require(topic_regex is not None or cfield is not None,
             "Filter: needs topic.regex or field/equals")
    negate = str(props.get("negate", "false")).lower() == "true"

    def stage(df: DataFrame) -> DataFrame:
        if topic_regex is not None:
            topic = props.get("topic.column", DEFAULT_TOPIC_COL)
            _require(topic in df.columns, f"Filter: no column {topic!r}")
            pred = F.col(topic).rlike(topic_regex)
        else:
            from cdcrypt.functions.condition import compile_condition
            pred = compile_condition(df, cfield, cequals)
        # Filter DROPS matches; negate keeps only matches
        return df.where(pred if negate else ~pred)

    return stage


def _value_to_key(props: dict) -> Stage:
    """ValueToKey: form the record key (``_key`` struct column) from value
    fields — the upstream of every key-partitioned sink."""
    fields = [s for s in props.get("fields", "").split(",") if s]
    _require(bool(fields), "ValueToKey: fields is required")

    def stage(df: DataFrame) -> DataFrame:
        for fname in fields:
            _require(fname in df.columns, f"ValueToKey: no field {fname!r}")
        return df.withColumn("_key", F.struct(*fields))

    return stage


def _event_router(props: dict) -> Stage:
    """EventRouter (the Debezium outbox pattern, public docs
    'outbox-event-router'): a transactional *outbox table* row becomes a
    routed event — topic from the aggregate type via ``route.topic.
    replacement`` (``${routedByValue}`` expanded), key from the aggregate
    id, value from the payload field; chosen extra fields ride along.

    Config (Debezium property names, ``table.`` prefixes accepted):
    ``route.by.field`` (default ``aggregatetype``), ``route.topic.
    replacement`` (default ``outbox.event.${routedByValue}``),
    ``field.event.key`` (default ``aggregateid``), ``field.event.payload``
    (default ``payload``), ``fields.additional.placement`` =
    ``f1:envelope[:alias],...`` (envelope placements only).

    Pure Column projection like every other stage — chained after a CDC
    source, the outbox expansion fuses into the same codegen'd map."""
    route_by = props.get("route.by.field", "aggregatetype")
    topic_tpl = props.get("route.topic.replacement",
                          "outbox.event.${routedByValue}")
    key_field = props.get("field.event.key", "aggregateid")
    payload_field = props.get("field.event.payload", "payload")
    extra: list[tuple[str, str]] = []
    for spec in (s for s in
                 props.get("fields.additional.placement", "").split(",")
                 if s):
        parts = spec.split(":")
        _require(len(parts) in (2, 3) and parts[1] == "envelope",
                 f"EventRouter: bad placement {spec!r} "
                 "(want field:envelope[:alias])")
        extra.append((parts[0], parts[2] if len(parts) == 3 else parts[0]))

    def stage(df: DataFrame) -> DataFrame:
        for fname in (route_by, key_field, payload_field,
                      *[f for f, _ in extra]):
            _require(fname in df.columns, f"EventRouter: no field {fname!r}")
        parts: list[Column] = []
        rest = topic_tpl
        marker = "${routedByValue}"
        while rest:
            i = rest.find(marker)
            if i < 0:
                parts.append(F.lit(rest))
                break
            if i > 0:
                parts.append(F.lit(rest[:i]))
            parts.append(F.col(route_by).cast("string"))
            rest = rest[i + len(marker):]
        value = [F.col(payload_field).alias("payload")] + [
            F.col(f).alias(alias) for f, alias in extra]
        return df.select(
            F.concat(*parts).alias(DEFAULT_TOPIC_COL),
            F.struct(F.col(key_field).alias(key_field)).alias("_key"),
            *value)

    return stage


# ------------------------------------------------------------------ headers
#
# Connect records carry an ordered header multimap (ConnectHeaders:
# repeated keys allowed, insertion order preserved). The columnar model
# is ``_headers: array<struct<key:string,value:string>>`` — an ordered
# list, NOT a MapType, precisely because Connect headers are a multimap.
# All header ops are pure Column (concat / filter / exists lambdas):
# zero Python, zero shuffles, fused into the chain's one projection.

HEADERS_COL = "_headers"


def _empty_headers() -> Column:
    # a typed empty array<struct<key,value>> (slice of a one-element
    # array: array().cast(...) cannot cast away the void element type)
    return F.slice(F.array(F.struct(
        F.lit("").alias("key"), F.lit("").alias("value"))), 1, 0)


def _with_headers(df: DataFrame, hcol: str) -> DataFrame:
    return df if hcol in df.columns else df.withColumn(
        hcol, _empty_headers())


def _headers_or_empty(hcol: str) -> Column:
    # a NULL headers container means "the SMT that would have created it
    # was predicate-gated off for this row" — semantically an EMPTY
    # container, never a poison value: without the coalesce, a later
    # unconditional append would concat(NULL, entry) -> NULL and silently
    # lose every subsequent header on those rows.
    return F.coalesce(F.col(hcol), _empty_headers())


def _header_entry(key: str, value: Column) -> Column:
    return F.array(F.struct(F.lit(key).alias("key"),
                            value.cast("string").alias("value")))


def _insert_header(props: dict) -> Stage:
    """InsertHeader: append a literal header (``header`` /
    ``value.literal``) — appends, never replaces, matching ConnectHeaders
    ``add`` multimap semantics."""
    key = props.get("header")
    val = props.get("value.literal")
    _require(key is not None and val is not None,
             "InsertHeader: header and value.literal are required")
    hcol = props.get("headers.column", HEADERS_COL)

    def stage(df: DataFrame) -> DataFrame:
        df = _with_headers(df, hcol)
        return df.withColumn(
            hcol, F.concat(_headers_or_empty(hcol),
                           _header_entry(key, F.lit(val))))

    return stage


def _header_from(props: dict) -> Stage:
    """HeaderFrom$Value: copy or move value fields into headers
    (``fields`` / ``headers`` parallel lists, ``operation`` copy|move;
    move drops the source fields from the value)."""
    fields = [s for s in props.get("fields", "").split(",") if s]
    headers = [s for s in props.get("headers", "").split(",") if s]
    _require(bool(fields) and len(fields) == len(headers),
             "HeaderFrom: fields and headers must be parallel non-empty")
    op = props.get("operation", "copy")
    _require(op in ("copy", "move"),
             f"HeaderFrom: operation must be copy|move, got {op!r}")
    hcol = props.get("headers.column", HEADERS_COL)

    def stage(df: DataFrame) -> DataFrame:
        for fname in fields:
            _require(fname in df.columns, f"HeaderFrom: no field {fname!r}")
        df = _with_headers(df, hcol)
        entries = [_header_entry(hk, F.col(fn))
                   for fn, hk in zip(fields, headers)]
        df = df.withColumn(hcol, F.concat(_headers_or_empty(hcol),
                                          *entries))
        return df.drop(*fields) if op == "move" else df

    return stage


def _drop_headers(props: dict) -> Stage:
    """DropHeaders: remove every header whose key is listed (all
    occurrences — it is a multimap)."""
    keys = [s for s in props.get("headers", "").split(",") if s]
    _require(bool(keys), "DropHeaders: headers is required")
    hcol = props.get("headers.column", HEADERS_COL)

    def stage(df: DataFrame) -> DataFrame:
        _require(hcol in df.columns, f"DropHeaders: no column {hcol!r}")
        return df.withColumn(
            hcol, F.filter(F.col(hcol),
                           lambda h: ~h["key"].isin(*keys)))

    return stage


# ---------------------------------------------------------------- predicates
#
# Connect predicates (org.apache.kafka.connect.transforms.predicates)
# gate whether an SMT applies to a given record; non-matching records
# pass through UNMODIFIED. Columnar translation: evaluate the predicate
# over the PRE-stage values, then per-column CASE WHEN between the
# stage's rewrite and the original — still one fused projection, still
# zero Python. Only value-rewriting stages are gateable: a structural
# stage (Flatten/ExtractField/...) changes the schema, and a fixed-
# schema engine cannot give two rows of one DataFrame different shapes
# (the reference's schemaless mode is where Connect itself bends this).

_GATEABLE = {
    # value-rewriting stages whose OUTPUT TYPE equals the input type (or
    # is a new column), so a per-row CASE WHEN between old and new is
    # well-typed. Cast / TimestampConverter are deliberately EXCLUDED:
    # their rewrite changes the column's type, so the CASE WHEN would
    # coerce the passthrough branch to the target type too — crashing on
    # predicate-EXCLUDED rows (e.g. a non-numeric string outside the
    # gate) and losing the declared target type. Same fixed-schema
    # argument as the structural stages: one column, one type.
    "MaskField", "InsertField", "ValueToKey", "RegexRouter",
    "TimestampRouter", "InsertHeader", "HeaderFrom", "DropHeaders",
}


def _compile_predicate(pspec: dict):
    """``{"type": ..., **props}`` -> builder(ref) -> Column, where
    ``ref(name)`` resolves a column to its PRE-stage value (or None if
    the column does not exist before the stage runs)."""
    ptype = pspec.get("type")
    ptype = (ptype or "").split("$")[0].split(".")[-1]

    if ptype == "TopicNameMatches":
        pattern = pspec.get("pattern")
        _require(pattern is not None, "TopicNameMatches: pattern required")
        tcol = pspec.get("topic.column", DEFAULT_TOPIC_COL)

        def build(ref):
            c = ref(tcol)
            _require(c is not None,
                     f"TopicNameMatches: no column {tcol!r}")
            # NULL topic -> the record does not match (Connect evaluates
            # the regex against a concrete topic string; a missing topic
            # must behave as non-matching, and under negate=true it must
            # MATCH — a bare rlike would stay NULL either way and
            # silently skip the gated stage)
            return F.coalesce(c.rlike(pattern), F.lit(False))
        return build

    if ptype == "HasHeaderKey":
        name = pspec.get("name")
        _require(name is not None, "HasHeaderKey: name required")
        hcol = pspec.get("headers.column", HEADERS_COL)

        def build(ref):
            c = ref(hcol)
            if c is None:          # no headers container yet -> no key
                return F.lit(False)
            # a NULL headers container (the documented state when the
            # header-creating stage was itself predicate-gated off) has
            # no key either: exists() over NULL is NULL, and NULL would
            # poison negate=true (rows lacking the header — exactly the
            # ones the negated predicate should match — would silently
            # skip the gated SMT). Pin it to false.
            return F.coalesce(
                F.exists(c, lambda h: h["key"] == F.lit(name)),
                F.lit(False))
        return build

    if ptype == "RecordIsTombstone":
        # columnar model: the record value is a named column; null value
        # == tombstone (Connect: record.value() == null)
        vcol = pspec.get("column")
        _require(vcol is not None,
                 "RecordIsTombstone: column is required (the value column "
                 "whose NULL marks a tombstone in the fixed schema)")

        def build(ref):
            c = ref(vcol)
            _require(c is not None,
                     f"RecordIsTombstone: no column {vcol!r}")
            return c.isNull()
        return build

    if ptype == "FieldEquals":
        # engine extension mirroring the reference's own condition shape
        # (condition.py: equality on a field, missing -> no match)
        fname, val = pspec.get("field"), pspec.get("equals")
        _require(fname is not None and val is not None,
                 "FieldEquals: field and equals are required")

        def build(ref):
            c = ref(fname)
            _require(c is not None, f"FieldEquals: no column {fname!r}")
            return c.cast("string").eqNullSafe(F.lit(str(val)))
        return build

    raise ConfigError(
        f"unknown predicate type {pspec.get('type')!r} (supported: "
        "TopicNameMatches, HasHeaderKey, RecordIsTombstone, FieldEquals)")


def _gate_stage(tname: str, stage: Stage, pspec: dict,
                negate: bool) -> Stage:
    build = _compile_predicate(pspec)

    def wrapped(df: DataFrame) -> DataFrame:
        pre_map = {c: f"__pre_{c}" for c in df.columns}
        pre = df
        for c, a in pre_map.items():
            pre = pre.withColumn(a, F.col(c))
        out = stage(pre)
        pred = build(lambda n: F.col(pre_map[n]) if n in pre_map else None)
        if negate:
            pred = ~pred
        for c in list(out.columns):
            if c.startswith("__pre_"):
                continue
            if c in pre_map:
                out = out.withColumn(
                    c, F.when(pred, F.col(c)).otherwise(F.col(pre_map[c])))
            else:
                # stage-ADDED column: ungated rows carry NULL (uniform
                # schema; NULL marks "the SMT did not run here")
                out = out.withColumn(c, F.when(pred, F.col(c)))
        return out.drop(*pre_map.values())

    return wrapped


_REGISTRY: dict[str, Callable[[dict], Stage]] = {
    "ExtractField": _extract_field,
    "HoistField": _hoist_field,
    "Flatten": _flatten,
    "ReplaceField": _replace_field,
    "InsertField": _insert_field,
    "MaskField": _mask_field,
    "Cast": _cast,
    "TimestampConverter": _timestamp_converter,
    "RegexRouter": _regex_router,
    "TimestampRouter": _timestamp_router,
    "Filter": _filter,
    "ValueToKey": _value_to_key,
    "EventRouter": _event_router,
    "InsertHeader": _insert_header,
    "HeaderFrom": _header_from,
    "DropHeaders": _drop_headers,
}


@dataclass
class SmtChain:
    """A compiled Connect SMT chain; construct once per job via
    :func:`compile_smt_chain`, apply per micro-batch."""

    stages: list[tuple[str, Stage]] = dc_field(default_factory=list)

    def apply(self, df: DataFrame) -> DataFrame:
        for name, stage in self.stages:
            try:
                df = stage(df)
            except ConfigError as e:
                raise ConfigError(f"{name}: {e}") from e
        return df


def compile_smt_chain(specs: list[dict]) -> SmtChain:
    """Compile ``transforms=``-style specs into a :class:`SmtChain`.

    Each spec is ``{"type": <SMT name>, **props}`` using the Connect
    property names (``Flatten$Value``-style suffixes are accepted and
    stripped). Unknown types and malformed props raise :class:`ConfigError`
    driver-side — nothing reaches an executor (O12 parity).
    """
    stages: list[tuple[str, Stage]] = []
    for i, spec in enumerate(specs):
        _require("type" in spec, f"spec #{i}: missing 'type'")
        props = {k: v for k, v in spec.items() if k != "type"}
        tname = spec["type"].split("$")[0].split(".")[-1]
        factory = _REGISTRY.get(tname)
        _require(factory is not None,
                 f"spec #{i}: unknown SMT {spec['type']!r} "
                 f"(supported: {sorted(_REGISTRY)})")
        pspec = props.pop("predicate", None)
        negate = False
        if pspec is not None and tname == "Filter":
            # Filter + predicate is Connect's CANONICAL wiring (drop the
            # records the predicate selects), and — unlike the structural
            # stages — a gated Filter is trivially a where clause, so the
            # "row-count stages cannot vary per row" rule does not apply.
            # Filter carries no props of its own in this wiring.
            negate = str(props.pop("negate", "false")).lower() == "true"
            _require(not props,
                     f"spec #{i}: Filter with a predicate block takes no "
                     f"other props (got {sorted(props)}); the predicate "
                     "decides which rows are dropped")
            build = _compile_predicate(dict(pspec))

            def stage(df: DataFrame, _build=build, _neg=negate
                      ) -> DataFrame:
                pred = _build(
                    lambda n, _df=df: F.col(n) if n in _df.columns
                    else None)
                if _neg:
                    pred = ~pred
                # Connect: the SMT applies to matching records, and
                # Filter DROPS the records it applies to
                return df.where(~pred)

            stages.append((tname, stage))
            continue
        if pspec is not None:
            negate = str(props.pop("negate", "false")).lower() == "true"
            _require(tname in _GATEABLE,
                     f"spec #{i}: {tname} cannot be predicate-gated — "
                     "structural/row-count/type-changing stages cannot "
                     f"vary per row in a fixed schema "
                     f"(gateable: {sorted(_GATEABLE)})")
            _require(not (tname == "HeaderFrom"
                          and props.get("operation") == "move"),
                     f"spec #{i}: HeaderFrom operation=move cannot be "
                     "predicate-gated — move DROPS the source fields, a "
                     "schema change that cannot vary per row (use "
                     "operation=copy, or an ungated move)")
        else:
            # Filter owns its own negate prop; for everything else a
            # stray negate-without-predicate means the user dropped the
            # predicate key — masking ALL rows unconditionally is never
            # what they meant, so fail driver-side (O12 parity)
            _require(tname == "Filter" or "negate" not in props,
                     f"spec #{i}: negate requires a predicate")
        stage = factory(props)
        if pspec is not None:
            stage = _gate_stage(tname, stage, dict(pspec), negate)
        stages.append((tname, stage))
    return SmtChain(stages)
