"""Connect built-in SMT library behavioral spec (operators/smtlib.py) —
one test per stock SMT mirroring the upstream Connect semantics (field
promotion, struct hoisting, flatten delimiter joining, include/exclude
ordering, Cast's whole-value form, TimestampConverter's unix precisions,
RegexRouter's whole-match gating, TimestampRouter expansion), plus the
chain-fusion plan property: an N-stage chain compiles to ONE projection
over the scan — no shuffle, no UDF."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cdcrypt.operators.smtlib import SmtChain, compile_smt_chain
from cdcrypt.operators.transform import ConfigError


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        Row(_topic="db.srv.users", _ts=datetime.datetime(2024, 3, 5, 12, 0),
            _offset=7, user_id=1, name="ada",
            meta=Row(city="paris", score=9)),
        Row(_topic="db.srv.users", _ts=datetime.datetime(2024, 3, 6, 1, 30),
            _offset=8, user_id=2, name="bo",
            meta=Row(city="oslo", score=3)),
        Row(_topic="db.srv.orders", _ts=datetime.datetime(2024, 3, 6, 2, 0),
            _offset=9, user_id=3, name="cy",
            meta=Row(city="lima", score=5)),
    ]
    return spark.createDataFrame(rows)


def test_extract_field_struct_promotes(events):
    out = compile_smt_chain([{"type": "ExtractField", "field": "meta"}]) \
        .apply(events)
    assert set(out.columns) == {"city", "score", "_topic", "_ts", "_offset"}
    assert out.where(F.col("city") == "paris").count() == 1


def test_extract_field_scalar(events):
    out = compile_smt_chain([{"type": "ExtractField$Value", "field": "name"}]) \
        .apply(events)
    assert [c for c in out.columns if not c.startswith("_")] == ["name"]


def test_hoist_then_extract_roundtrip(events):
    chain = compile_smt_chain([
        {"type": "HoistField", "field": "payload"},
        {"type": "ExtractField", "field": "payload"},
    ])
    out = chain.apply(events)
    assert sorted(out.columns) == sorted(events.columns)
    assert out.count() == events.count()


def test_flatten_delimiter(events):
    out = compile_smt_chain([{"type": "Flatten", "delimiter": "_"}]) \
        .apply(events)
    assert "meta_city" in out.columns and "meta_score" in out.columns
    assert out.where(F.col("meta_city") == "oslo").count() == 1


def test_replace_field_order_and_renames(events):
    out = compile_smt_chain([{
        "type": "ReplaceField",
        "exclude": "meta",
        "renames": "name:user_name",
    }]).apply(events)
    cols = [c for c in out.columns if not c.startswith("_")]
    assert cols == ["user_id", "user_name"]
    # include keeps only the listed fields (then renames apply)
    out2 = compile_smt_chain([{
        "type": "ReplaceField", "include": "name", "renames": "name:n",
    }]).apply(events)
    assert [c for c in out2.columns if not c.startswith("_")] == ["n"]


def test_insert_field_static_and_metadata(events):
    out = compile_smt_chain([{
        "type": "InsertField",
        "static.field": "source_dc", "static.value": "dc1",
        "topic.field": "src_topic", "offset.field": "src_off",
    }]).apply(events)
    row = out.where(F.col("user_id") == 1).first()
    assert row.source_dc == "dc1"
    assert row.src_topic == "db.srv.users" and row.src_off == 7


def test_mask_field_null_and_literal(events):
    out = compile_smt_chain([
        {"type": "MaskField", "fields": "name"},
        {"type": "MaskField", "fields": "user_id", "replacement": "0"},
    ]).apply(events)
    assert out.where(F.col("name").isNull()).count() == 3
    assert out.agg(F.sum("user_id")).first()[0] == 0
    assert out.schema["user_id"].dataType.simpleString() == "bigint"


def test_cast_spec_and_whole_value(events):
    out = compile_smt_chain([
        {"type": "Cast", "spec": "user_id:string,name:bytes"},
    ]).apply(events)
    assert out.schema["user_id"].dataType.simpleString() == "string"
    assert out.schema["name"].dataType.simpleString() == "binary"
    single = compile_smt_chain([
        {"type": "ExtractField", "field": "user_id"},
        {"type": "Cast", "spec": "int32"},
    ]).apply(events)
    assert single.schema["user_id"].dataType.simpleString() == "int"


def test_timestamp_converter_unix_string_roundtrip(spark):
    df = spark.createDataFrame([Row(ts_ms=1709640000000)])
    as_ts = compile_smt_chain([{
        "type": "TimestampConverter", "field": "ts_ms",
        "target.type": "Timestamp",
    }]).apply(df)
    assert as_ts.schema["ts_ms"].dataType.simpleString() == "timestamp"
    as_str = compile_smt_chain([{
        "type": "TimestampConverter", "field": "ts_ms",
        "target.type": "string", "format": "yyyy-MM-dd",
    }]).apply(df)
    assert as_str.first().ts_ms == "2024-03-05"
    back = compile_smt_chain([
        {"type": "TimestampConverter", "field": "ts_ms",
         "target.type": "Timestamp"},
        {"type": "TimestampConverter", "field": "ts_ms",
         "target.type": "unix", "unix.precision": "seconds"},
    ]).apply(df)
    assert back.first().ts_ms == 1709640000


def test_regex_router_whole_match_only(events):
    out = compile_smt_chain([{
        "type": "RegexRouter",
        "regex": "db\\.srv\\.(.*)", "replacement": "cdc-$1",
    }]).apply(events)
    topics = {r._topic for r in out.select("_topic").collect()}
    assert topics == {"cdc-users", "cdc-orders"}
    # a non-matching topic passes through unchanged (whole-match gate)
    out2 = compile_smt_chain([{
        "type": "RegexRouter", "regex": "srv", "replacement": "X",
    }]).apply(events)
    assert {r._topic for r in out2.select("_topic").collect()} \
        == {"db.srv.users", "db.srv.orders"}


def test_timestamp_router(events):
    out = compile_smt_chain([{
        "type": "TimestampRouter",
        "topic.format": "${topic}-${timestamp}",
        "timestamp.format": "yyyyMMdd",
    }]).apply(events)
    assert out.where(F.col("_topic") == "db.srv.users-20240305").count() == 1
    assert out.where(F.col("_topic") == "db.srv.orders-20240306").count() == 1


def test_filter_topic_and_field_predicates(events):
    dropped = compile_smt_chain([{
        "type": "Filter", "topic.regex": ".*orders",
    }]).apply(events)
    assert dropped.count() == 2
    kept_only = compile_smt_chain([{
        "type": "Filter", "topic.regex": ".*orders", "negate": "true",
    }]).apply(events)
    assert kept_only.count() == 1
    by_field = compile_smt_chain([{
        "type": "Filter", "field": "$.name", "equals": "ada",
    }]).apply(events)
    assert by_field.count() == 2


def test_value_to_key(events):
    out = compile_smt_chain([{"type": "ValueToKey", "fields": "user_id"}]) \
        .apply(events)
    assert out.schema["_key"].dataType.simpleString() == \
        "struct<user_id:bigint>"


def test_chain_fuses_to_single_projection(events):
    """The scale property: an N-stage chain is one Catalyst projection —
    no Exchange, no BatchEvalPython, whole-stage codegen throughout."""
    chain = compile_smt_chain([
        {"type": "Flatten", "delimiter": "_"},
        {"type": "ReplaceField", "renames": "meta_city:city"},
        {"type": "Cast", "spec": "meta_score:string"},
        {"type": "InsertField", "static.field": "dc", "static.value": "a"},
        {"type": "RegexRouter", "regex": "db\\.srv\\.(.*)",
         "replacement": "$1"},
    ])
    plan = chain.apply(events)._sc is not None and \
        chain.apply(events)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_config_errors_raise_driver_side(events):
    with pytest.raises(ConfigError, match="unknown SMT"):
        compile_smt_chain([{"type": "Nope"}])
    with pytest.raises(ConfigError, match="go together"):
        compile_smt_chain([{"type": "InsertField", "static.field": "x"}])
    with pytest.raises(ConfigError, match="unknown type"):
        compile_smt_chain([{"type": "Cast", "spec": "a:uuid"}])
    with pytest.raises(ConfigError, match="no field"):
        compile_smt_chain([{"type": "ExtractField", "field": "zzz"}]) \
            .apply(events)
    with pytest.raises(ConfigError, match="requires format"):
        compile_smt_chain([{"type": "TimestampConverter", "field": "x",
                            "target.type": "string"}])


def test_chain_composes_with_crypto_transform(events):
    """The reference deployment shape: stock SMTs around the crypto SMT —
    flatten, then encrypt a flattened leaf, then route; decrypt recovers."""
    from cdcrypt.operators.transform import decrypt_fields, encrypt_fields

    pre = compile_smt_chain([
        {"type": "Flatten", "delimiter": "_"},
        {"type": "ValueToKey", "fields": "user_id"},
    ])
    post = compile_smt_chain([{
        "type": "RegexRouter", "regex": "db\\.srv\\.(.*)",
        "replacement": "enc-$1",
    }])
    flat = pre.apply(events)
    enc = post.apply(
        encrypt_fields(flat, ["$.meta_city"], key_id="cdcrypt/smtlib"))
    dec = decrypt_fields(enc, ["$.meta_city"], key_id="cdcrypt/smtlib")
    got = {(r.user_id, r.meta_city, r._topic)
           for r in dec.select("user_id", "meta_city", "_topic").collect()}
    assert got == {(1, "paris", "enc-users"), (2, "oslo", "enc-users"),
                   (3, "lima", "enc-orders")}


def test_event_router_outbox(spark):
    """Debezium outbox shape: aggregatetype routes the topic, aggregateid
    becomes the key, payload becomes the value, placements ride along."""
    rows = [
        (1, "order", "o-17", "OrderCreated", '{"total": 9}'),
        (2, "customer", "c-3", "CustomerMoved", '{"city": "oslo"}'),
    ]
    outbox = spark.createDataFrame(
        rows, "id bigint, aggregatetype string, aggregateid string, "
              "type string, payload string")
    out = compile_smt_chain([{
        "type": "EventRouter",
        "fields.additional.placement": "type:envelope:eventType",
    }]).apply(outbox)
    got = {(r._topic, r._key.aggregateid, r.eventType)
           for r in out.collect()}
    assert got == {("outbox.event.order", "o-17", "OrderCreated"),
                   ("outbox.event.customer", "c-3", "CustomerMoved")}
    assert out.where(F.col("payload").contains("oslo")).count() == 1
    with pytest.raises(ConfigError, match="bad placement"):
        compile_smt_chain([{"type": "EventRouter",
                            "fields.additional.placement": "type:header"}])
    with pytest.raises(ConfigError, match="no field"):
        compile_smt_chain([{"type": "EventRouter",
                            "route.by.field": "agg"}]).apply(outbox)


# ---------------------------------------------------------------- headers


@pytest.fixture(scope="module")
def hdf(spark):
    return spark.createDataFrame(
        [(1, "error", "p1"), (2, "click", "p2"), (3, "error", None)],
        "event_id long, event_type string, props string")


def _hdrs(row):
    return [(h.key, h.value) for h in row._headers]


class TestHeaders:
    def test_insert_header_appends_ordered_multimap(self, hdf):
        chain = compile_smt_chain([
            {"type": "InsertHeader", "header": "a", "value.literal": "1"},
            {"type": "InsertHeader", "header": "a", "value.literal": "2"},
            {"type": "InsertHeader", "header": "b", "value.literal": "3"},
        ])
        r = chain.apply(hdf).orderBy("event_id").head()
        # repeated keys allowed, insertion order preserved (ConnectHeaders)
        assert _hdrs(r) == [("a", "1"), ("a", "2"), ("b", "3")]

    def test_header_from_copy_and_move(self, hdf):
        copy = compile_smt_chain([{
            "type": "HeaderFrom", "fields": "event_type,props",
            "headers": "et,pr", "operation": "copy"}]).apply(hdf)
        r = copy.orderBy("event_id").head()
        assert _hdrs(r) == [("et", "error"), ("pr", "p1")]
        assert "event_type" in copy.columns and "props" in copy.columns
        moved = compile_smt_chain([{
            "type": "HeaderFrom", "fields": "props",
            "headers": "pr", "operation": "move"}]).apply(hdf)
        assert "props" not in moved.columns
        # null field value -> null header value, key still present
        r3 = moved.orderBy("event_id").collect()[2]
        assert _hdrs(r3) == [("pr", None)]

    def test_drop_headers_removes_all_occurrences(self, hdf):
        chain = compile_smt_chain([
            {"type": "InsertHeader", "header": "a", "value.literal": "1"},
            {"type": "InsertHeader", "header": "a", "value.literal": "2"},
            {"type": "InsertHeader", "header": "keep", "value.literal": "k"},
            {"type": "DropHeaders", "headers": "a,gone"},
        ])
        r = chain.apply(hdf).head()
        assert _hdrs(r) == [("keep", "k")]

    def test_config_errors(self, hdf):
        with pytest.raises(ConfigError):
            compile_smt_chain([{"type": "InsertHeader", "header": "x"}])
        with pytest.raises(ConfigError):
            compile_smt_chain([{"type": "HeaderFrom", "fields": "a,b",
                                "headers": "only_one"}])
        with pytest.raises(ConfigError):
            compile_smt_chain([{"type": "DropHeaders"}])


class TestPredicates:
    def test_field_equals_gates_mask(self, hdf):
        chain = compile_smt_chain([{
            "type": "MaskField", "fields": "props", "replacement": "***",
            "predicate": {"type": "FieldEquals", "field": "event_type",
                          "equals": "error"}}])
        got = {r.event_id: r.props
               for r in chain.apply(hdf).collect()}
        assert got == {1: "***", 2: "p2", 3: "***"}

    def test_negate_inverts(self, hdf):
        chain = compile_smt_chain([{
            "type": "MaskField", "fields": "props", "replacement": "***",
            "negate": "true",
            "predicate": {"type": "FieldEquals", "field": "event_type",
                          "equals": "error"}}])
        got = {r.event_id: r.props for r in chain.apply(hdf).collect()}
        assert got == {1: "p1", 2: "***", 3: None}

    def test_stage_added_column_null_when_ungated(self, hdf):
        chain = compile_smt_chain([{
            "type": "InsertField", "static.field": "flag",
            "static.value": "ok",
            "predicate": {"type": "FieldEquals", "field": "event_type",
                          "equals": "click"}}])
        got = {r.event_id: r.flag for r in chain.apply(hdf).collect()}
        assert got == {1: None, 2: "ok", 3: None}

    def test_has_header_key_and_absent_headers(self, hdf):
        # no headers column yet -> predicate is False everywhere
        none = compile_smt_chain([{
            "type": "MaskField", "fields": "props", "replacement": "x",
            "predicate": {"type": "HasHeaderKey", "name": "h"}}])
        assert {r.props for r in none.apply(hdf).collect()} == \
            {"p1", "p2", None}
        # headers inserted upstream for error rows only -> gated mask
        chain = compile_smt_chain([
            {"type": "InsertHeader", "header": "h", "value.literal": "1",
             "predicate": {"type": "FieldEquals", "field": "event_type",
                           "equals": "error"}},
            {"type": "MaskField", "fields": "props", "replacement": "x",
             "predicate": {"type": "HasHeaderKey", "name": "h"}},
        ])
        got = {r.event_id: r.props for r in chain.apply(hdf).collect()}
        assert got == {1: "x", 2: "p2", 3: "x"}

    def test_record_is_tombstone(self, hdf):
        chain = compile_smt_chain([{
            "type": "InsertField", "static.field": "dead",
            "static.value": "y",
            "predicate": {"type": "RecordIsTombstone",
                          "column": "props"}}])
        got = {r.event_id: r.dead for r in chain.apply(hdf).collect()}
        assert got == {1: None, 2: None, 3: "y"}

    def test_topic_name_matches(self, events):
        chain = compile_smt_chain([{
            "type": "MaskField", "fields": "name", "replacement": "###",
            "predicate": {"type": "TopicNameMatches",
                          "pattern": r".*\.users"}}])
        out = chain.apply(events).collect()
        for r in out:
            if r._topic.endswith(".users"):
                assert r.name == "###"
            else:
                assert r.name != "###"

    def test_structural_stage_rejects_predicate(self, hdf):
        with pytest.raises(ConfigError):
            compile_smt_chain([{
                "type": "Flatten",
                "predicate": {"type": "FieldEquals",
                              "field": "event_type", "equals": "x"}}])
        with pytest.raises(ConfigError):
            compile_smt_chain([{
                "type": "MaskField", "fields": "props",
                "predicate": {"type": "NoSuchPredicate"}}])

    def test_gated_chain_is_one_projection(self, hdf):
        chain = compile_smt_chain([
            {"type": "InsertHeader", "header": "src",
             "value.literal": "cdc"},
            {"type": "HeaderFrom", "fields": "event_type",
             "headers": "et", "operation": "copy"},
            {"type": "MaskField", "fields": "props", "replacement": "***",
             "predicate": {"type": "FieldEquals", "field": "event_type",
                           "equals": "error"}},
            {"type": "DropHeaders", "headers": "src"},
        ])
        plan = chain.apply(hdf)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert plan.count("Project") == 1


class TestReviewRegressions:
    # fixes from the session-11 review of the headers/predicates feature

    def test_gated_header_from_move_rejected(self, hdf):
        with pytest.raises(ConfigError):
            compile_smt_chain([{
                "type": "HeaderFrom", "fields": "props", "headers": "pr",
                "operation": "move",
                "predicate": {"type": "FieldEquals",
                              "field": "event_type", "equals": "error"}}])
        # copy stays gateable and leaves non-matching rows untouched
        chain = compile_smt_chain([{
            "type": "HeaderFrom", "fields": "props", "headers": "pr",
            "operation": "copy",
            "predicate": {"type": "FieldEquals",
                          "field": "event_type", "equals": "error"}}])
        out = chain.apply(hdf)
        assert "props" in out.columns
        got = {r.event_id: r._headers for r in out.collect()}
        assert [h.key for h in got[1]] == ["pr"]
        assert got[2] is None  # gated off -> no container yet

    def test_null_headers_do_not_poison_later_appends(self, hdf):
        # gated InsertHeader creates _headers only for error rows; the
        # later UNGATED InsertHeader must still append for everyone
        chain = compile_smt_chain([
            {"type": "InsertHeader", "header": "err", "value.literal": "1",
             "predicate": {"type": "FieldEquals", "field": "event_type",
                           "equals": "error"}},
            {"type": "InsertHeader", "header": "src",
             "value.literal": "cdc"},
        ])
        got = {r.event_id: [(h.key, h.value) for h in r._headers]
               for r in chain.apply(hdf).collect()}
        assert got[1] == [("err", "1"), ("src", "cdc")]
        assert got[2] == [("src", "cdc")]  # was NULL-poisoned before fix

    def test_cast_and_timestamp_converter_not_gateable(self, hdf):
        for spec in (
            {"type": "Cast", "spec": "props:int32"},
            {"type": "TimestampConverter", "field": "props",
             "target.type": "string", "format": "yyyy"},
        ):
            with pytest.raises(ConfigError):
                compile_smt_chain([{
                    **spec,
                    "predicate": {"type": "FieldEquals",
                                  "field": "event_type",
                                  "equals": "error"}}])

    def test_negate_without_predicate_rejected(self, hdf):
        with pytest.raises(ConfigError):
            compile_smt_chain([{
                "type": "MaskField", "fields": "props",
                "replacement": "***", "negate": "true"}])
        # Filter keeps its own negate prop
        compile_smt_chain([{
            "type": "Filter", "field": "event_type", "equals": "error",
            "negate": "true"}])


class TestAdviceR4Regressions:
    # fixes from the round-4 ADVICE review of the predicate layer

    def test_has_header_key_null_container_negate(self, spark):
        # headers container NULL for non-error rows (gated InsertHeader);
        # negate=true must MATCH those rows — a bare exists() stays NULL
        # on a NULL container and silently skipped them before the fix
        df = spark.createDataFrame(
            [(1, "error", "p1"), (2, "click", "p2")],
            "event_id long, event_type string, props string")
        chain = compile_smt_chain([
            {"type": "InsertHeader", "header": "h", "value.literal": "1",
             "predicate": {"type": "FieldEquals", "field": "event_type",
                           "equals": "error"}},
            {"type": "MaskField", "fields": "props", "replacement": "x",
             "negate": "true",
             "predicate": {"type": "HasHeaderKey", "name": "h"}},
        ])
        got = {r.event_id: r.props for r in chain.apply(df).collect()}
        # row 1 has the header -> negated predicate false -> untouched;
        # row 2 has a NULL container (no header) -> masked
        assert got == {1: "p1", 2: "x"}

    def test_topic_name_matches_null_topic_negate(self, spark):
        df = spark.createDataFrame(
            [(1, "db.users", "a"), (2, None, "b")],
            "event_id long, _topic string, props string")
        chain = compile_smt_chain([{
            "type": "MaskField", "fields": "props", "replacement": "x",
            "negate": "true",
            "predicate": {"type": "TopicNameMatches",
                          "pattern": r"db\..*"}}])
        got = {r.event_id: r.props for r in chain.apply(df).collect()}
        # NULL topic does not match the pattern -> negate selects it
        assert got == {1: "a", 2: "x"}

    def test_filter_accepts_predicate_block(self, hdf):
        # Connect's canonical Filter+predicate wiring: drop matches
        drop = compile_smt_chain([{
            "type": "Filter",
            "predicate": {"type": "FieldEquals", "field": "event_type",
                          "equals": "error"}}])
        assert {r.event_id for r in drop.apply(hdf).collect()} == {2}
        # negate=true applies Filter to NON-matching records
        keep = compile_smt_chain([{
            "type": "Filter", "negate": "true",
            "predicate": {"type": "FieldEquals", "field": "event_type",
                          "equals": "error"}}])
        assert {r.event_id for r in keep.apply(hdf).collect()} == {1, 3}

    def test_filter_predicate_block_rejects_extra_props(self, hdf):
        with pytest.raises(ConfigError, match="no other props"):
            compile_smt_chain([{
                "type": "Filter", "field": "event_type",
                "equals": "error",
                "predicate": {"type": "FieldEquals",
                              "field": "event_type", "equals": "x"}}])

    def test_filter_predicate_block_null_safe(self, spark):
        # HasHeaderKey over an ABSENT headers column inside a gated
        # Filter: predicate False everywhere -> negate drops everything
        df = spark.createDataFrame(
            [(1, "a"), (2, "b")], "event_id long, props string")
        keep_matching = compile_smt_chain([{
            "type": "Filter", "negate": "true",
            "predicate": {"type": "HasHeaderKey", "name": "h"}}])
        assert keep_matching.apply(df).count() == 0
        drop_matching = compile_smt_chain([{
            "type": "Filter",
            "predicate": {"type": "HasHeaderKey", "name": "h"}}])
        assert drop_matching.apply(df).count() == 2
