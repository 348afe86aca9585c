"""Conversation-level transcript operators: stable-turn-order rendering
invariance, SFT pair adjacency semantics, rollup arithmetic vs a
pure-Python oracle, NULL-text handling, and the max_turns cap."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from cdcrypt.operators.transcripts import (
    conversation_stats,
    render_transcript,
    sft_pairs,
    tool_usage,
)

_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("role", StringType()),
    StructField("text", StringType()),
    StructField("tool", StringType()),
    StructField("ts", TimestampType()),
])


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


_TURNS = [
    # c1: user/assistant alternation with a tool call in the middle
    ("c1", 1, "user", "hi there", None, _ts(0)),
    ("c1", 2, "assistant", "hello 🙂", None, _ts(5)),
    ("c1", 3, "user", "look this up", None, _ts(9)),
    ("c1", 4, "tool", "result: 42", "search", _ts(10)),
    ("c1", 5, "assistant", "it is 42", None, _ts(12)),
    # c2: NULL text turn, trailing user turn with no response
    ("c2", 1, "user", None, None, _ts(100)),
    ("c2", 2, "assistant", "", None, _ts(101)),
    ("c2", 3, "user", "bye", None, _ts(130)),
    # c3: single tool-only turn, blank tool string must not count
    ("c3", 1, "tool", "ping", "  ", _ts(7)),
    ("c3", 2, "tool", "pong", "search", _ts(8)),
]


def _df(spark, rows=None):
    return spark.createDataFrame(rows or _TURNS, _SCHEMA)


def test_stats_matches_python_oracle(spark):
    got = {r["conv_id"]: r.asDict()
           for r in conversation_stats(_df(spark)).collect()}
    assert set(got) == {"c1", "c2", "c3"}
    c1 = got["c1"]
    assert c1["n_turns"] == 5 and c1["n_user"] == 2
    assert c1["n_assistant"] == 2 and c1["n_tool"] == 1
    assert c1["total_chars"] == sum(
        len(t[3] or "") for t in _TURNS if t[0] == "c1")
    assert (c1["first_turn"], c1["last_turn"]) == (1, 5)
    assert c1["duration_us"] == 12_000_000
    c2 = got["c2"]
    assert c2["n_turns"] == 3 and c2["total_chars"] == 3  # NULL counts 0
    assert c2["duration_us"] == 30_000_000


def test_render_is_input_order_invariant(spark):
    base = render_transcript(_df(spark)).collect()
    shuffled = render_transcript(
        _df(spark, rows=list(reversed(_TURNS)))
        .repartition(7)).collect()
    assert sorted((r["conv_id"], r["transcript"]) for r in base) == \
        sorted((r["conv_id"], r["transcript"]) for r in shuffled)
    by_conv = {r["conv_id"]: r for r in base}
    assert by_conv["c1"]["transcript"] == (
        "user: hi there\nassistant: hello 🙂\nuser: look this up\n"
        "tool: result: 42\nassistant: it is 42")
    # NULL text renders as empty payload, turn is kept
    assert by_conv["c2"]["transcript"] == "user: \nassistant: \nuser: bye"
    assert by_conv["c2"]["n_turns"] == 3


def test_render_max_turns_truncates_keeps_prefix(spark):
    out = {r["conv_id"]: r for r in
           render_transcript(_df(spark), max_turns=2).collect()}
    assert out["c1"]["n_turns"] == 2
    assert out["c1"]["transcript"] == "user: hi there\nassistant: hello 🙂"
    assert out["c3"]["n_turns"] == 2  # under the cap: untouched


def test_sft_pairs_adjacency_only(spark):
    rows = sorted(
        ((r["conv_id"], r["turn_idx"], r["prompt"], r["response"])
         for r in sft_pairs(_df(spark)).collect()))
    # c1: turn1->2 yes; turn3's successor is a tool turn -> no pair;
    # c2: turn1(None)->2 yes (content filters are downstream); turn3 has
    # no successor; c3: no user turns
    assert rows == [
        ("c1", 1, "hi there", "hello 🙂"),
        ("c2", 1, None, ""),
    ]


def test_tool_usage_excludes_blank_and_counts_convs(spark):
    rows = {r["tool"]: r.asDict() for r in tool_usage(_df(spark)).collect()}
    assert set(rows) == {"search"}
    s = rows["search"]
    assert s["n_calls"] == 2 and s["n_convs"] == 2
    assert s["total_chars"] == len("result: 42") + len("pong")


def test_single_shuffle_plans(spark):
    # every operator: exactly one Exchange (the conv_id shuffle); the
    # input is a local relation so any extra exchange is operator-added
    df = _df(spark)
    for op in (conversation_stats, lambda d: render_transcript(d, max_turns=None),
               sft_pairs, tool_usage):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        n_ex = plan.count("Exchange")
        assert n_ex <= 2, plan  # agg partial+final reuse one exchange;
        # countDistinct legally adds a second (tool, conv) phase
