"""Conversation-level operators over the transcripts table — the
payload-native view the north rule is written against: a relation of
``(conv_id, turn_idx, role, text, tool, ts)`` turns (BASELINE.json
input_hint) whose per-conversation semantics depend on STABLE TURN
ORDERING, the same invariant the CDC replay's final-state check uses.

The reference transforms one Connect record at a time and never sees a
conversation (`Transform.java:38` — per-record ``apply``); a training
pipeline consuming the replayed lake does, so these are engine
extensions, not parity items. Everything here is the turns relation the
MERGE path produces (``LakeTable.read()`` after replay) or any
DataFrame of the same shape.

Scale notes (100 TB = ~10^10 turns, conversations are the natural unit):

- every operator is ONE shuffle on ``conv_id`` (hash aggregate or one
  window) — no self-joins, no driver collection, no Python in the plan;
- per-group state is bounded by the LONGEST CONVERSATION, not the
  corpus: a transcript is a bounded artifact (10^2-10^4 turns), so
  ``collect_list`` inside :func:`render_transcript` is a per-group
  buffer of one conversation's lines, the same memory class as the
  row it emits. ``max_turns`` hard-caps degenerate keys (a runaway
  agent loop) BEFORE the aggregate so the buffer cannot blow up;
- stats in :func:`conversation_stats` are all map-side-combinable
  (sums / conditional sums / min / max), so the shuffle carries one
  partial row per (mapper, conv), not the turns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "conversation_stats",
    "render_transcript",
    "sft_pairs",
    "tool_usage",
]


def _chars(text_col: Column) -> Column:
    # NULL text is a legal turn (changegen null_text_ratio); count it as 0
    return F.coalesce(F.length(text_col), F.lit(0))


def conversation_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-conversation scalar rollup: one row per ``conv_id`` with

    ``(conv_id, n_turns, n_user, n_assistant, n_tool, total_chars,
    first_turn, last_turn, duration_us)``

    One hash aggregate on ``conv_id``; every measure is a sum /
    conditional sum / min / max, so partial aggregation runs map-side
    and the exchange carries one row per conversation per mapper.
    ``duration_us`` is a long (``max(ts) - min(ts)`` in microseconds):
    an integer so cross-engine value comparison is exact — no float
    seconds, no timestamp-locale ambiguity.
    """
    role = F.col(role_col)

    def role_count(name: str) -> Column:
        return F.sum(F.when(role == name, 1).otherwise(0)).cast("long")

    # parquet TIMESTAMP reads as NTZ; the engine pins the session to UTC
    # (session.py), so the cast is a type tag, not a value shift
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return df.groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        role_count("user").alias("n_user"),
        role_count("assistant").alias("n_assistant"),
        role_count("tool").alias("n_tool"),
        F.sum(_chars(F.col(text_col))).cast("long").alias("total_chars"),
        F.min(turn_col).alias("first_turn"),
        F.max(turn_col).alias("last_turn"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    )


def render_transcript(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep: str = "\n",
    max_turns: int | None = 100_000,
) -> DataFrame:
    """Canonical training-sample rendering: one row per conversation,
    ``(conv_id, n_turns, transcript)`` where ``transcript`` is the
    turns formatted ``role: text`` joined by ``sep`` in STABLE TURN
    ORDER — ``(turn_idx, line)`` ascending, so the output is invariant
    to input row order (engine, file layout, and shuffle
    nondeterminism), the same stable-ordering contract the replay's
    final-state equality check relies on.

    Plan: one hash aggregate on ``conv_id`` over ``collect_list`` of a
    ``(turn_idx, line)`` struct, sorted per group with ``array_sort``
    (line is the tie-break for pathological duplicate turn_idx, keeping
    the render deterministic even on un-deduplicated input). The
    per-group buffer holds ONE conversation's lines — bounded by the
    artifact, not the corpus; ``max_turns`` (a pre-aggregate window
    rank cap, only applied when set) hard-bounds degenerate keys so a
    runaway conversation degrades to a truncated sample instead of an
    executor OOM. NULL text renders as the empty string (a real turn
    whose payload was withheld is still a turn).
    """
    line = F.concat(F.col(role_col), F.lit(": "),
                    F.coalesce(F.col(text_col), F.lit("")))
    src = df
    if max_turns is not None:
        w = Window.partitionBy(conv_col).orderBy(
            F.col(turn_col).asc(), line.asc())
        src = (df.withColumn("_tr_rn", F.row_number().over(w))
                 .where(F.col("_tr_rn") <= max_turns).drop("_tr_rn"))
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col(turn_col).alias("t"),
                                line.alias("line"))))
    return src.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.concat_ws(sep, F.transform(pairs, lambda x: x["line"]))
         .alias("transcript"),
    )


def sft_pairs(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    prompt_role: str = "user",
    response_role: str = "assistant",
) -> DataFrame:
    """(prompt, response) extraction for supervised fine-tuning: every
    adjacent ``user -> assistant`` turn pair (adjacent in stable turn
    order, same conversation) becomes one training pair

    ``(conv_id, turn_idx, prompt, response)``

    with ``turn_idx`` the PROMPT's index. Turns whose successor is not
    the responding role (user->user retry, user->tool) emit nothing —
    the pair relation is a filter, not an imputation.

    Plan: ONE window (``lead`` over ``(conv_id) x turn order``) = one
    shuffle on ``conv_id``; the filter is a pure Column predicate on the
    led columns. NULL prompt text is kept (the pair exists; content
    filtering is a downstream curation stage, cf. operators/curation.py).
    """
    w = Window.partitionBy(conv_col).orderBy(F.col(turn_col).asc())
    nxt_role = F.lead(F.col(role_col)).over(w)
    nxt_text = F.lead(F.col(text_col)).over(w)
    return (
        df.select(
            F.col(conv_col), F.col(turn_col),
            F.col(role_col), F.col(text_col),
            nxt_role.alias("_nr"), nxt_text.alias("_nt"))
        .where((F.col(role_col) == prompt_role) & (F.col("_nr") == response_role))
        .select(
            F.col(conv_col), F.col(turn_col),
            F.col(text_col).alias("prompt"),
            F.col("_nt").alias("response"))
    )


def tool_usage(
    df: DataFrame,
    conv_col: str = "conv_id",
    tool_col: str = "tool",
    text_col: str = "text",
) -> DataFrame:
    """Per-tool usage rollup over agent transcripts:

    ``(tool, n_calls, n_convs, total_chars)``

    where ``n_convs`` is the EXACT distinct-conversation count (tool
    adoption, the number a mixture planner weights by) and
    ``total_chars`` sizes the tool-output token budget. Blank/NULL tool
    values (non-tool turns) are excluded.

    Plan: one partial aggregate to (tool, conv) then one to (tool) —
    Spark's two-phase exact count-distinct; both phases map-side
    combine, the tool dimension is small by construction, and no row
    ever carries text across the exchange (chars are summed before the
    shuffle).
    """
    tool = F.col(tool_col)
    return (
        df.where(tool.isNotNull() & (F.trim(tool) != ""))
        .groupBy(tool_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_calls"),
            F.countDistinct(conv_col).cast("long").alias("n_convs"),
            F.sum(_chars(F.col(text_col))).cast("long").alias("total_chars"),
        )
    )
