"""Event-time windowed aggregation + custom stateful streaming operators.

The CDC ingest itself needs no watermark (late/duplicate events resolve by
``op_seq`` last-writer-wins, which is order-free — SURVEY P4), but the
engine also serves the analytics side of the stream, where Spark's native
late-data machinery is the right tool:

- :func:`windowed_turn_counts` — tumbling event-time windows with a
  watermark; the SAME expression runs on a batch DataFrame (watermark is a
  no-op there), so batch backfill and the live stream share one definition;
- :func:`conversation_sessions` — a custom stateful operator via
  ``applyInPandasWithState``: per-conversation running session summaries
  (turn count, first/last event time, max op_seq), emitted in update mode
  every micro-batch. State is Arrow-typed and bounded (one row per live
  conversation), the executor-side function sees whole pandas groups — the
  streaming analogue of the engine's "no per-row Python" rule.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)


def windowed_turn_counts(
    df: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window per-role event counts with a late-data watermark.

    Streaming: rows later than ``watermark`` behind the max observed ``ts``
    are dropped and windows finalize (append mode works). Batch: identical
    results, watermark ignored — one definition for backfill + live."""
    return (
        df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("win"), "role")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("conv_id").alias("n_convs_approx"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "role", "n_events", "n_convs_approx",
        )
    )


def session_windows(
    df: DataFrame,
    gap_seconds: int = 1800,
    key_cols: tuple[str, ...] = ("conv_id",),
    ts_col: str = "ts",
    tiebreak_cols: tuple[str, ...] = ("op_seq",),
) -> DataFrame:
    """Gap-based session windows, batch form (pure Column, no UDF).

    Classic sessionization: within each key, an event more than
    ``gap_seconds`` after its predecessor opens a new session. Expressed as
    lag -> boundary flag -> running sum (the session ordinal) -> group
    summary; time arithmetic is integer epoch-MICROseconds end-to-end so a
    sub-second timestamp can never straddle a truncation boundary
    differently across engines (the DuckDB oracle uses epoch_us identically).

    Scale: ONE shuffle. Both window functions and the final groupBy key on
    ``key_cols`` (+ the derived ordinal) — hash clustering by ``key_cols``
    from the window exchange co-locates every group of the aggregate, which
    Catalyst recognizes (subset satisfaction), so no second exchange. Rows
    with a NULL ``ts_col`` are excluded up front: their session membership
    is undefined, and engines disagree on NULL ordering defaults.

    Determinism contract: (ts, *tiebreak_cols) must be unique per key —
    the running sum is order-sensitive, so ties would make the ordinal
    engine/partition-dependent.

    The streaming analogue (running per-conversation summaries with
    explicit state) is :func:`conversation_sessions`; this is the backfill/
    batch definition of the same analysis, gated against a DuckDB oracle
    (``session_windows``)."""
    from pyspark.sql import Window

    keys = [F.col(k) for k in key_cols]
    order = [F.col("_us").asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    # two window passes over ONE spec (same partitioning + ordering: one
    # exchange, one sort): lag must be materialized before the running sum
    # — window functions don't nest
    lagged = (
        df.where(F.col(ts_col).isNotNull())
        .withColumn("_us", F.unix_micros(F.col(ts_col).cast("timestamp")))
        .withColumn("_prev_us", F.lag("_us").over(w))
    )
    boundary = F.when(
        F.col("_prev_us").isNull()
        | ((F.col("_us") - F.col("_prev_us"))
           > F.lit(int(gap_seconds) * 1_000_000)), 1
    ).otherwise(0)
    tagged = lagged.withColumn("_sess", F.sum(boundary).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return tagged.groupBy(*key_cols, "_sess").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("_us").alias("start_us"),
        F.max("_us").alias("end_us"),
    ).select(
        *key_cols,
        F.col("_sess").alias("session_idx"),
        "n_events", "start_us", "end_us",
    )


SESSION_OUTPUT = StructType([
    StructField("conv_id", StringType(), False),
    StructField("n_turns", LongType(), False),
    StructField("first_ts", TimestampType(), True),
    StructField("last_ts", TimestampType(), True),
    StructField("max_op_seq", LongType(), True),
])

# state rows must be Arrow-typed; timestamps travel as epoch micros
SESSION_STATE = StructType([
    StructField("n_turns", LongType(), False),
    StructField("first_us", LongType(), True),
    StructField("last_us", LongType(), True),
    StructField("max_op_seq", LongType(), True),
])


def _track_session(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, first_us, last_us, mx = state.get
    else:
        n, first_us, last_us, mx = 0, None, None, None
    for pdf in pdfs:
        n += len(pdf)
        # null ts must not poison the bounds: .astype('int64') turns NaT
        # into int64-min silently — drop nulls BEFORE the ns->us view
        ts = pdf["ts"].dropna()
        if len(ts):
            ts_us = ts.astype("int64") // 1000  # ns -> us
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        if "op_seq" in pdf:
            m = pdf["op_seq"].max()  # NaN when the chunk is all-null
            if pd.notna(m):
                mx = int(m) if mx is None else max(mx, int(m))
    state.update((n, first_us, last_us, mx))
    yield pd.DataFrame([{
        "conv_id": key[0],
        "n_turns": n,
        "first_ts": (pd.Timestamp(first_us, unit="us")
                     if first_us is not None else pd.NaT),
        "last_ts": (pd.Timestamp(last_us, unit="us")
                    if last_us is not None else pd.NaT),
        "max_op_seq": mx,
    }])


def conversation_sessions(stream_df: DataFrame) -> DataFrame:
    """Running per-conversation session summaries (custom stateful op).

    Use on a streaming DataFrame with ``outputMode("update")``: each
    micro-batch re-emits the summaries of conversations it touched. State
    size = one small row per live conversation; an eviction policy (e.g.
    ``GroupStateTimeout.ProcessingTimeTimeout`` + ``state.setTimeout...``)
    bounds it for unbounded key spaces."""
    return stream_df.groupBy("conv_id").applyInPandasWithState(
        _track_session,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
