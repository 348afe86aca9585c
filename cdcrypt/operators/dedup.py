"""Change-event dedup + last-writer-wins resolution (SURVEY.md P4).

Three equivalent resolution strategies, all reducing a micro-batch of change
events to ONE final event per ``(conv_id, turn_idx)``:

1. ``dedup_changes`` + ``last_writer_wins`` — the window ``row_number`` form
   the north rule names. Two logical windows but ONE physical shuffle:
   both windows partition by a prefix of the same keys, so Catalyst reuses
   the exchange (verified in tests via explain).
2. ``resolve_latest_agg`` — ``groupBy(key).agg(max_by(payload, op_seq))``.
   Hash aggregation gets map-side partial combine for free, so duplicate
   and hot-key rows collapse BEFORE the shuffle — at 10^10 events this is
   the plan that survives; window row_number shuffles every row.
3. ``resolve_latest_salted`` — explicit two-phase salting: phase 1 aggregates
   per ``(key, salt)`` spreading a hot key over ``salt_buckets`` reducers,
   phase 2 aggregates the survivors per key. The north rule demands explicit
   salting exist; bench.py A/Bs it against 1 and 2.

All three produce identical final state (asserted in tests and by the DuckDB
oracle). Deterministic tie-break: among exact duplicate deliveries of one
``op_seq`` the payloads are identical by construction (exact redelivery), and
resolution orders by ``(op_seq, epoch)`` so replayed epochs change nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEY_COLS = ["conv_id", "turn_idx"]
PAYLOAD_COLS = ["op", "role", "text", "tool", "ts", "model"]


def dedup_changes(df: DataFrame) -> DataFrame:
    """Drop duplicate deliveries of the same (conv_id, turn_idx, op_seq)
    via window row_number (keeps the earliest epoch's copy)."""
    w = Window.partitionBy("conv_id", "turn_idx", "op_seq").orderBy(F.col("epoch").asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def last_writer_wins(df: DataFrame) -> DataFrame:
    """Keep the max-op_seq event per key (after dedup)."""
    w = Window.partitionBy(*KEY_COLS).orderBy(
        F.col("op_seq").desc(), F.col("epoch").asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def resolve_latest_window(df: DataFrame) -> DataFrame:
    """dedup + LWW in ONE window: ``row_number`` per key ordered by
    ``(op_seq desc, epoch asc)`` — duplicate deliveries of the winning
    op_seq collapse via the tie-break, duplicates of losing op_seqs are
    dropped with them. One shuffle, and Spark's rank-limit pushdown
    (``WindowGroupLimit Partial``) pre-filters to top-1 per key MAP-SIDE
    before the exchange — so even hot keys ship at most one row per input
    partition. (Chaining dedup_changes -> last_writer_wins instead costs a
    second exchange because the dedup key is a superset; asserted in
    tests/test_dedup_merge.py.)"""
    return last_writer_wins(df)


def _payload_cols(df: DataFrame) -> list[str]:
    return [c for c in PAYLOAD_COLS if c in df.columns]


def resolve_latest_agg(df: DataFrame) -> DataFrame:
    """groupBy + max_by(struct(payload), (op_seq, -epoch)): map-side partial
    aggregation collapses duplicates/hot keys before the shuffle."""
    payload = _payload_cols(df)
    # order key: max op_seq wins; on exact redelivery ties, min epoch —
    # negate epoch inside the comparator struct
    ordk = F.struct(F.col("op_seq"), (-F.col("epoch")).alias("nepoch"))
    agg = df.groupBy(*KEY_COLS).agg(
        F.max_by(F.struct(*payload, "op_seq", "epoch"), ordk).alias("_w")
    )
    return agg.select(
        *KEY_COLS, *[F.col(f"_w.{c}").alias(c) for c in payload],
        F.col("_w.op_seq").alias("op_seq"), F.col("_w.epoch").alias("epoch"),
    )


def resolve_latest_salted(df: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Explicit two-phase salted resolution for hot keys (SURVEY.md P6).

    Phase 1 shuffles by (key, salt) — a conversation with 5% of all events
    spreads over ``salt_buckets`` reducers; phase 2 reduces the <=
    ``salt_buckets`` survivors per key. Salt derives from op_seq so duplicate
    deliveries of one op_seq land in the same salt bucket (harmless either
    way, but keeps phase-1 output minimal).
    """
    payload = _payload_cols(df)
    ordk = F.struct(F.col("op_seq"), (-F.col("epoch")).alias("nepoch"))
    phase1 = (
        df.withColumn("_salt", F.pmod(F.col("op_seq"), F.lit(salt_buckets)).cast("int"))
        .groupBy(*KEY_COLS, "_salt")
        .agg(F.max_by(F.struct(*payload, "op_seq", "epoch"), ordk).alias("_w"))
    )
    ordk2 = F.struct(F.col("_w.op_seq"), (-F.col("_w.epoch")).alias("nepoch"))
    phase2 = phase1.groupBy(*KEY_COLS).agg(F.max_by(F.col("_w"), ordk2).alias("_w"))
    return phase2.select(
        *KEY_COLS, *[F.col(f"_w.{c}").alias(c) for c in payload],
        F.col("_w.op_seq").alias("op_seq"), F.col("_w.epoch").alias("epoch"),
    )
