"""Change-stream integrity audit (pipeline quality diagnostics).

A CDC feed that is merely *applied* hides its own defects: LWW happily
resolves duplicate deliveries, late inserts, and missed deletes into
*some* state, and the damage only surfaces weeks later as drifted rows
(which operators/reconcile.py then repairs). This operator makes the
defects visible at ingest time — the audit a pipeline operator runs on
a suspect epoch range before deciding between replay and
reconciliation. The reference SMT inherits this from Kafka Connect's
DLQ + Debezium heartbeat/metrics; this engine owns the stream, so it
owns the audit.

Anomaly kinds (one output row per ``(key, op_seq, kind)``):

- ``conflict``      — the same (key, op_seq) arrived with DIFFERENT
  operation or payload: two writers claimed one log position. The only
  kind that is data CORRUPTION rather than delivery noise; LWW picks an
  arbitrary-but-deterministic winner, so it must be surfaced.
- ``redelivery``    — the same (key, op_seq) arrived more than once,
  byte-identical: at-least-once delivery doing its thing. Harmless
  (dedup_changes drops them) but a volume signal worth trending.
- ``first_op_not_insert`` — a key's earliest event is U or D: the
  stream joined after the key was born (binlog retention truncated the
  insert, or the bootstrap snapshot missed it). The canonical trigger
  for a bootstrap_snapshot / reconcile_table repair.
- ``update_after_delete`` — U at a higher position than the key's
  preceding D with no I between: either the delete was spurious or an
  insert was lost.
- ``double_delete`` — D following D with no I between.
- ``reinsert``      — I for a key that is already live (prev I/U
  without an intervening D): a source-side snapshot re-read leaking
  into the change stream, or a lost delete.

Scale: two hash exchanges, both key-local. Stage 1 groups by
(key, op_seq) with map-side partial aggregation (count + a 64-bit
payload fingerprint via min/max comparison — never the payload text);
stage 2 windows the ALREADY-REDUCED one-row-per-(key, op_seq) frame by
key. Output is anomaly-proportional, not stream-proportional. All pure
Column / whole-stage codegen; the transition op per position is the
deterministic ``max(op)`` so conflicting duplicates cannot make the
transition pass nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdcrypt.operators.reconcile import row_fingerprint

__all__ = ["audit_changes"]


def audit_changes(
    changes: DataFrame,
    key_cols: list[str] | tuple[str, ...] = ("conv_id", "turn_idx"),
    seq_col: str = "op_seq",
    op_col: str = "op",
    payload_cols: list[str] | None = None,
    include_transitions: bool = True,
) -> DataFrame:
    """Audit a raw change stream; returns ``*key_cols, op_seq, kind``
    (see module docstring for the kind taxonomy). ``payload_cols``
    defaults to every column that is not a key, the sequence, the op,
    or ``epoch`` (delivery bookkeeping — a redelivered event lands in a
    later epoch by definition, so epoch must not count as a payload
    difference).

    ``include_transitions=False`` restricts the audit to the positional
    kinds (conflict / redelivery) and skips the lag window entirely —
    the right scope for a single micro-batch, where a key's earlier
    history lives in previous epochs and every transition kind would be
    a false positive (the per-epoch mode of
    streaming/pipeline.py ``integrity_audit``). Transition kinds are
    only meaningful over the full stream (or a from-the-birth replay).
    """
    keys = list(key_cols)
    if payload_cols is None:
        skip = set(keys) | {seq_col, op_col, "epoch"}
        payload_cols = [c for c in changes.columns if c not in skip]
    fp = row_fingerprint([op_col, *payload_cols])

    # stage 1: one row per (key, position) — count + content spread.
    # distinct-fingerprint detection via min(fp) != max(fp): partial-agg
    # friendly (count_distinct would be exact too but blocks map-side
    # combine in the same pass with the other aggregates)
    per_pos = (
        changes.groupBy(*keys, F.col(seq_col).alias("op_seq"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(fp).alias("__fmin"),
            F.max(fp).alias("__fmax"),
            F.max(op_col).alias("__op"),
        )
    )

    dup = per_pos.where(F.col("__n") > 1).select(
        *keys, "op_seq",
        F.when(F.col("__fmin") != F.col("__fmax"), F.lit("conflict"))
        .otherwise(F.lit("redelivery")).alias("kind"),
    )
    if not include_transitions:
        return dup

    # stage 2: per-key op transitions over the reduced frame
    w = Window.partitionBy(*keys).orderBy("op_seq")
    prev = F.lag("__op").over(w)
    kind = (
        F.when(prev.isNull() & (F.col("__op") != "I"),
               F.lit("first_op_not_insert"))
        .when((prev == "D") & (F.col("__op") == "U"),
              F.lit("update_after_delete"))
        .when((prev == "D") & (F.col("__op") == "D"),
              F.lit("double_delete"))
        .when(prev.isin("I", "U") & (F.col("__op") == "I"),
              F.lit("reinsert"))
    )
    trans = (per_pos.select(*keys, "op_seq", kind.alias("kind"))
             .where(F.col("kind").isNotNull()))

    return dup.unionByName(trans)
