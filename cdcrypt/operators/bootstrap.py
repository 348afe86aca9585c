"""Initial-snapshot bootstrap with consistent binlog cutover (SURVEY P1).

A CDC pipeline rarely starts at the beginning of the binlog: the source
table already holds state, so ingest must begin with a FULL SNAPSHOT and
then switch to the change stream without losing or double-applying the
events that happened while the snapshot was being read. The reference
SMT inherits this from Debezium's snapshot mode (``op: r`` records,
handled by sources/debezium.py); this operator implements the engine's
native equivalent of the underlying algorithm — DBLog's watermark
interleaving (Andradottir et al., "DBLog: A Watermark Based Change-Data-
Capture Framework", Netflix 2019; also Debezium DDD-3 incremental
snapshots) — expressed entirely in the engine's existing LWW algebra
rather than as a bespoke reconciliation pass:

- the snapshot is read in CHUNKS while the binlog keeps advancing; each
  chunk is a consistent view of its keys as of some binlog position
  (its WATERMARK — per chunk, not global);
- every snapshot row becomes an ``op='I'`` change event whose ``op_seq``
  IS its chunk watermark. That single assignment makes last-writer-wins
  resolution (operators/dedup.py) do the entire cutover proof:
  * a binlog event at ``op_seq <= watermark`` is already reflected in
    the chunk -> it LOSES LWW to the snapshot row (and a delete of a
    snapshotted-away row stays a no-op: the key is simply absent);
  * an event at ``op_seq > watermark`` happened after the chunk was
    read -> it WINS and supersedes the snapshot value;
- so replaying the change stream from ANY position at or before the
  earliest watermark converges to the true source state — overlap is
  harmless (idempotent under LWW), gaps above the minimum watermark are
  the only failure mode, and that invariant is checkable up front
  (``replay_from <= min(watermark)``).

At scale the snapshot batch flows through the same key-partitioned MERGE
as any micro-batch: one exchange into bucket layout, O(snapshot) delta
appends under MoR — no special bulk path, no table lock, and the stream
can be applied concurrently from the next epoch on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cdcrypt.table.lake import LakeTable


def snapshot_to_changes(
    snapshot: DataFrame,
    watermark: Column | int,
    epoch: int = 0,
) -> DataFrame:
    """Re-express a (chunked-)consistent snapshot as change events.

    ``snapshot``: one row per live key — plain table state, no op/op_seq
    (a snapshot reader sees rows, not log positions).
    ``watermark``: the binlog position each row's chunk was consistent
    as of — a per-row ``Column`` expression, the NAME of a snapshot
    column (consumed: dropped from the payload), or a single int (one
    global consistent snapshot, e.g. from a repeatable-read
    transaction). Becomes the row's ``op_seq``.
    """
    payload = list(snapshot.columns)
    if isinstance(watermark, str):
        if watermark not in payload:
            raise ValueError(f"watermark column '{watermark}' not in snapshot")
        payload.remove(watermark)
        wm = F.col(watermark)
    elif isinstance(watermark, Column):
        wm = watermark
    else:
        wm = F.lit(int(watermark))
    clash = {"op", "op_seq", "epoch"} & set(payload)
    if clash:
        raise ValueError(
            f"snapshot must be plain table state; change-log columns "
            f"{sorted(clash)} already present")
    return snapshot.select(
        F.lit("I").alias("op"),
        wm.cast("long").alias("op_seq"),
        F.lit(epoch).cast("long").alias("epoch"),
        *payload,
    )


def bootstrap_snapshot(
    spark: SparkSession,
    table: LakeTable,
    snapshot: DataFrame,
    watermark: Column | int,
    epoch: int = 0,
    mode: str = "mor",
    **merge_kwargs,
) -> dict:
    """Apply a snapshot as the table's first epoch; returns merge lineage
    (plus ``bootstrap`` metadata: min/max watermark and the replay-from
    contract). Subsequent change epochs flow through the normal pipeline;
    replay must start at or before ``min_watermark`` (recorded in the
    lineage so an operator resuming the stream can verify the contract).
    """
    from cdcrypt.operators.merge import merge_upsert

    changes = snapshot_to_changes(snapshot, watermark, epoch)
    bounds = changes.select(
        F.min("op_seq").alias("lo"), F.max("op_seq").alias("hi")).first()
    lineage = merge_upsert(spark, table, changes, epoch=epoch, mode=mode,
                           **merge_kwargs)
    lineage["bootstrap"] = {
        "min_watermark": None if bounds["lo"] is None else int(bounds["lo"]),
        "max_watermark": None if bounds["hi"] is None else int(bounds["hi"]),
        "replay_from_at_most": (None if bounds["lo"] is None
                                else int(bounds["lo"])),
    }
    return lineage
