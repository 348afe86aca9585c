"""SCD Type 2 history apply — P5 extension: the changelog as queryable history.

The reference SMT is sink-agnostic (it rewrites fields and hands the record
back to Kafka Connect, ``Transform.java:139-171``); real Connect deployments
materialize the resulting changelog one of two ways: latest-state upsert
(operators/merge.py) or a slowly-changing-dimension TYPE-2 HISTORY table —
one row per (key, version interval), so every past value stays queryable
AS OF any point in the sequence. Our engine owns the sink, so SCD2 is a
first-class apply mode next to lww/partial/aggregate.

Layout: logical key cols + payload + ``valid_from_seq`` / ``valid_to_seq``
(null = open) / ``is_current``. An event at op_seq ``s``:

- I/U: closes the key's previous open interval at ``s`` and opens a new one
  ``[s, next_event_seq)``;
- D: closes the previous interval at ``s`` and opens nothing — a later
  re-insert leaves a GAP (the key was absent over ``[delete_seq,
  reinsert_seq)``), which an as-of read reports as no row.

Scale shape: :func:`scd2_resolve` is one window pass over the BATCH alone
(never the history). :func:`scd2_apply` touches only the open rows of keys
present in the batch (an ``is_current`` scan joined to the broadcast batch
key set — history files that are 100% closed rows are skipped by parquet
min/max stats on the boolean) and then reuses the exactly-once CoW merge
machinery by re-keying history rows as ``(key..., valid_from_seq)`` upserts:
epoch-idempotent replay, per-row op_seq stale guards, dirty-bucket-only
rewrites and auto-broadcast all come for free from merge.py.

The op_seq stale guard composes exactly: an interval row carries
``op_seq = coalesce(valid_to_seq, valid_from_seq)`` — closing an interval
(op_seq rises from valid_from to valid_to) always beats a redelivered open
copy, and a redelivered old event loses against the already-closed live row.
Contract (same as merge_upsert): events arrive per-key in op_seq order
across epochs — late EXACT redeliveries are safely ignored (tested), a
never-before-seen event older than the key's open interval is an upstream
resolution bug, not an apply-layer case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
)

from cdcrypt.operators.dedup import dedup_changes
from cdcrypt.operators.merge import merge_upsert
from cdcrypt.table.lake import DEFAULT_BUCKET_BY, DEFAULT_KEY_COLS, LakeTable

SCD2_COLS = ("valid_from_seq", "valid_to_seq", "is_current")


def scd2_history_schema(payload_schema: StructType) -> StructType:
    """History-table schema for a changelog payload: payload columns (op /
    epoch / op_seq stripped) + the interval columns + op_seq (the merge
    stale-guard sequence, see module docstring)."""
    drop = {"op", "epoch", "op_seq", *SCD2_COLS}
    fields = [f for f in payload_schema.fields if f.name not in drop]
    return StructType([
        *fields,
        StructField("valid_from_seq", LongType(), False),
        StructField("valid_to_seq", LongType(), True),
        StructField("is_current", BooleanType(), False),
        StructField("op_seq", LongType(), True),
    ])


def create_scd2_table(root: str, payload_schema: StructType,
                      key_cols=DEFAULT_KEY_COLS,
                      bucket_count: int = 64,
                      bucket_by: str = DEFAULT_BUCKET_BY) -> LakeTable:
    """Create a history LakeTable keyed by (key..., valid_from_seq) —
    bucketing stays on the logical key column, so a conversation's whole
    history co-locates in one bucket (as-of reads prune to it)."""
    return LakeTable.create(
        root, scd2_history_schema(payload_schema),
        bucket_count=bucket_count, bucket_by=bucket_by,
        key_cols=[*key_cols, "valid_from_seq"])


def scd2_resolve(df: DataFrame, key_cols=None, order_col: str = "op_seq",
                 op_col: str = "op") -> DataFrame:
    """Changelog batch → SCD2 interval rows, batch-local (one window pass).

    Duplicate deliveries of the same (key, seq) are dropped first (when an
    ``epoch`` column is present — dedup.py P4 semantics, earliest copy
    kept); ``lead(seq)`` over the per-key order then assigns each event the
    next event's seq as its close, and D rows are dropped AFTER the lead so
    they close their predecessor without opening anything."""
    keys = list(key_cols or DEFAULT_KEY_COLS)
    if "epoch" in df.columns:
        if order_col == "op_seq":
            df = dedup_changes(df, key_cols=keys)
        else:
            wd = Window.partitionBy(*keys, order_col).orderBy(
                F.col("epoch").asc())
            df = (df.withColumn("_rn", F.row_number().over(wd))
                  .where(F.col("_rn") == 1).drop("_rn"))
    payload = [c for c in df.columns
               if c not in {op_col, order_col, "epoch", *keys}]
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    out = (
        df.withColumn("valid_to_seq", F.lead(order_col).over(w))
        .where(F.col(op_col) != "D")
        .select(
            *keys, *payload,
            F.col(order_col).alias("valid_from_seq"),
            "valid_to_seq",
            F.col("valid_to_seq").isNull().alias("is_current"),
        )
    )
    return out.withColumn(
        "op_seq", F.coalesce("valid_to_seq", "valid_from_seq"))


def scd2_as_of(history: DataFrame, seq: int) -> DataFrame:
    """Latest-state snapshot AS OF sequence point ``seq`` (exclusive of
    events at seq itself? No — an event AT ``seq`` is visible: intervals are
    ``[from, to)``). Deleted-at-or-before-seq keys yield no row (the gap)."""
    return history.where(
        (F.col("valid_from_seq") <= F.lit(seq))
        & (F.col("valid_to_seq").isNull()
           | (F.col("valid_to_seq") > F.lit(seq))))


def scd2_apply(spark: SparkSession, table: LakeTable, batch: DataFrame,
               epoch: int, order_col: str = "op_seq", op_col: str = "op",
               **merge_kw) -> dict:
    """Apply one changelog micro-batch to an SCD2 history table.

    Three batch-proportional steps, then the standard exactly-once merge:

    1. batch → interval rows (:func:`scd2_resolve`, window over the batch);
    2. per-key first batch seq (map-side-combined min — D events included,
       a leading delete closes without reopening);
    3. the table's OPEN rows for batch keys (``is_current`` scan joined to
       the broadcast key set) are closed at that first seq — guarded by
       ``first_seq > valid_from_seq`` so a redelivered batch closes nothing.

    The union re-enters :func:`merge_upsert` as plain upserts on the
    ``(key..., valid_from_seq)`` key: epochs at or below the committed
    epoch are skipped wholesale, per-row op_seq guards absorb partial
    redeliveries. History rows already closed are never read or rewritten
    (their buckets stay clean unless a batch key lands there).
    """
    if table.key_cols[-1] != "valid_from_seq":
        raise ValueError(
            "scd2_apply needs a history table keyed by (key..., "
            f"valid_from_seq); got key_cols={table.key_cols}")
    if epoch <= table.committed_epoch:
        return {"epoch": epoch, "skipped": True,
                "committed_epoch": table.committed_epoch}
    keys = table.key_cols[:-1]

    intervals = scd2_resolve(batch, key_cols=keys, order_col=order_col,
                             op_col=op_col)
    first_seq = (batch.groupBy(*keys)
                 .agg(F.min(order_col).alias("_close_seq")))
    closed = (
        table.read(spark).where(F.col("is_current"))
        .join(F.broadcast(first_seq), list(keys))
        .where(F.col("_close_seq") > F.col("valid_from_seq"))
        .withColumn("valid_to_seq", F.col("_close_seq"))
        .withColumn("is_current", F.lit(False))
        .withColumn("op_seq", F.col("_close_seq"))
        .drop("_close_seq")
    )
    hist_cols = [f.name for f in table.schema.fields]
    upserts = (
        closed.select(*hist_cols)
        .unionByName(intervals.select(*hist_cols))
        .select(F.lit("U").alias("op"), F.lit(epoch).cast("long")
                .alias("epoch"), *hist_cols)
    )
    lineage = merge_upsert(spark, table, upserts, epoch, **merge_kw)
    lineage["apply_mode"] = "scd2"
    return lineage
