"""Key-partitioned MERGE upsert into the lake table (SURVEY.md P5, §7 stage 6).

Per micro-batch (events already resolved to one final change per key by
operators/dedup.py):

1. assign ``bucket = pmod(xxhash64(conv_id), B)`` to the batch;
2. dirty-bucket detection: only buckets touched by the batch are read and
   rewritten (copy-on-write at bucket granularity) — at 100 TB the epoch's
   working set is the dirty buckets, not the table;
3. ``full_outer`` join of current dirty-bucket rows vs the batch on
   ``(conv_id, turn_idx)`` — Catalyst/AQE picks broadcast when the batch
   side is small (``broadcast=True`` forces it); the join key includes
   turn_idx so a hot *conversation* does not make a hot *join key* (skew
   lives in the dedup shuffle, which is salted — operators/dedup.py);
4. apply I/U/D with a stale-guard: an after-image only replaces the table
   row if ``b.op_seq > t.op_seq`` (protects against replayed or reordered
   epochs even beyond the committed_epoch idempotency gate);
5. rewrite dirty buckets under ``data/v{N+1}/bucket=K/`` and commit the new
   snapshot (clean buckets carry their parent's files forward untouched).

Schema evolution: columns present in the batch but not in the table (the
``model`` column arriving mid-stream, FIXTURES.md F2) extend the table schema
at commit; columns in the table but not the batch are filled with nulls for
new rows. Both reconciliations are projections — no file rewrite.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from cdcrypt.table.lake import LakeTable, bucket_col

KEY_COLS = ["conv_id", "turn_idx"]


def _aligned_schema(table: LakeTable, batch: DataFrame) -> StructType:
    """Table schema extended with batch-only columns (add-column evolution)."""
    cur = table.schema
    have = {f.name for f in cur.fields}
    extra = [
        StructField(f.name, f.dataType, True)
        for f in batch.schema.fields
        if f.name not in have and f.name not in ("op", "bucket", "epoch")
    ]
    if not extra:
        return cur
    return StructType(list(cur.fields) + extra)


def merge_upsert(
    spark: SparkSession,
    table: LakeTable,
    resolved: DataFrame,
    epoch: int,
    broadcast: bool | None = None,
) -> dict:
    """Apply one resolved micro-batch; returns lineage metrics.

    ``resolved``: one row per (conv_id, turn_idx) with columns
    op, op_seq, epoch + after-image payload. Idempotent: epochs at or below
    ``table.committed_epoch`` are skipped (exactly-once under replay).
    """
    if epoch <= table.committed_epoch:
        return {"epoch": epoch, "skipped": True,
                "committed_epoch": table.committed_epoch}

    target = _aligned_schema(table, resolved)
    tcols = [f.name for f in target.fields]

    batch = resolved.withColumn("bucket", bucket_col(table.bucket_count))
    # project batch to target columns (+op/bucket); missing -> null
    bsel = [
        (F.col(c).cast(f.dataType) if c in resolved.columns
         else F.lit(None).cast(f.dataType)).alias(c)
        for c, f in zip(tcols, target.fields)
    ]
    batch = batch.select(*bsel, "op", "bucket").persist()
    dirty = {r["bucket"] for r in batch.select("bucket").distinct().collect()}

    current = table.read(spark, buckets=dirty, with_bucket=True)
    # old snapshot files may lack evolved columns: project through target
    csel = [
        (F.col(c).cast(f.dataType) if c in current.columns
         else F.lit(None).cast(f.dataType)).alias(c)
        for c, f in zip(tcols, target.fields)
    ]
    current = current.select(*csel, "bucket")

    b = F.broadcast(batch) if broadcast else batch
    j = current.alias("t").join(b.alias("b"), KEY_COLS, "full_outer")

    t_seq, b_seq = F.col("t.op_seq"), F.col("b.op_seq")
    take_batch = F.col("b.op").isNotNull() & (t_seq.isNull() | (b_seq > t_seq))
    is_delete = take_batch & (F.col("b.op") == "D")

    data_cols = [c for c in tcols if c not in KEY_COLS]
    merged = (
        j.where(~is_delete)
        .select(
            *KEY_COLS,
            *[
                F.when(take_batch, F.col(f"b.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
                for c in data_cols
            ],
            F.when(take_batch, F.col("b.bucket")).otherwise(F.col("t.bucket")).alias("bucket"),
        )
    )

    # ---- write dirty buckets (copy-on-write) ----
    next_version = table.version + 1
    rel_staging = os.path.join("data", f"v{next_version}")
    staging = os.path.join(table.root, rel_staging)
    (
        merged.repartition(F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(staging)
    )

    new_files = []
    new_rows = 0
    for p in sorted(glob.glob(os.path.join(staging, "bucket=*", "*.parquet"))):
        nrows = pq.ParquetFile(p).metadata.num_rows
        if nrows == 0:
            continue
        bkt = int(os.path.basename(os.path.dirname(p)).split("=")[1])
        new_files.append({
            "path": os.path.relpath(p, table.root),
            "bucket": bkt,
            "schema_id": None,  # commit() stamps the final schema id
            "rows": nrows,
        })
        new_rows += nrows

    keep_files = [f for f in table.snapshot["files"] if f["bucket"] not in dirty]

    batch_rows = batch.count()
    lineage = {
        "epoch": epoch,
        "batch_rows": batch_rows,
        "dirty_buckets": sorted(int(x) for x in dirty),
        "rows_written": int(new_rows),
        "buckets_rewritten": len({f["bucket"] for f in new_files}),
    }
    batch.unpersist()

    version = table.commit(
        epoch=epoch,
        keep_files=keep_files,
        new_files=new_files,
        lineage=lineage,
        new_schema=target,
    )
    lineage["version"] = version
    return lineage
