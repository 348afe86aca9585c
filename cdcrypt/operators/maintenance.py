"""Table maintenance: clustered rewrite (major compaction + sort clustering).

The reference SMT (rerorero/kafka-connect-transform-encrypt) has no table
format — Kafka Connect owns its sinks — so this module has no reference
counterpart; it rebuilds the maintenance surface Iceberg gives its tables
(`rewrite_data_files` with sort order) for the cdcrypt lake, because a CDC
table that ingests forever degrades without it:

- **MoR debt**: every epoch appends delta files; bucket-local compaction
  (operators/merge.py) bounds *depth*, but the bases it writes are ordered
  by arrival, not by anything a reader filters on.
- **Scan pruning**: manifest column bounds (table/lake.py `files()`) prune
  files only as well as the data is clustered — on arrival-ordered files
  every file spans ~the full `ts`/`op_seq` range and nothing prunes. One
  clustered rewrite makes the per-file bounds tight and disjoint, so a
  time-range scan opens O(range) files instead of O(table).
- **File sizing**: `max_records_per_file` splits each bucket into
  contiguous sorted chunks — the bin-packing lever. At 100 TB the rewrite
  is one shuffle (bucket repartition) + a local sort per bucket, runs
  bucket-parallel, and never touches the driver with data.

Scale contract: the rewrite reads the RESOLVED table once, shuffles once
on the bucket column (the same exchange every merge pays), sorts within
partitions (spillable), and writes sequentially. Snapshot isolation makes
it non-blocking for readers; `stage_only=True` makes it auditable
(write-audit-publish) before the pointer swaps.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from cdcrypt.operators.merge import (
    LAKE_CODEC, _stats_cols, _write_bucketed,
)
from cdcrypt.table.lake import LakeTable, LakeTableError, repartition_by_bucket


def rewrite_clustered(
    spark: SparkSession,
    table: LakeTable,
    sort_by: list[str] | tuple[str, ...],
    *,
    max_records_per_file: int | None = None,
    stage_only: bool = False,
    codec: str = LAKE_CODEC,
) -> dict:
    """Rewrite every live row of ``table`` into base files clustered by
    ``sort_by`` within each bucket; commit as one new snapshot.

    Effects on the snapshot it produces:

    - all live data sits in ``kind='base'`` files, one-or-more per bucket
      (``max_records_per_file`` splits a bucket into contiguous sorted
      chunks), zero live deltas — reads are plain scans, no MoR resolve;
    - manifest bounds for the table keys AND ``sort_by`` are tight and
      (within a bucket) disjoint across split files, so ``read(key_range=
      {sort_col: (lo, hi)})`` prunes from metadata alone — and because no
      live deltas remain, ``key_range`` accepts NON-key columns too
      (table/lake.py relaxes the key-only rule for delta-free snapshots);
    - uncompacted delta files are retained as log-only entries
      (``compacted=True``) so the incremental change feed keeps serving
      every window — same contract as merge-time compaction
      (operators/merge.py); replaced base files are dropped and reclaimed
      by the next ``expire_snapshots``;
    - ``committed_epoch`` is preserved: a rewrite is data movement, not a
      logical change, and must not disturb exactly-once ingest resume.

    Returns the commit lineage (version, rows, file counts, timings).
    """
    import time

    sort_by = list(sort_by)
    tcols = [f.name for f in table.schema.fields]
    missing = [c for c in sort_by if c not in tcols]
    if missing:
        raise LakeTableError(
            f"sort_by columns {missing} not in table schema {tcols}")

    t0 = time.monotonic()
    snap = table.snapshot
    live = table.read(spark).select(*tcols)
    clustered = repartition_by_bucket(
        live, table.bucket_count, table.bucket_by
    ).sortWithinPartitions(*sort_by)

    next_version = table.version + 1
    staging = os.path.join(table.root, "data", f"v{next_version}", "rewrite")
    stats = tuple(dict.fromkeys([*_stats_cols(table, live), *sort_by]))
    timings: dict = {}
    new_files, rows = _write_bucketed(
        clustered, staging, table.root, table.bucket_count, "base",
        assume_bucketed=True, codec=codec, timings=timings,
        bucket_by=table.bucket_by, stats_cols=stats,
        max_records_per_file=max_records_per_file)

    # keep uncompacted deltas as log-only feed history; drop replaced bases
    keep = [dict(f, compacted=True)
            if f.get("kind", "base") == "delta" and not f.get("compacted")
            else f
            for f in snap["files"] if f.get("kind", "base") == "delta"]

    old_files = snap["files"]
    lineage = {
        "mode": "rewrite",
        "sort_by": sort_by,
        "batch_rows": 0,
        "rows_written": int(rows),
        "files_before": len([f for f in old_files
                             if f.get("kind", "base") == "base"
                             or not f.get("compacted")]),
        "files_after": len(new_files),
        "max_records_per_file": max_records_per_file,
    }
    version = table.commit(
        epoch=table.committed_epoch, keep_files=keep, new_files=new_files,
        lineage=lineage, stage_only=stage_only)
    timings["rewrite_total_sec"] = round(time.monotonic() - t0, 3)
    lineage["version"] = version
    lineage["staged"] = bool(stage_only)
    lineage["timings"] = timings
    return lineage
