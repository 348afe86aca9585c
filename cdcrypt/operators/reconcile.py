"""Source-vs-lake reconciliation (anti-entropy repair).

A long-running CDC pipeline drifts from its source for reasons the log
cannot fix: binlog retention truncated a gap the resume missed, an
operator replayed the wrong epoch range, a source-side bulk load was
done with logging disabled (``ALTER TABLE ... NOLOGGING``, file
imports), or the lake was restored from an older snapshot. The standard
repair is Debezium's ad-hoc *incremental snapshot* / DBLog's chunked
re-read: take a fresh consistent snapshot of the source and emit
CORRECTIVE change events for exactly the rows that differ — never a
truncate-and-reload, which would break downstream incremental readers
(the change feed sees only the drift, not a full rewrite).

The reference SMT delegates this to Debezium signals; this engine owns
the pipeline, so it owns reconciliation (SURVEY §2.3 P1/P5 extension):

- **diff by fingerprint, not payload**: both sides reduce to
  ``(key, xxhash64-of-payload)`` before the full-outer join, so the
  shuffle ships 8-byte hashes instead of transcript text. Matching rows
  — the overwhelming majority in steady state — die inside the join and
  never reach a payload fetch. At 100 TB of table and a handful of
  drifted rows, the exchanged bytes are O(keys), not O(table).
- **candidate-proportional payload fetch**: the corrective after-images
  are fetched from the snapshot with the (usually tiny) diff-key set
  broadcast — the snapshot is scanned a second time but never shuffled.
  Above ``broadcast_max_diff`` differing keys (first-run or
  catastrophic drift) the plan falls back to carrying the payload
  through a single shuffled join instead of broadcasting a corpus-sized
  key set (the conditional-broadcast contract from
  operators/similarity.py).
- **corrections are ordinary change events**: op 'U' for missing or
  mismatched rows, op 'D' for rows the source no longer has, all at the
  snapshot's watermark ``op_seq`` — so they flow through the SAME LWW
  merge as the stream (operators/merge.py), stay idempotent under
  replay, and order correctly against concurrent change events (an
  event newer than the snapshot watermark wins over the correction, as
  it must: the snapshot did not see it).

Null handling: the payload fingerprint interleaves a per-column null
marker with the value because Spark's ``xxhash64`` SKIPS null inputs —
without markers ``(null, 'a')`` and ``('a', null)`` would fingerprint
identically and the drift would be invisible. Key columns must be
non-null (the same contract as the merge engine's key).

Columns present in the snapshot but not yet in the lake read (source
added a column ahead of the lake's schema evolution) compare as NULL on
the lake side, so rows where the source filled the new column surface
as mismatches and the correction carries the value — reconciliation
doubles as the backfill path for add-column evolution.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cdcrypt.table.lake import LakeTable

__all__ = [
    "row_fingerprint",
    "reconcile_diff",
    "reconcile_events",
    "reconcile_table",
    "reconcile_table_chunked",
]

#: above this many differing keys the payload fetch stops broadcasting
#: the key set and carries payloads through a shuffled join instead
DEFAULT_BROADCAST_MAX_DIFF = 2_000_000


def row_fingerprint(cols: list[Column | str]) -> Column:
    """64-bit content fingerprint of a row slice, null-disambiguated.

    ``xxhash64(isnull(c1), c1, isnull(c2), c2, ...)``: the interleaved
    markers are never null, so a null in one position cannot collide
    with the same values shifted (Spark's hash functions skip nulls).
    Pure Column — whole-stage codegen, no UDF.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.xxhash64(
        *chain.from_iterable((c.isNull().cast("int"), c) for c in cs))


#: change-event metadata names — bookkeeping, not content. Excluded from
#: the comparison (a lake row's stored op_seq is the position of the event
#: that wrote it, not part of the source row) and from corrective payloads
#: (reconcile_events emits its own op/op_seq/epoch head).
RESERVED_META = frozenset({"op", "op_seq", "epoch"})


def _common_payload(lake: DataFrame, snapshot: DataFrame,
                    key_cols: list[str],
                    compare_cols: list[str] | None) -> list[str]:
    snap_payload = [c for c in snapshot.columns
                    if c not in key_cols and c not in RESERVED_META]
    if compare_cols is not None:
        bad = set(compare_cols) & RESERVED_META
        if bad:
            raise ValueError(
                f"compare_cols may not include change-event metadata "
                f"{sorted(bad)} — it is not source-row content")
        missing = set(compare_cols) - set(snap_payload)
        if missing:
            raise ValueError(
                f"compare_cols not in snapshot payload: {sorted(missing)}")
        return list(compare_cols)
    return snap_payload


def _aligned_lake_cols(lake: DataFrame, snapshot: DataFrame,
                       payload: list[str]) -> list[Column]:
    """Lake-side payload columns cast to the snapshot's types; columns
    the lake does not have yet read as typed NULLs (add-column drift)."""
    snap_types = {f.name: f.dataType for f in snapshot.schema.fields}
    have = set(lake.columns)
    out = []
    for c in payload:
        if c in have:
            out.append(F.col(c).cast(snap_types[c]).alias(c))
        else:
            out.append(F.lit(None).cast(snap_types[c]).alias(c))
    return out


def reconcile_diff(
    lake_state: DataFrame,
    snapshot: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classified drift between current lake state and a fresh source
    snapshot: one row per differing key with columns
    ``*key_cols, reason`` where reason is ``'missing'`` (source has it,
    lake does not), ``'mismatch'`` (both have it, payload differs) or
    ``'extra'`` (lake has it, source does not — the row was deleted at
    the source and the stream missed the delete).

    Fingerprint-only: neither side's payload leaves its scan — the join
    exchanges ``(key, hash)`` pairs and equal rows are dropped inside
    it. ``compare_cols`` restricts the comparison (default: every
    snapshot column that is not a key).
    """
    payload = _common_payload(lake_state, snapshot, key_cols, compare_cols)
    keys = [F.col(k) for k in key_cols]
    lk = lake_state.select(
        *keys, row_fingerprint(
            _aligned_lake_cols(lake_state, snapshot, payload)).alias("__lh"))
    sk = snapshot.select(*keys, row_fingerprint(payload).alias("__sh"))
    j = lk.alias("l").join(sk.alias("s"), key_cols, "full_outer")
    reason = (
        F.when(F.col("l.__lh").isNull(), F.lit("missing"))
        .when(F.col("s.__sh").isNull(), F.lit("extra"))
        .when(F.col("l.__lh") != F.col("s.__sh"), F.lit("mismatch"))
    )
    return (j.select(*key_cols, reason.alias("reason"))
             .where(F.col("reason").isNotNull()))


def reconcile_events(
    lake_state: DataFrame,
    snapshot: DataFrame,
    key_cols: list[str],
    op_seq: int,
    epoch: int = 0,
    compare_cols: list[str] | None = None,
    broadcast_max_diff: int | None = DEFAULT_BROADCAST_MAX_DIFF,
) -> DataFrame:
    """Corrective change events that bring ``lake_state`` to
    ``snapshot``: columns ``op, op_seq, epoch, *key_cols, *payload``
    (op 'U' carries the snapshot after-image; op 'D' carries typed
    NULLs). ``op_seq`` is the snapshot's consistency watermark — the
    binlog position the snapshot transaction saw (bootstrap.py's
    watermark contract): concurrent stream events above it correctly
    beat the corrections under LWW.

    Plan: fingerprint diff (hash-only shuffle), then payload fetch.
    With at most ``broadcast_max_diff`` differing keys the diff is
    materialized (localCheckpoint) and BROADCAST against the snapshot —
    the 100-TB snapshot is re-scanned but never shuffled. Above the
    threshold (or with ``broadcast_max_diff=None``) payloads ride the
    full-outer join itself: one shuffle of the snapshot payload +
    lake fingerprints, no second scan, no broadcast — the
    first-run/catastrophic-drift shape.
    """
    payload = _common_payload(lake_state, snapshot, key_cols, compare_cols)
    snap_types = {f.name: f.dataType for f in snapshot.schema.fields}

    def null_payload():
        return [F.lit(None).cast(snap_types[c]).alias(c) for c in payload]

    head = [
        F.lit(int(op_seq)).cast("long").alias("op_seq"),
        F.lit(int(epoch)).cast("long").alias("epoch"),
    ]

    use_broadcast = False
    diff = None
    if broadcast_max_diff is not None:
        # hash-only diff, pinned so the count and the reuse below are
        # one computation (it is small in steady state; if it is not,
        # we are about to throw it away anyway)
        diff = reconcile_diff(
            lake_state, snapshot, key_cols, compare_cols).localCheckpoint()
        use_broadcast = diff.count() <= int(broadcast_max_diff)

    if use_broadcast:
        up_keys = diff.where(F.col("reason") != "extra").drop("reason")
        upserts = snapshot.join(F.broadcast(up_keys), key_cols, "left_semi")
        ups = upserts.select(F.lit("U").alias("op"), *head,
                             *key_cols, *payload)
        dels = (diff.where(F.col("reason") == "extra")
                .select(F.lit("D").alias("op"), *head,
                        *key_cols, *null_payload()))
        return ups.unionByName(dels)

    # payload-carrying fallback: one full-outer join, snapshot payload
    # shuffles once, lake side still ships fingerprints only
    keys = [F.col(k) for k in key_cols]
    lk = lake_state.select(
        *keys, row_fingerprint(
            _aligned_lake_cols(lake_state, snapshot, payload)).alias("__lh"))
    sp = snapshot.select(
        *keys, row_fingerprint(payload).alias("__sh"), *payload)
    j = lk.alias("l").join(sp.alias("s"), key_cols, "full_outer")
    extra = F.col("s.__sh").isNull()
    differs = (F.col("l.__lh").isNull()
               | extra
               | (F.col("l.__lh") != F.col("s.__sh")))
    return j.where(differs).select(
        F.when(extra, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        *head, *key_cols,
        *[F.when(extra, F.lit(None).cast(snap_types[c]))
          .otherwise(F.col(f"s.{c}")).alias(c) for c in payload],
    )


def reconcile_table(
    spark: SparkSession,
    table: LakeTable,
    snapshot: DataFrame,
    op_seq: int,
    epoch: int,
    compare_cols: list[str] | None = None,
    broadcast_max_diff: int | None = DEFAULT_BROADCAST_MAX_DIFF,
    mode: str = "mor",
    **merge_kwargs,
) -> dict:
    """End-to-end repair: diff the table's current state against a
    fresh source snapshot and MERGE the corrective events as epoch
    ``epoch``. Returns the merge lineage plus a ``reconcile`` block
    (corrections applied by op). Idempotent like any epoch: replaying
    the same reconciliation epoch is skipped by the committed-epoch
    guard, and re-running a fresh one against a repaired table produces
    zero corrections.
    """
    from cdcrypt.operators.merge import merge_upsert

    events = reconcile_events(
        table.read(spark), snapshot, table.key_cols, op_seq, epoch,
        compare_cols, broadcast_max_diff)
    # pin: merge reads the batch more than once (bucket layout + stats),
    # and the diff plan holds two scans of the table being rewritten
    events = events.localCheckpoint()
    by_op = {r["op"]: r["n"] for r in
             events.groupBy("op").agg(F.count("*").alias("n")).collect()}
    lineage = merge_upsert(spark, table, events, epoch, mode=mode,
                           **merge_kwargs)
    lineage["reconcile"] = {
        "upserts": int(by_op.get("U", 0)),
        "deletes": int(by_op.get("D", 0)),
        "watermark_op_seq": int(op_seq),
    }
    return lineage


def reconcile_table_chunked(
    spark: SparkSession,
    table: LakeTable,
    snapshot_for,
    epoch_start: int,
    chunk_buckets: int = 8,
    max_chunks: int | None = None,
    compare_cols: list[str] | None = None,
    broadcast_max_diff: int | None = DEFAULT_BROADCAST_MAX_DIFF,
    mode: str = "mor",
    **merge_kwargs,
) -> list[dict]:
    """Chunked repair — DBLog's incremental re-read, bucket-aligned.

    One repeatable-read transaction over a 100-TB source is not a thing:
    DBLog (Andradottir et al., Netflix 2019) and Debezium's incremental
    snapshots read the source in CHUNKS, each consistent as of its OWN
    log position, and interleave the chunks with live change events.
    This driver maps the chunk axis onto the table's bucket layout so
    every chunk repairs a disjoint key range with file-pruned reads:

    - ``snapshot_for(bucket_ids) -> (DataFrame, watermark)`` reads the
      source rows whose keys hash into those buckets (a range-sliced
      ``SELECT`` in a real source), consistent as of ``watermark``;
    - the lake side is ``table.read(buckets=...)`` — manifest-pruned to
      the chunk's files, so a chunk never scans the other 99%;
    - the chunk's corrective events carry the chunk's OWN watermark,
      exactly the per-chunk high-watermark rule that makes DBLog's
      interleaving correct: a live event newer than the chunk's read
      beats the correction, an older one loses;
    - each chunk commits as its own epoch (``epoch_start + i``), so the
      standard committed-epoch guard gives crash-resume for free — a
      re-run skips repaired chunks without recomputing their diffs, and
      live stream epochs can interleave between chunks (the caller
      allocates a disjoint epoch range, same as any second writer);
    - ``max_chunks`` bounds one invocation (operational pacing: repair
      N chunks, let the stream catch up, continue).

    The snapshot side is belt-and-braces filtered to the chunk's
    buckets (pure Column over the already-chunked read), so a sloppy
    ``snapshot_for`` cannot turn out-of-chunk rows into spurious
    'missing' corrections.

    Commits go through :func:`~cdcrypt.operators.merge.merge_upsert_retrying`:
    a repair job racing the live ingest pipeline is exactly the
    multi-writer commit-conflict case, and losing a race must recompute
    the chunk against the stream's new snapshot, not error out.

    Returns one lineage per processed chunk (skipped chunks included,
    marked)."""
    from cdcrypt.operators.merge import merge_upsert_retrying
    from cdcrypt.table.lake import bucket_col

    if chunk_buckets < 1:
        raise ValueError("chunk_buckets must be >= 1")
    total = table.bucket_count
    chunks = [list(range(lo, min(lo + chunk_buckets, total)))
              for lo in range(0, total, chunk_buckets)]
    out: list[dict] = []
    done = 0
    for i, chunk in enumerate(chunks):
        if max_chunks is not None and done >= max_chunks:
            break
        epoch = epoch_start + i
        table = table.refresh()
        if epoch <= table.committed_epoch:
            out.append({"epoch": epoch, "skipped": True,
                        "chunk": (chunk[0], chunk[-1])})
            continue
        snap_chunk, watermark = snapshot_for(list(chunk))
        snap_chunk = snap_chunk.where(
            bucket_col(total, table.bucket_by).isin(*chunk))
        lake_chunk = table.read(spark, buckets=set(chunk))
        events = reconcile_events(
            lake_chunk, snap_chunk, table.key_cols, int(watermark), epoch,
            compare_cols, broadcast_max_diff).localCheckpoint()
        by_op = {r["op"]: r["n"] for r in
                 events.groupBy("op").agg(F.count("*").alias("n")).collect()}
        lineage = merge_upsert_retrying(spark, table, events, epoch,
                                        mode=mode, **merge_kwargs)
        lineage["reconcile"] = {
            "upserts": int(by_op.get("U", 0)),
            "deletes": int(by_op.get("D", 0)),
            "watermark_op_seq": int(watermark),
            "chunk": (chunk[0], chunk[-1]),
        }
        out.append(lineage)
        done += 1
    return out
