"""Near-dup detection as a Structured Streaming job.

The persisted LSH indexes (MinHashIndex for text, EmbeddingLSHIndex for
vectors) already make per-batch near-dup detection O(batch): each tick
queries the index for verified pairs against everything ingested so far,
then joins it. This module wires those ticks under Spark's native
streaming runtime, the same shape as StructuredIngest (structured.py):

    readStream.schema(S).parquet(dir)             # document/vector tail
      .writeStream.foreachBatch(apply_batch)      # tick: query -> sink -> grow
      .option("checkpointLocation", ckpt)         # SS offset log
      .trigger(availableNow=True | processingTime=...)

Per micro-batch, ``apply_batch``:

1. skips if the index meta's ``last_batch_id`` >= this batch id — a batch
   that completed but whose SS offset commit was lost is redelivered and
   must not re-grow the index (the id-disjointness contract) or re-emit
   its pairs;
2. runs the dedup tick with ``on_pairs`` writing the verified pairs to
   ``pairs_dir/epoch=<batch_id>`` (mode=overwrite of THAT directory — a
   re-run of the same batch replaces, never duplicates);
3. lets the tick grow the index, recording ``last_batch_id`` in the meta
   JSON atomically with the append counter (``meta_extra``).

Crash-consistency: the ordering is pairs-durable FIRST, index+watermark
SECOND. A batch that dies before the index grows is redelivered by
Structured Streaming, recomputed against the unchanged index, and its
epoch directory is overwritten — exactly-once pairs, exactly-once index
growth. The remaining window is a crash BETWEEN the append job's commit
and the meta write (or mid-append before the writer's job-commit rename):
the index then holds banded rows with no watermark covering them, and the
redelivered batch would append a second copy. That window is the price of
a manifest-less artifact; it is single-writer-narrow, detectable
(``appends`` > ticks covered by ``last_batch_id``), and recovery is an
index rebuild — the same contract as the build step itself. The CDC lake
(table/lake.py) closes the analogous window with epoch-keyed atomic
commits; the LSH artifacts deliberately stay plain parquet + one meta
JSON because their contents are derivable (rebuild == re-running the
signature pass).

The SS checkpoint and the index watermark form ONE recovery unit: batch
ids are assigned by the offset log, so restoring or rebuilding the
checkpoint without the matching index (or vice versa) re-numbers batches
against a stale watermark — old files can re-append and new files can be
skipped, silently. Recover them together, or rebuild the index and start
a fresh checkpoint. (The CDC ingest has the identical contract between
its checkpoint and the lake's committed_epoch.)

Streamed ticks lose nothing vs a nightly batch job: the union of per-tick
pairs over ANY micro-batching of a corpus equals the one-shot pipeline's
pairs (tested at the tick level in test_minhash_index.py /
test_embedding_index.py, and end-to-end through SS here in
tests/test_streaming_dedup.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from cdcrypt.operators.docdedup import MinHashIndex, minhash_dedup_tick
from cdcrypt.operators.similarity import (
    EmbeddingLSHIndex,
    embedding_dedup_tick,
)
from cdcrypt.streaming.structured import run_file_stream

_KINDS = {
    "minhash": (MinHashIndex, minhash_dedup_tick),
    "embedding": (EmbeddingLSHIndex, embedding_dedup_tick),
}


class StreamingNearDup:
    """foreachBatch driver for streaming near-dup detection over a
    persisted LSH index.

    Parameters
    ----------
    index_root : a built MinHashIndex / EmbeddingLSHIndex directory (build
        it first, possibly on an empty corpus — the from-scratch streaming
        case; pass ``dim`` to the embedding build then).
    source_dir : directory the file source tails for new parquet batches.
    pairs_dir : near-dup pairs land in ``pairs_dir/epoch=<batch_id>/``;
        read them back with :meth:`read_pairs` (epoch is a partition
        column, so downstream consumers can tail new epochs).
    checkpoint_dir : Structured Streaming offset log.
    kind : 'minhash' (text) or 'embedding' (vectors).
    tick_kwargs : forwarded to the tick (e.g. ``max_bucket_size``,
        ``threshold`` for embeddings).
    """

    def __init__(self, index_root: str, source_dir: str, pairs_dir: str,
                 checkpoint_dir: str, kind: str = "minhash",
                 tick_kwargs: dict | None = None):
        if kind not in _KINDS:
            raise ValueError(f"kind {kind!r} must be one of {set(_KINDS)}")
        self.index_cls, self._tick = _KINDS[kind]
        self.index_root = index_root
        self.source_dir = source_dir
        self.pairs_dir = pairs_dir
        self.checkpoint_dir = checkpoint_dir
        self.kind = kind
        self.tick_kwargs = dict(tick_kwargs or {})
        self.index_cls(index_root)  # fail fast: must be built already

    def _epoch_dir(self, batch_id: int) -> str:
        return os.path.join(self.pairs_dir, f"epoch={int(batch_id)}")

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        idx = self.index_cls(self.index_root)  # reread meta: fresh watermark
        if int(batch_id) <= int(idx.meta.get("last_batch_id", -1)):
            return  # SS redelivery of a completed batch -> idempotent skip
        epoch_dir = self._epoch_dir(batch_id)

        def sink(pairs: DataFrame) -> None:
            # overwrite of the per-epoch directory, not of pairs_dir: a
            # redelivered half-done batch replaces its own output only
            pairs.write.mode("overwrite").parquet(epoch_dir)

        self._tick(batch_df.sparkSession, idx, batch_df,
                   meta_extra={"last_batch_id": int(batch_id)},
                   on_pairs=sink, **self.tick_kwargs)

    def run_stream(
        self,
        spark: SparkSession,
        schema: StructType,
        *,
        available_now: bool = True,
        processing_time: str | None = None,
        max_files_per_trigger: int | None = None,
    ):
        """Start (and for ``available_now`` await) the streaming query."""
        return run_file_stream(
            spark, self.source_dir, schema, self.apply_batch,
            self.checkpoint_dir, available_now=available_now,
            processing_time=processing_time,
            max_files_per_trigger=max_files_per_trigger,
        )

    def read_pairs(self, spark: SparkSession) -> DataFrame:
        """All pairs emitted so far, with their ``epoch`` partition column
        (which micro-batch surfaced each pair)."""
        if not any(e.startswith("epoch=")
                   for e in (os.listdir(self.pairs_dir)
                             if os.path.isdir(self.pairs_dir) else ())):
            # the pair schema is only known once a tick has run — fail
            # with the actual state instead of a parquet PATH_NOT_FOUND
            raise FileNotFoundError(
                f"no pairs emitted yet under {self.pairs_dir} "
                "(no micro-batch has completed)")
        return spark.read.option("basePath", self.pairs_dir).parquet(
            self.pairs_dir)
