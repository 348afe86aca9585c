"""Streaming corpus profile: the bounded-state ProfileIndex ticked under
Spark's native streaming runtime.

(Named ``corpusprofile``, not ``profile``: ``streaming/pipeline.py`` is a
spark-submit entry script, so this directory lands at ``sys.path[0]`` in
deployed runs — a module named ``profile`` here shadows the stdlib module
of that name and breaks ``cProfile`` inside pyspark's own import chain.
Caught by tests/test_spark_submit.py.)

Same wiring as the near-dup streams (streaming/dedup.py): a schema'd
file tail -> ``foreachBatch`` -> per-batch index tick, with the batch-id
watermark recorded atomically with the state it covers. The watermark
guard matters MORE here than for the LSH indexes: HLL register growth is
idempotent (re-maxing the same batch changes nothing), but the moment
half of the state is a SUM — a redelivered batch folded twice would
double-count ``n_rows``/``n_nulls``/``sum_len`` silently, with no
downstream verify stage to catch it. The skip-if-covered check is the
whole exactly-once story.

Crash-consistency: unlike the append-only LSH artifacts, the profile
state is VERSIONED with an atomic meta flip (operators/profile.py), so
the uncovered-append window the dedup stream has to fail-fast on
(``check_index_covered``) does not exist here — a crash mid-tick leaves
a dangling ``v=N+1`` directory the meta never points to; the
redelivered batch recomputes against the still-current ``v=N`` and the
dangling dir is reclaimed on the next successful tick. No integrity
check is needed, by construction.

The SS checkpoint and the index watermark still form one recovery unit
(batch ids come from the offset log — see streaming/dedup.py for the
full contract); recover them together or rebuild the profile and start
a fresh checkpoint. Rebuild is cheap to reason about: the profile is
derivable by one :func:`~cdcrypt.operators.profile.profile_columns`
pass over the corpus-so-far.

By sketch-union exactness, the streamed profile after ANY micro-batching
of a corpus is bit-identical to the one-shot profile over the whole
corpus (tested end-to-end in tests/test_streaming_profile.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from cdcrypt.operators.profile import (
    ProfileIndex,
    read_profile,
    update_profile_index,
)
from cdcrypt.streaming.structured import run_file_stream


class StreamingProfile:
    """foreachBatch driver folding each micro-batch into a persisted
    :class:`~cdcrypt.operators.profile.ProfileIndex`.

    Parameters
    ----------
    index_root : a built ProfileIndex directory — seed a from-scratch
        stream with ``build_profile_index(df.limit(0), root, cols)``.
    source_dir : directory the file source tails for new parquet files.
    checkpoint_dir : Structured Streaming offset log.
    """

    def __init__(self, index_root: str, source_dir: str,
                 checkpoint_dir: str):
        self.index_root = index_root
        self.source_dir = source_dir
        self.checkpoint_dir = checkpoint_dir
        ProfileIndex(index_root)  # fail fast: must be built already

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        idx = ProfileIndex(self.index_root)  # reread meta: fresh watermark
        if int(batch_id) <= int(idx.meta.get("last_batch_id", -1)):
            return  # redelivery: folding again would double-count moments
        update_profile_index(idx, batch_df,
                             meta_extra={"last_batch_id": int(batch_id)})

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

    def read(self, spark: SparkSession) -> DataFrame:
        """The profile of everything ingested so far — persisted state
        only, never a rescan of the data."""
        return read_profile(spark, ProfileIndex(self.index_root))
