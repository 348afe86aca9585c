"""Streaming incremental corpus curation: the one-shot ``curate_corpus``
composition (operators/curation.py) maintained per ingest tick as a CDC
stream of curated-corpus upserts — the engine eating its own dog food.

Per micro-batch of new documents (VERDICT r3 item 4):

1. near-dup pairs of the batch against everything ingested so far come
   from the persisted MinHash index in O(batch)
   (``minhash_candidates_incremental``);
2. component labels update INCREMENTALLY: the union-find runs over the
   new pairs plus one STAR EDGE ``(member, component)`` per member of
   each touched component — star edges preserve the prior graph's
   connectivity, and the component label (minimum id) is stable under
   merges (min of a union is the min of the mins), so incremental labels
   equal the one-shot labels over all pairs;
3. per-document stats (text length for the survivor pick, token count,
   quality, language) are computed ONCE on arrival and kept in a docmeta
   STATE table — later reclustering never needs the original text again;
4. the curated output is re-derived for affected components only and
   emitted as upserts: ``U`` rows for the new curated state of touched
   clusters, ``D`` rows for documents that stop being curated survivors
   (displaced by a longer variant, or their cluster's survivor fails a
   quality/language gate).

Both the docmeta state and the curated output are the engine's OWN lake
tables (merge-on-read upserts keyed by doc_id, op_seq = epoch), so
exactly-once falls out of the lake's epoch-gated commits and reading the
curated table IS the application of all deltas: after any sequence of
ticks, ``read_curated()`` equals one-shot ``curate_corpus`` over the
full corpus (tested under Structured Streaming in
tests/test_streaming_curation.py, and oracle-gated as
``curation_incremental``).

Crash ordering mirrors streaming/dedup.py, with the lake gates making it
stronger: state merge and output merge commit FIRST (both idempotent —
an epoch at or below committed_epoch is skipped), the index append runs
LAST and records the batch watermark atomically with its growth. A batch
redelivered after any crash recomputes against the unchanged index and
its lake merges no-op if already committed. The one remaining torn
window (index data committed, meta write lost) is auto-detected at
stream start (streaming/dedup.check_index_covered).

Per-tick cost at scale: the pair query is O(batch) (broadcast probe of
the index); the component update touches only affected clusters; state
reads are BUCKET-PRUNED to the affected doc ids for the endpoint lookup,
plus one column-pruned scan of the docmeta table filtered by affected
component (docmeta rows are ~50 bytes/doc — a component-keyed secondary
layout would remove that scan and is the natural next optimization);
lake merges are MoR delta appends, O(batch + affected).

Hot-bucket-cap caveat: with ``max_bucket_size`` set, tick-time caps are
as-of caps (the same contract as ``minhash_dedup_tick``); run uncapped
or accept the as-of semantics when comparing against a one-shot run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cdcrypt.functions.sampling import split_case, unit_hash
from cdcrypt.functions.text import lang_id, quality_score, token_count
from cdcrypt.operators.docdedup import (
    MinHashIndex,
    append_to_minhash_index,
    connected_components,
    minhash_candidates_incremental,
)
from cdcrypt.operators.merge import merge_upsert
from cdcrypt.streaming.structured import run_file_stream
from cdcrypt.table.lake import LakeTable, LakeTableNotFound, bucket_col

# docmeta state: everything later reclustering needs, text-free.
# _len mirrors dedup_near's coalesce(length(text), -1) exactly so the
# survivor pick min(struct(-_len, id)) is bit-identical to the one-shot.
STATE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("op_seq", LongType()),
    StructField("_len", LongType()),
    StructField("n_tokens", LongType()),
    StructField("quality", DoubleType()),
    StructField("lang_guess", StringType()),
    StructField("component", LongType()),
])

CURATED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("op_seq", LongType()),
    StructField("component", LongType()),
    StructField("n_in_cluster", LongType()),
    StructField("n_tokens", LongType()),
    StructField("quality", DoubleType()),
    StructField("lang_guess", StringType()),
    StructField("split", StringType()),
])

CURATED_COLS = ("doc_id", "component", "n_in_cluster", "n_tokens",
                "quality", "lang_guess", "split")


def _open_or_create(root: str, schema: StructType,
                    bucket_count: int) -> LakeTable:
    try:
        return LakeTable(root)
    except LakeTableNotFound:
        return LakeTable.create(root, schema, bucket_count=bucket_count,
                                bucket_by="doc_id", key_cols=["doc_id"])


class StreamingCuration:
    """Maintain a curated training corpus incrementally over a document
    stream. Construct with a BUILT MinHash index (possibly empty — pass
    the index of an empty corpus for the from-scratch case); state and
    output lake tables are created on first use.

    ``weights``/``min_quality``/``langs``/``salt`` carry
    :func:`cdcrypt.operators.curation.curate_corpus` semantics verbatim.
    """

    def __init__(self, index_root: str, state_root: str, out_root: str,
                 weights: dict[str, float], min_quality: float = 0.0,
                 langs: tuple[str, ...] | None = None,
                 id_col: str = "doc_id", text_col: str = "text",
                 salt: str = "split-v1",
                 max_bucket_size: int | None = None,
                 bucket_count: int = 16,
                 source_dir: str | None = None,
                 checkpoint_dir: str | None = None,
                 integrity_check: bool = True):
        self.index_root = index_root
        self.state_root = state_root
        self.out_root = out_root
        self.weights = dict(weights)
        self.min_quality = float(min_quality)
        self.langs = tuple(langs) if langs is not None else None
        if id_col != "doc_id":
            # the state/output lake schemas are doc_id-keyed; generalizing
            # the key column means parameterizing those schemas too
            raise ValueError("StreamingCuration currently requires "
                             "id_col='doc_id'")
        self.id_col = id_col
        self.text_col = text_col
        self.salt = salt
        self.max_bucket_size = max_bucket_size
        self.bucket_count = bucket_count
        self.source_dir = source_dir
        self.checkpoint_dir = checkpoint_dir
        MinHashIndex(index_root)  # fail fast: must be built already
        if integrity_check:
            from cdcrypt.streaming.dedup import check_index_covered
            check_index_covered(index_root, "minhash")

    # ---------- the tick ----------

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """One curated-delta tick; usable directly for batch-mode
        incremental curation and as the foreachBatch body under
        Structured Streaming."""
        spark = batch_df.sparkSession
        epoch = int(batch_id)
        idx = MinHashIndex(self.index_root)  # reread: fresh watermark
        if epoch <= int(idx.meta.get("last_batch_id", -1)):
            return  # redelivery of a fully-completed batch
        state = _open_or_create(self.state_root, STATE_SCHEMA,
                                self.bucket_count)
        out = _open_or_create(self.out_root, CURATED_SCHEMA,
                              self.bucket_count)
        ic, tc = self.id_col, self.text_col

        batch = batch_df.select(ic, tc).localCheckpoint()

        # 1) near-dup pairs involving this batch, O(batch) via the index
        pairs = minhash_candidates_incremental(
            spark, idx, batch,
            max_bucket_size=self.max_bucket_size,
        ).select("id_a", "id_b").localCheckpoint()

        # 2) prior components touched by the new pairs: endpoint lookup is
        #    BUCKET-PRUNED (endpoints are batch-proportional), then one
        #    component-filtered pass collects every member of every
        #    touched component (all of whose labels may change)
        endpoint_ids = (
            pairs.select(F.col("id_a").alias(ic))
            .union(pairs.select(F.col("id_b").alias(ic)))
            .distinct().localCheckpoint()
        )
        ep_buckets = {
            r["b"] for r in endpoint_ids.select(
                bucket_col(state.bucket_count,
                           state.bucket_by).alias("b")).distinct().collect()
        }
        old_state_cols = [ic, "_len", "n_tokens", "quality", "lang_guess",
                          "component"]
        if ep_buckets and state.snapshot["files"]:
            touched_comps = (
                state.read(spark, buckets=ep_buckets)
                .join(F.broadcast(endpoint_ids), ic)
                .select("component").distinct()
            )
            affected_old = (
                state.read(spark)
                .join(F.broadcast(touched_comps), "component")
                # a redelivered batch whose STATE merge already committed
                # (crash between the two lake commits) finds its own docs
                # in state — batch docs always come from batch_meta, never
                # twice (their state copy carries identical values)
                .join(F.broadcast(batch.select(ic)), ic, "left_anti")
                .select(*old_state_cols)
                .localCheckpoint()
            )
        else:
            affected_old = spark.createDataFrame(
                [], StructType([f for f in STATE_SCHEMA.fields
                                if f.name != "op_seq"])
            ).select(*old_state_cols)

        # 3) incremental component labels: new pairs + star edges of the
        #    prior structure; docs in no edge stay their own singleton
        star = affected_old.select(F.col(ic).alias("id_a"),
                                   F.col("component").alias("id_b"))
        labels = (
            connected_components(pairs.union(star))
            .withColumnRenamed("node", ic)
        )

        batch_meta = batch.select(
            ic,
            F.coalesce(F.length(tc), F.lit(-1)).cast("long").alias("_len"),
            token_count(F.col(tc)).cast("long").alias("n_tokens"),
            quality_score(F.col(tc)).alias("quality"),
            lang_id(F.col(tc)).alias("lang_guess"),
        )
        new_meta = (
            batch_meta.unionByName(affected_old.drop("component"))
            .join(labels, ic, "left")
            .withColumn("component",
                        F.coalesce("component", F.col(ic)).cast("long"))
            .localCheckpoint()
        )

        # 4) state upsert (idempotent: lake epoch gate skips replays)
        merge_upsert(
            spark, state,
            new_meta.withColumn("op", F.lit("U"))
                    .withColumn("op_seq", F.lit(epoch).cast("long")),
            epoch=epoch, mode="mor")

        # 5) curated recompute for affected components only — identical
        #    expressions to curate_corpus: survivor min(struct(-_len, id)),
        #    filters on the survivor's stats, split hashed on the component
        agg = (
            new_meta.groupBy("component")
            .agg(F.min(F.struct((-F.col("_len")).alias("n"),
                                F.col(ic).alias("i"))).alias("w"),
                 F.count(F.lit(1)).alias("n_in_cluster"))
            .select(F.col("w.i").alias(ic), "component", "n_in_cluster")
        )
        curated = agg.join(
            new_meta.select(ic, "n_tokens", "quality", "lang_guess"), ic)
        if self.min_quality > 0.0:
            curated = curated.where(
                F.col("quality") >= F.lit(self.min_quality))
        if self.langs is not None:
            curated = curated.where(
                F.col("lang_guess").isin(list(self.langs)))
        curated = (
            curated.withColumn("_u", unit_hash("component", self.salt))
            .withColumn("split", split_case(F.col("_u"), self.weights))
            .select(ic, "component", "n_in_cluster", "n_tokens",
                    "quality", "lang_guess", "split")
            .localCheckpoint()
        )

        # 6) delta vs the previously-curated rows of the affected docs:
        #    displaced/filtered survivors retract (D), the rest upsert (U)
        aff_ids = new_meta.select(ic)
        aff_buckets = {
            r["b"] for r in aff_ids.select(
                bucket_col(out.bucket_count,
                           out.bucket_by).alias("b")).distinct().collect()
        }
        if aff_buckets and out.snapshot["files"]:
            prev = (out.read(spark, buckets=aff_buckets)
                    .join(F.broadcast(aff_ids), ic))
            gone = prev.join(curated.select(ic), ic, "left_anti")
        else:
            gone = spark.createDataFrame([], CURATED_SCHEMA) \
                .select(*CURATED_COLS)
        delta = (
            curated.withColumn("op", F.lit("U"))
            .unionByName(gone.select(*CURATED_COLS)
                         .withColumn("op", F.lit("D")))
            .withColumn("op_seq", F.lit(epoch).cast("long"))
        )
        merge_upsert(spark, out, delta, epoch=epoch, mode="mor")

        # 7) grow the index LAST, watermark atomic with the growth — a
        #    crash before this line redelivers the batch, which recomputes
        #    against the unchanged index and no-ops the committed merges
        append_to_minhash_index(idx, batch,
                                meta_extra={"last_batch_id": epoch})

    # ---------- streaming + reads ----------

    def run_stream(self, spark: SparkSession, schema: StructType, *,
                   available_now: bool = True,
                   processing_time: str | None = None,
                   max_files_per_trigger: int | None = None):
        """Tail ``source_dir`` for document batches under Structured
        Streaming (same wiring as StreamingNearDup/StructuredIngest)."""
        if not (self.source_dir and self.checkpoint_dir):
            raise ValueError("source_dir and checkpoint_dir are required "
                             "for run_stream")
        return run_file_stream(
            spark, self.source_dir, schema, self.apply_batch,
            self.checkpoint_dir, available_now=available_now,
            processing_time=processing_time,
            max_files_per_trigger=max_files_per_trigger,
        )

    def read_curated(self, spark: SparkSession) -> DataFrame:
        """The curated corpus as of the last completed tick — column-
        compatible with one-shot ``curate_corpus`` output."""
        return LakeTable(self.out_root).read(spark).select(*CURATED_COLS)
