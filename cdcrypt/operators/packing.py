"""Sequence packing + context-window chunking for training pipelines.

Two shapes every pretraining data pipeline needs between "curated corpus"
and "token stream":

- :func:`pack_sequences` — assign documents to fixed token-budget packs
  (the sample-packing step that keeps training batches dense). Exact
  next-fit packing is inherently sequential (each decision depends on the
  running remainder), which cannot scale; the standard distributed
  relaxation is SHARDED CUMULATIVE-SUM BINNING: documents are ordered
  deterministically within hash shards, and a document whose preceding
  cumulative token count is ``cum_before`` lands in pack
  ``floor(cum_before / budget)``. Every document maps to exactly one pack;
  a pack's total can overshoot ``budget`` by at most its last member's
  tokens (bounded overflow — the trainer truncates or the budget is set
  one max-doc-length under the context window). One window over one
  shard-keyed exchange; at 100 TB the shard count bounds every sort.

- :func:`chunk_documents` — split long documents into fixed-size
  character windows with optional overlap (context-window chunking for
  embedding/RAG/eval sets). Pure Column (``sequence`` + ``posexplode`` +
  ``substring``): zero shuffles, zero Python, fans out inside whole-stage
  codegen.

Determinism contract (same philosophy as functions/sampling.py): pack
assignment is a pure function of (id, salt, budget, n_shards) via the
cross-engine md5-derived 60-bit hash (functions/hash64.py), so results
are stable under repartitioning, engine, file layout, and re-runs — and
the DuckDB oracle can replay the identical window arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdcrypt.functions.hash64 import h60
from cdcrypt.functions.text import token_count


def pack_sequences(
    df: DataFrame,
    budget: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    n_shards: int = 64,
    salt: str = "pack",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign each document to a token-budget pack.

    Returns ``(id_col, n_tokens, shard, pack, off_tokens)``:

    - ``shard``      — ``pmod(h60(salt:id), n_shards)``; packing is
      independent per shard (the unit of parallelism);
    - ``pack``       — ``floor(cum_before / budget)`` within the shard's
      deterministic ``(h60, id)`` order. Pack numbers may have GAPS after
      an oversize document (tokens > budget) fast-forwards the cursor —
      ids are stable labels, not dense indexes;
    - ``off_tokens`` — token offset of this document inside its pack
      (``cum_before - pack*budget``); free from the same window, so the
      plan has exactly ONE exchange.

    ``tokens_col`` supplies precomputed token counts (e.g. from a real
    tokenizer); default derives :func:`cdcrypt.functions.text.token_count`
    from ``text_col``. Null ids are rejected at execution (same contract
    as the split operators); null text counts 0 tokens. ``keep_cols``
    threads extra payload columns (e.g. token-id arrays) through the one
    exchange and appends them to the output unchanged.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    reserved = {id_col, "n_tokens", "shard", "__h", "pack", "off_tokens"}
    clash = reserved.intersection(keep_cols)
    if clash:
        raise ValueError(
            f"pack_sequences: keep_cols {sorted(clash)} collide with "
            f"reserved output names {sorted(reserved)} — rename the "
            "payload column before packing")
    idc = F.col(id_col)
    checked = F.when(idc.isNull(), F.raise_error(
        f"pack_sequences: NULL {id_col} cannot be packed deterministically"
    )).otherwise(idc)
    toks = F.coalesce(
        F.col(tokens_col) if tokens_col is not None
        else token_count(F.col(text_col)),
        F.lit(0))  # null text / null precomputed count packs as 0 tokens
    h = h60(F.concat_ws(":", F.lit(salt), checked.cast("string")))
    base = df.select(
        idc.alias(id_col),
        toks.cast("long").alias("n_tokens"),
        F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
        h.alias("__h"),
        # extra payload columns ride the one existing exchange (e.g. the
        # token-id arrays in tokenize_and_pack) — no second scan/join
        *[F.col(k) for k in keep_cols],
    )
    w = (Window.partitionBy("shard")
         .orderBy(F.col("__h"), idc)
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (base
            .withColumn("pack", F.floor(cum_before / budget).cast("long"))
            .withColumn("off_tokens",
                        (cum_before - F.col("pack") * budget).cast("long"))
            .drop("__h"))


def materialize_packs(
    packed: DataFrame,
    *,
    id_col: str = "doc_id",
    ids_col: str | None = None,
) -> DataFrame:
    """Collapse a pack ASSIGNMENT (the output of :func:`pack_sequences` /
    ``tokenize_and_pack``) into one row per pack — the shape a trainer's
    data loader actually reads.

    Returns ``(shard, pack, n_docs, total_tokens, doc_ids, doc_offsets
    [, token_ids])``:

    - ``doc_ids``     — member documents in pack order (by ``off_tokens``,
      ``id_col`` tiebreak for zero-token members);
    - ``doc_offsets`` — each member's token offset inside the pack (the
      attention-boundary / sample-start table);
    - ``token_ids``   — only when ``ids_col`` names a per-document id
      array (``tokenize_and_pack`` output): the pack's concatenated
      token stream, flattened in the same order.

    One hash aggregation on ``(shard, pack)``; per-pack state is bounded
    by the token budget, so no pack can exceed executor memory no matter
    the corpus size. Ordering comes from ``sort_array`` over structs
    (deterministic, engine-stable), not from any input row order.
    """
    extra = [F.col(ids_col).alias("__ids")] if ids_col else []
    member = F.struct(F.col("off_tokens"), F.col(id_col).alias("__id"),
                      F.col("n_tokens"), *extra)
    agg = (packed
           .groupBy("shard", "pack")
           .agg(F.sort_array(F.collect_list(member)).alias("__m")))
    out = agg.select(
        "shard", "pack",
        F.size("__m").cast("long").alias("n_docs"),
        F.aggregate("__m", F.lit(0).cast("long"),
                    lambda acc, m: acc + m["n_tokens"]).alias("total_tokens"),
        F.transform("__m", lambda m: m["__id"]).alias("doc_ids"),
        F.transform("__m", lambda m: m["off_tokens"]).alias("doc_offsets"),
        *([F.flatten(F.transform("__m", lambda m: m["__ids"]))
           .alias("token_ids")] if ids_col else []),
    )
    return out


def chunk_documents(
    df: DataFrame,
    max_chars: int,
    *,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into ``max_chars``-character windows every
    ``max_chars - overlap`` characters.

    Returns ``(id_col, chunk_idx, chunk)`` — one row per window, in
    document order (``chunk_idx`` 0-based). The last window may be short;
    adjacent windows share ``overlap`` characters. Empty text yields one
    empty chunk (a document never disappears); NULL text yields no rows
    (documented drop — nothing to chunk).
    """
    if max_chars <= 0:
        raise ValueError(f"max_chars must be positive, got {max_chars}")
    if not (0 <= overlap < max_chars):
        raise ValueError(
            f"overlap must be in [0, max_chars), got {overlap}")
    step = max_chars - overlap
    c = F.col(text_col)
    starts = F.sequence(
        F.lit(0), F.greatest(F.length(c) - 1, F.lit(0)), F.lit(step))
    return (df.where(c.isNotNull())
            .select(F.col(id_col), c.alias("__t"),
                    F.posexplode(starts).alias("chunk_idx", "__s"))
            .select(
                F.col(id_col),
                F.col("chunk_idx").cast("long").alias("chunk_idx"),
                F.substring(F.col("__t"), F.col("__s") + 1,
                            max_chars).alias("chunk"),
            ))
