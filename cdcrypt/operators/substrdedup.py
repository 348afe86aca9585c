"""Exact-substring deduplication (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better", arXiv:2107.06499 §4.1) —
the span-granular member of the dedup family: find every maximal run of
>= k consecutive tokens that occurs more than once in the corpus, and
scrub those runs out of the text while keeping the unique remainder.

The paper builds a corpus-wide suffix array — inherently sequential and
memory-resident. The Spark-native equivalent decomposes the same
semantics into relational passes over k-token grams:

    a duplicated substring of length >= k  <=>  a run of consecutive
    duplicated k-grams; merging overlapping/adjacent duplicated gram
    positions per document reconstructs the maximal spans.

(Every length->=k duplicate is found; span boundaries are quantized to
the k-gram lattice, so up to k-1 trailing tokens of a duplicate may
survive — the standard streaming relaxation of the suffix-array method.)

Scale shape (100 TB):

- gram rows are (long id, int pos, long hash) — ~8 rows/doc-token,
  never text; the corpus-frequency pass is ONE window count over the
  gram-hash shuffle (map-side partial aggregation does not apply to
  windows, but the row is 20 bytes and the alternative join costs the
  same exchange plus a build side);
- NO self-join anywhere: unlike MinHash banding there is no candidate
  pairing step, so hot grams (boilerplate) cost linear rows, not
  quadratic pairs — no cap needed for correctness or memory;
- span merge is one per-document window (lag + running max), the
  gaps-and-islands contraction: 2 shuffles end-to-end for spans,
  +1 bounded collect_list join for the scrub rewrite.

Tokens are the corpus whitespace convention with CASE PRESERVED (the
scrub must reproduce the surviving tokens verbatim; near-dup recall is
MinHash's job, not this operator's). The hash family is the shared
cross-engine h60 (functions/hash64.py), so the DuckDB oracle replays
gram hashing bit-identically; within-document repeats count toward
duplication exactly as in the paper (a doc repeating its own k tokens
gets both copies scrubbed).

Reference parity note: the reference SMT has no corpus-level operators
(`Transform.java:38` is per-record); this module is part of the
training-pipeline extension surface (SURVEY.md §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdcrypt.functions.hash64 import h60

__all__ = [
    "contaminated_spans",
    "duplicate_spans",
    "scrub_contamination",
    "scrub_duplicate_spans",
]


def _words_cased(text_col: str):
    """Whitespace-normalized token array, case preserved (oracle:
    regexp_split_to_array(regexp_replace(trim(text), '\\s+', ' ', 'g'),
    ' ')). Case-insensitive dedup belongs to the MinHash family; the
    scrub rewrite must emit the original tokens."""
    return F.split(
        F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "), " ")


def _gram_rows(df: DataFrame, id_col: str, text_col: str,
               k: int) -> DataFrame:
    """(id, pos, gh): one row per k-gram occurrence, position 0-based on
    the token stream. Docs shorter than k tokens emit nothing — they
    cannot contain a >=k-token duplicate (whole-doc duplicates are
    exact_dedup's job). Row-level hashing inside whole-stage codegen,
    same shape as docdedup._shingle_rows (measured ~2.5x cheaper than
    the higher-order-lambda array form)."""
    words = _words_cased(text_col)
    base = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), words.alias("_w"))
        .where(F.size("_w") >= k)
    )
    ex = base.select(
        id_col, "_w",
        F.explode(F.sequence(F.lit(0), F.size("_w") - k)).alias("pos"),
    )
    gh = h60(F.array_join(F.slice("_w", F.col("pos") + 1, k), " "))
    return ex.select(id_col, "pos", gh.alias("gh"))


def _merge_islands(dup: DataFrame, id_col: str, k: int) -> DataFrame:
    """Gaps-and-islands contraction shared by every span producer:
    ``dup`` is (id, pos) of duplicated gram starts; overlapping/adjacent
    positions (gap <= k) fuse into maximal spans. One per-document
    window (lag + running sum), rollup reuses its partitioning."""
    wd = Window.partitionBy(id_col).orderBy("pos")
    gap = F.when(
        F.col("pos") - F.lag("pos").over(wd) > k, 1).otherwise(0)
    islands = dup.withColumn(
        "_isl", F.sum(gap).over(
            wd.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        islands.groupBy(id_col, "_isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_grams"),
        )
        .select(
            id_col, "span_start", "span_end",
            (F.col("span_end") - F.col("span_start")).alias("n_tokens"),
            "n_grams",
        )
    )


def contaminated_spans(
    df: DataFrame,
    reference: DataFrame,
    k: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str | None = None,
    broadcast_reference: bool = True,
) -> DataFrame:
    """Benchmark-contaminated spans: every maximal >=k-token run of a
    corpus document that also occurs ANYWHERE in ``reference`` (the
    eval/benchmark set) — the span-granular sibling of
    :func:`cdcrypt.operators.docdedup.decontaminate` (GPT-3 appendix C /
    Lee et al. §6.2 lineage: 13-gram overlap), for pipelines where
    dropping the whole document is too lossy and surgical removal of
    the leaked benchmark text is the right trade.

    Same output shape as :func:`duplicate_spans`; feed the result to
    :func:`scrub_duplicate_spans` via ``spans=`` (or call
    :func:`scrub_contamination`).

    Scale shape — CHEAPER than self-dedup: the reference is a benchmark
    (MBs, not TBs), so its distinct gram hashes ship as a BROADCAST
    semi-join build side and the corpus gram rows never shuffle for the
    membership test (``broadcast_reference=False`` degrades to a
    shuffle semi-join for pathological reference sizes). Total: the
    codegen'd gram explode + one broadcast probe + the per-doc island
    window — ONE corpus shuffle end-to-end.
    """
    ref_grams = (_gram_rows(reference.select(
        F.lit(0).alias("_rid"),
        F.col(ref_text_col or text_col).alias("_rt")), "_rid", "_rt", k)
        .select("gh").distinct())
    if broadcast_reference:
        ref_grams = F.broadcast(ref_grams)
    grams = _gram_rows(df, id_col, text_col, k)
    dup = grams.join(ref_grams, "gh", "left_semi").select(id_col, "pos")
    return _merge_islands(dup, id_col, k)


def scrub_contamination(
    df: DataFrame,
    reference: DataFrame,
    k: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kw,
) -> DataFrame:
    """The corpus with every benchmark-contaminated span removed (and
    documents otherwise kept — contrast ``decontaminate``'s drop-the-
    document policy). Output contract of :func:`scrub_duplicate_spans`."""
    spans = contaminated_spans(df, reference, k, id_col, text_col, **kw)
    return scrub_duplicate_spans(df, k, id_col=id_col, text_col=text_col,
                                 spans=spans)


def duplicate_spans(
    df: DataFrame,
    k: int = 8,
    min_occurrences: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal duplicated spans: ``(id_col, span_start, span_end,
    n_tokens, n_grams)`` with token positions 0-based, end exclusive.

    A k-gram is duplicated when it occurs >= ``min_occurrences`` times
    CORPUS-WIDE (across documents or within one — both are training-set
    redundancy per the paper). Overlapping and adjacent duplicated gram
    positions merge: gap rule ``pos - prev_pos > k`` starts a new span,
    i.e. spans [p1, p1+k) and [p2, p2+k) with p2 <= p1 + k fuse.

    Plan: gram explode (codegen) -> window count over gh (shuffle 1) ->
    per-doc lag/cumsum island contraction (shuffle 2) -> island group
    rollup (reuses shuffle 2's partitioning). All shuffled rows are
    fixed-width longs.
    """
    grams = _gram_rows(df, id_col, text_col, k)
    freq = F.count(F.lit(1)).over(Window.partitionBy("gh"))
    dup = (grams.withColumn("_f", freq)
                .where(F.col("_f") >= min_occurrences)
                .select(id_col, "pos"))
    return _merge_islands(dup, id_col, k)


def scrub_duplicate_spans(
    df: DataFrame,
    k: int = 8,
    min_occurrences: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    spans: DataFrame | None = None,
) -> DataFrame:
    """The scrubbed corpus: every duplicated span's tokens removed from
    every document (the paper's drop-all-copies policy; keeping one
    canonical copy is a cluster-survivor decision that belongs to
    dedup_near). Returns ``(id_col, text_clean, n_tokens_kept,
    n_tokens_dropped)`` — one row per input document with non-null text;
    documents scrubbed to nothing keep an empty string (downstream
    quality/length filters decide their fate, cf. operators/curation.py).

    ``text_clean`` is the surviving tokens joined by single spaces (the
    whitespace-normalized stream positions are defined on — original
    inter-token whitespace is not reconstructable once positions are
    token-indexed).

    Plan: spans (2 shuffles, above) -> collect_list per doc (reuses the
    island shuffle's doc partitioning) -> one join back to the corpus,
    then a pure-Column positional filter (``F.filter`` with index
    lambda). The span list per doc is bounded by doc length / k.
    Pass ``spans=`` to reuse an already-computed span relation.
    """
    if spans is None:
        spans = duplicate_spans(df, k, min_occurrences, id_col, text_col)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("s"),
                     F.col("span_end").alias("e"))).alias("_spans"))
    words = _words_cased(text_col)
    src = (df.where(F.col(text_col).isNotNull())
             .select(id_col, words.alias("_w"))
             .join(per_doc, id_col, "left"))
    spans_arr = F.coalesce(
        "_spans", F.expr("array()").cast("array<struct<s:int,e:int>>"))
    kept = F.filter(
        "_w",
        lambda w, i: ~F.exists(
            spans_arr, lambda sp: (i >= sp["s"]) & (i < sp["e"])))
    return src.select(
        id_col,
        F.array_join(kept, " ").alias("text_clean"),
        F.size(kept).cast("long").alias("n_tokens_kept"),
        (F.size("_w") - F.size(kept)).cast("long").alias("n_tokens_dropped"),
    )
