"""Document deduplication family for training-data pipelines.

Four strategies over a ``documents(doc_id, text, ...)`` table, each designed
for the 100 TB shape, not just the 60k-row test:

- exact: hash-groupBy on md5(text) — map-side combine, one shuffle of
  (hash, id) pairs only (never the text);
- MinHash + LSH: shingle -> K minhashes -> B bands -> bucket-join; candidate
  pairs only ever meet inside a band bucket, so the quadratic blowup is
  bounded per bucket; all hashing is JVM xxhash64 (no Python);
- SimHash: 64-bit sign-vote fingerprint via explode + bit-population sums,
  near-dups = equal fingerprint (or banded prefix for hamming<=k scale-out);
- n-gram Jaccard verify: exact set similarity for candidate pairs (the
  verify stage after LSH candidates).

Everything is pure DataFrame ops — deterministic given Spark's xxhash64, so
results are stable across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups: one row per distinct text with keeper id +
    member count. Shuffles only (hash, id)."""
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one doc per distinct text (the min id)."""
    groups = exact_dedup_groups(df, text_col, id_col)
    return df.join(
        groups.select(F.col("keep_id").alias(id_col)), id_col, "left_semi"
    )


def _shingles(text_col: str, k: int = 5):
    """Word k-shingles of the normalized text."""
    words = F.split(F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k, F.transform(
        idx, lambda i: F.array_join(F.slice(words, i + 1, k), " ")
    )).otherwise(F.array(F.array_join(words, " ")))


def _shingle_hashes(text_col: str, k: int = 5):
    """64-bit shingle fingerprints WITHOUT materializing shingle strings:
    hash each word once (xxhash64), then combine k consecutive word-hashes
    with a rotate-xor fold (order-sensitive; shift ops cannot overflow, so
    ANSI mode stays on). O(words) string hashing instead of O(words x k)
    char copying, and everything downstream (explode, shuffle,
    min-aggregate) moves longs, not text."""
    words = F.split(
        F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "), " ")
    wh = F.transform(words, lambda w: F.xxhash64(w))
    n = F.size(wh)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    poly = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"),
        lambda acc, h: (
            F.shiftleft(acc, 13).bitwiseOR(F.shiftrightunsigned(acc, 51))
        ).bitwiseXOR(h),
    )
    return F.when(n >= k, F.transform(
        idx, lambda i: poly(F.slice(wh, i + 1, k))
    )).otherwise(F.array(poly(wh)))


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 32,
                       shingle_k: int = 5) -> DataFrame:
    """(id, array<long> minhash signature). Each hash family member is
    xxhash64(shingle_hash, seed_i); min over shingles — all JVM-side.

    Shape: explode distinct 64-bit shingle fingerprints once (longs, never
    shingle text), then ONE hash-aggregate with ``num_hashes`` mins —
    map-side partial combine collapses each doc's shingles before the
    shuffle."""
    ex = (
        df.where(F.col(text_col).isNotNull() & (F.length(text_col) > 0))
        .select(F.col(id_col),
                F.explode(F.array_distinct(
                    _shingle_hashes(text_col, shingle_k))).alias("sh"))
    )
    aggs = [F.min(F.xxhash64("sh", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
    return ex.groupBy(id_col).agg(*aggs).select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 32,
                           bands: int = 16, shingle_k: int = 5) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b, n_shared_bands).

    Default 16 bands x 2 rows: candidate generation is the RECALL stage
    (P[band match] = s^2 per band -> ~0.997 overall at shingle-Jaccard 0.55);
    the exact n-gram Jaccard verify downstream restores precision.

    band hash = xxhash64 over the band's slice of the signature; pairs
    sharing >= 1 band bucket become candidates. The bucket join is a
    self-join on (band_idx, band_hash) — hot buckets (boilerplate text)
    are the skew risk at scale; cap bucket size upstream if needed.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    banded = sigs.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                    ).alias("bhash"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bhash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "bhash"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def ngram_jaccard(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", shingle_k: int = 5) -> DataFrame:
    """Exact Jaccard over word shingle SETS for candidate pairs (the verify
    stage after LSH). Joins the docs twice; pairs is small post-LSH."""
    sh = df.select(
        F.col(id_col), F.array_distinct(_shingles(text_col, shingle_k)).alias("sh")
    )
    j = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select(
        "id_a", "id_b",
        F.round(inter / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
    )


def simhash64(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash: per word, xxhash64 votes +1/-1 on each bit; sign of
    the per-bit sum forms the fingerprint. explode + 64 conditional sums,
    all codegen'd; one shuffle on id."""
    words = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.explode(
            F.split(F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "), " ")
        ).alias("w"),
    ).withColumn("h", F.xxhash64("w"))
    sums = words.groupBy(id_col).agg(*[
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ])
    fp = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return sums.select(id_col, fp.alias("simhash"))


def simhash_dup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Docs sharing an identical simhash (near-dup clusters at hamming 0)."""
    s = simhash64(df, text_col, id_col)
    return (
        s.groupBy("simhash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") > 1)
    )
