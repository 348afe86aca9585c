"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

Selects raw-corpus documents that look like a small target corpus: fit two
bag-of-hashed-n-gram multinomials (target p, raw q), weight each raw doc by
its importance log-ratio, then resample with Gumbel top-k::

    features(x)  = hashed uni+bigram counts, B buckets
    log w(x)     = sum over features f of  c_f(x) * (ln p_f - ln q_f)
    select       = top-k by  log w(x)/len(x) + Gumbel(seeded by doc id)

This is the paper's estimator with two engine-native choices:
- The feature space is CLOSED (B buckets), so the log-ratio table is a
  B-row relation — broadcast to every executor; scoring a 100 TB raw
  corpus is one narrow tokenize projection + a broadcast join + a per-doc
  groupBy. Nothing corpus-sized ever shuffles except the doc-id rollup.
- The Gumbel noise is DETERMINISTIC: u = h60(id:salt)/2^60, g = -ln(-ln u)
  (functions/hash64.py) — same value in Spark and the DuckDB oracle, so
  the *sampled selection itself* is correctness-gated, and reruns/retries
  pick identical documents (the engine-wide reproducibility contract,
  like functions/sampling.py).

Length normalization (``per_token=True``, default) scores the MEAN
per-token log-ratio — the raw sum favors long documents regardless of fit
(the paper's discussion of length effects); pass ``per_token=False`` for
the paper's raw sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdcrypt.functions.hash64 import h60
from cdcrypt.operators.docdedup import _words

__all__ = ["dsir_sample", "dsir_weights", "hashed_ngram_features"]


def _nonempty(text_col: str) -> Column:
    return F.filter(_words(text_col), lambda w: w != F.lit(""))


def hashed_ngram_features(docs: DataFrame, n_buckets: int = 8192,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """``(id, bucket, cnt)`` — hashed unigram+bigram counts per document.

    Unigrams hash ``u:<w>``, bigrams ``b:<w1> <w2>`` (marker prefixes keep
    the two families collision-disjoint in the string domain), both folded
    into ``B`` buckets. One narrow projection + one groupBy."""
    ws = _nonempty(text_col)
    bigrams = F.zip_with(
        F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
        F.when(F.size(ws) <= 1, F.array().cast("array<string>"))
         .otherwise(F.slice(ws, 2, F.size(ws) - 1)),
        lambda a, b: F.concat(F.lit("b:"), a, F.lit(" "), b))
    unigrams = F.transform(ws, lambda w: F.concat(F.lit("u:"), w))
    grams = F.concat(unigrams, bigrams)
    return (
        docs.select(F.col(id_col).alias("id"),
                    F.explode(grams).alias("g"))
            .where(F.col("g").isNotNull())
            .select("id", F.pmod(h60(F.col("g")),
                                 F.lit(n_buckets)).alias("bucket"))
            .groupBy("id", "bucket").agg(F.count("*").alias("cnt"))
    )


def _log_ratio_table(raw_feats: DataFrame, target: DataFrame,
                     n_buckets: int, alpha: float, text_col: str,
                     id_col: str) -> DataFrame:
    """B-row ``(bucket, lr)``: smoothed ln p_target - ln q_raw per feature.

    Buckets absent from both corpora are absent from the table (their
    ratio is ln(a/T_t') - ln(a/T_r'), a constant a scoring join can never
    hit — a doc's features exist in the raw corpus by construction, and
    the left join's null-path covers target-only smoothing)."""
    def totals(feats: DataFrame, side: str) -> DataFrame:
        return feats.groupBy("bucket").agg(
            F.sum("cnt").alias(f"c_{side}"))
    t = totals(hashed_ngram_features(target, n_buckets, text_col, id_col),
               "t")
    r = totals(raw_feats, "r")
    joined = r.join(t, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("c_t", F.lit(0)).alias("c_t"),
        F.coalesce("c_r", F.lit(0)).alias("c_r"))
    tot = joined.agg(F.sum("c_t").alias("tt"),
                     F.sum("c_r").alias("tr"))
    return (
        joined.crossJoin(F.broadcast(tot))
              .select(
                  "bucket",
                  (F.log((F.col("c_t") + alpha)
                         / (F.col("tt") + alpha * n_buckets))
                   - F.log((F.col("c_r") + alpha)
                           / (F.col("tr") + alpha * n_buckets))).alias("lr"))
    )


def dsir_weights(raw: DataFrame, target: DataFrame, n_buckets: int = 8192,
                 alpha: float = 0.5, per_token: bool = True,
                 text_col: str = "text", id_col: str = "doc_id",
                 round_digits: int = 4) -> DataFrame:
    """Per-raw-doc importance score: ``(doc_id, n_feats, logw)``.

    ``logw`` = (per-token mean of) feature-count-weighted log-ratio,
    rounded for cross-engine hashing. Zero-token docs are absent (no
    features — no evidence either way). The ratio table is broadcast
    (B rows); the raw corpus is scanned once."""
    # the raw corpus is tokenized ONCE: the per-doc feature relation both
    # feeds the q-side totals of the ratio table and carries the scoring
    # counts (Catalyst reuses the aggregation's exchange)
    feats = hashed_ngram_features(raw, n_buckets, text_col, id_col)
    lr = _log_ratio_table(feats, target, n_buckets, alpha, text_col, id_col)
    num = F.sum(F.col("cnt") * F.col("lr"))
    denom = F.sum("cnt") if per_token else F.lit(1.0)
    return (
        feats.join(F.broadcast(lr), "bucket")
             .groupBy(F.col("id").alias(id_col))
             .agg(F.sum("cnt").alias("n_feats"),
                  F.round(num / denom, round_digits).alias("logw"))
    )


def gumbel01(id_col: Column, salt: str) -> Column:
    """Deterministic standard Gumbel draw per id: u = h60(id:salt)/2^60
    (strictly inside (0,1) — h60 of a non-empty string is never exactly 0
    or 2^60), g = -ln(-ln u). Identical in DuckDB."""
    u = h60(F.concat_ws(":", id_col.cast("string"), F.lit(salt))) \
        / F.lit(float(1 << 60))
    return -F.log(-F.log(u))


def dsir_sample(raw: DataFrame, target: DataFrame, k: int,
                n_buckets: int = 8192, alpha: float = 0.5,
                per_token: bool = True, salt: str = "dsir",
                text_col: str = "text", id_col: str = "doc_id",
                round_digits: int = 4) -> DataFrame:
    """Gumbel top-k importance resample: ``(doc_id, logw, key, rank)`` for
    the ``k`` selected docs — sampling WITHOUT replacement proportional to
    w(x) (the Gumbel-max trick), yet fully deterministic and rerun-stable.

    Global top-k is a TakeOrdered (per-partition heads + driver merge of
    k-row heads), not a global sort."""
    w = dsir_weights(raw, target, n_buckets, alpha, per_token,
                     text_col, id_col)
    keyed = w.select(
        id_col, "logw",
        F.round(F.col("logw") + gumbel01(F.col(id_col), salt),
                round_digits).alias("key"))
    ordered = keyed.orderBy(F.col("key").desc(), F.col(id_col).asc()) \
                   .limit(k)
    from pyspark.sql.window import Window
    win = Window.orderBy(F.col("key").desc(), F.col(id_col).asc())
    return ordered.withColumn("rank", F.row_number().over(win))
