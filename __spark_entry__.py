"""Driver contract for the spark-graft builder (PySpark target).

Maps the engine's operator inventory (SURVEY.md §2 + the training-data ops)
onto the driver-provided tables. Every SQL-expressible operator has a DuckDB
oracle; crypto/minhash/simhash/LSH rely on Spark-only primitives (AES-GCM,
xxhash64) and use the rows-only path, with their real correctness gates in
``tests/`` (round-trip equality, resolver equivalence, e2e replay oracle).

Numeric discipline for value-hash matches: money sums use exact integer
cents/e4 arithmetic (doubles summed in different orders do NOT hash-match);
cosine sims are rounded to 4 decimals on both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: field-level encrypt/decrypt round-trip (the reference SMT's
    core semantic) + text analytics over documents at sf0.001."""
    from cdcrypt.functions.text import lang_id, quality_score
    from cdcrypt.operators.transform import decrypt_fields, encrypt_fields

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    enc = encrypt_fields(docs, ["$.text"], key_id="cdcrypt/docs")
    dec = decrypt_fields(enc, ["$.text"], key_id="cdcrypt/docs")
    joined = dec.alias("d").join(
        docs.select("doc_id", F.col("text").alias("orig")).alias("o"), "doc_id"
    )
    return (
        joined.select(
            lang_id(F.col("d.text")).alias("lang_guess"),
            quality_score(F.col("d.text")).alias("q"),
            (F.col("d.text") == F.col("orig")).alias("roundtrip_ok"),
        )
        .groupBy("lang_guess")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("q"), 4).alias("avg_quality"),
            F.sum(F.when(F.col("roundtrip_ok"), 1).otherwise(0)).alias("n_roundtrip_ok"),
        )
        .orderBy("lang_guess")
    )


# --------------------------------------------------------------------------
# queries (spark side)
# --------------------------------------------------------------------------

def _q_smt_encrypt_roundtrip(spark, sf_dir):
    # O1/O4/O8/C1-C11: projection-rewrite crypto; decrypt(encrypt(x)) == x,
    # so the oracle is the identity projection.
    from cdcrypt.operators.transform import decrypt_fields, encrypt_fields

    docs = _t(spark, sf_dir, "documents")
    enc = encrypt_fields(docs, ["$.text"], key_id="cdcrypt/docs",
                         aad_field="source")
    dec = decrypt_fields(enc, ["$.text"], key_id="cdcrypt/docs",
                         aad_field="source")
    return dec.select("doc_id", "text")


def _q_smt_roundtrip_jvm(spark, sf_dir):
    # same semantics through the JVM aes_encrypt backend (crypto_jvm.py);
    # cross-backend: encrypt via builtin AES-GCM, decrypt via pandas UDF
    from cdcrypt.operators.transform import decrypt_fields, encrypt_fields

    docs = _t(spark, sf_dir, "documents")
    enc = encrypt_fields(docs, ["$.text"], key_id="cdcrypt/docs",
                         aad_field="source", backend="jvm")
    dec = decrypt_fields(enc, ["$.text"], key_id="cdcrypt/docs",
                         aad_field="source")
    return dec.select("doc_id", "text")


def _q_smt_array_wildcard(spark, sf_dir):
    # O4/O5: $.path[*] wildcard over an array column — all elements of all
    # gated rows form ONE crypto batch (one KMS wrap per Arrow batch)
    from cdcrypt.operators.transform import decrypt_fields, encrypt_fields

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.array(F.col("text"), F.col("source")).alias("vals"))
    enc = encrypt_fields(docs, ["$.vals[*]"], key_id="cdcrypt/docs")
    dec = decrypt_fields(enc, ["$.vals[*]"], key_id="cdcrypt/docs")
    return dec.select(
        "doc_id",
        F.col("vals")[0].alias("text"),
        F.col("vals")[1].alias("source"),
    )


def _q_smt_conditional_crypto(spark, sf_dir):
    # O6 through the crypto path: only source='web' rows are encrypted
    # (then decrypted back); others pass through untouched — round-trip
    # identity either way, which is exactly what the oracle checks
    from cdcrypt.operators.transform import decrypt_fields, encrypt_fields

    docs = _t(spark, sf_dir, "documents")
    enc = encrypt_fields(docs, ["$.text"], key_id="cdcrypt/docs",
                         condition_field="$.source", condition_equals="web")
    dec = decrypt_fields(enc, ["$.text"], key_id="cdcrypt/docs",
                         condition_field="$.source", condition_equals="web")
    return dec.select("doc_id", "text", "source")


def _q_condition_gate(spark, sf_dir):
    # O6 as pure SQL: per-row branch, non-matching rows unmodified
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("event_type") == "click", F.round(F.col("value") * 2, 6))
        .otherwise(F.round(F.col("value"), 6))
        .alias("value_out"),
    )


def _q_cdc_window_dedup(spark, sf_dir):
    # P4: window row_number dedup — latest event per (user_id, event_type)
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.round("value", 6).alias("value"))
    )


def _q_cdc_last_writer_wins(spark, sf_dir):
    # LWW resolution via max_by (map-side combine form used by the engine)
    ev = _t(spark, sf_dir, "events")
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.max_by(F.col("event_id"), ordk).alias("last_event_id"),
        F.round(F.max_by(F.col("value"), ordk), 6).alias("last_value"),
    )


def _q_cdc_merge_full_outer(spark, sf_dir):
    # P5 merge-as-join: state (even event ids) full-outer changes (odd),
    # change wins — the MERGE upsert shape on neutral tables
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def latest(side):
        return (
            side.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", "event_type", "event_id", "value")
        )

    state = latest(ev.where(F.col("event_id") % 2 == 0))
    change = latest(ev.where(F.col("event_id") % 2 == 1))
    j = state.alias("t").join(change.alias("b"), ["user_id", "event_type"], "full_outer")
    return j.select(
        "user_id", "event_type",
        F.coalesce(F.col("b.event_id"), F.col("t.event_id")).alias("event_id"),
        F.round(F.coalesce(F.col("b.value"), F.col("t.value")), 6).alias("value"),
    )


def _q_tpch_q1_agg(spark, sf_dir):
    # aggregation pipeline with exact integer-cents arithmetic
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp")
    )
    qty = F.round(F.col("l_quantity")).cast("long")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(cents).alias("sum_base_cents"),
            F.sum(cents * (100 - disc)).alias("sum_disc_e4"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_tpch_join_revenue(spark, sf_dir):
    # multi-join with broadcast dims: revenue per nation (exact e4 ints)
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(cents * (100 - disc)).alias("revenue_e4"),
             F.count(F.lit(1)).alias("n_items"))
    )


def _q_dedup_exact(spark, sf_dir):
    from cdcrypt.operators.docdedup import exact_dedup_groups
    return exact_dedup_groups(_t(spark, sf_dir, "documents"))


def _q_text_stats(spark, sf_dir):
    from cdcrypt.functions.text import (
        digit_ratio, lang_id, punct_ratio, quality_score, token_count,
    )
    d = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return d.select(
        "doc_id",
        F.length(c).alias("n_chars"),
        token_count(c).alias("n_tokens"),
        punct_ratio(c).alias("punct_ratio"),
        digit_ratio(c).alias("digit_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_guess"),
    )


def _q_token_counts(spark, sf_dir):
    from cdcrypt.functions.text import bpe_ish_token_count, token_count
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_subwords"),
    )


def _q_minhash_lsh_pairs(spark, sf_dir):
    # Spark-only hashing (xxhash64) -> rows-only check; Jaccard-verified in tests
    from cdcrypt.operators.docdedup import minhash_lsh_candidates
    return minhash_lsh_candidates(_t(spark, sf_dir, "documents"))


def _q_simhash_groups(spark, sf_dir):
    from cdcrypt.operators.docdedup import simhash_dup_groups
    return simhash_dup_groups(_t(spark, sf_dir, "documents"))


def _q_ngram_jaccard(spark, sf_dir):
    # LSH candidates -> exact n-gram Jaccard verify stage
    from cdcrypt.operators.docdedup import minhash_lsh_candidates, ngram_jaccard
    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(docs)
    return ngram_jaccard(docs, pairs).where(F.col("jaccard") >= 0.8)


def _q_cosine_topk(spark, sf_dir):
    from cdcrypt.operators.similarity import cosine_topk
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return cosine_topk(emb, queries, k=5)


def _q_ann_lsh(spark, sf_dir):
    from cdcrypt.operators.similarity import ann_lsh_topk
    emb = _t(spark, sf_dir, "embeddings")
    # 6 bits ~ |base|/64 candidates per bucket at sf0.01; scale n_bits with |base|
    return ann_lsh_topk(emb, emb.where(F.col("vec_id") < 10), k=5, n_bits=6)


def _q_embedding_neardup(spark, sf_dir):
    # exact embedding-cosine near-dup pairs (oracle-checkable baseline);
    # the LSH-banded variant (embedding_neardup_lsh) is the 100TB path,
    # verified subset+recall in tests/test_training_ops.py
    from cdcrypt.operators.similarity import embedding_neardup_exact
    emb = _t(spark, sf_dir, "embeddings")
    return embedding_neardup_exact(emb, threshold=0.4)


def _q_ann_ivf(spark, sf_dir):
    # IVF with full probe == exact brute force (same oracle as cosine_topk);
    # pruned-probe recall covered in tests
    from cdcrypt.operators.similarity import ann_ivf_topk
    emb = _t(spark, sf_dir, "embeddings")
    return ann_ivf_topk(emb, emb.where(F.col("vec_id") < 10), k=5,
                        n_centroids=8, n_probe=8)


def _q_multimodal_features(spark, sf_dir):
    from cdcrypt.operators.multimodal import attach_fake_media, extract_media_features
    docs = _t(spark, sf_dir, "documents")
    feats = extract_media_features(attach_fake_media(docs))
    return feats.select("doc_id", "media_type", "byte_len", "n_frames")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "smt_encrypt_roundtrip": _q_smt_encrypt_roundtrip,
        "smt_roundtrip_jvm": _q_smt_roundtrip_jvm,
        "smt_array_wildcard": _q_smt_array_wildcard,
        "smt_conditional_crypto": _q_smt_conditional_crypto,
        "condition_gate": _q_condition_gate,
        "cdc_window_dedup": _q_cdc_window_dedup,
        "cdc_last_writer_wins": _q_cdc_last_writer_wins,
        "cdc_merge_full_outer": _q_cdc_merge_full_outer,
        "tpch_q1_agg": _q_tpch_q1_agg,
        "tpch_join_revenue": _q_tpch_join_revenue,
        "dedup_exact": _q_dedup_exact,
        "text_stats": _q_text_stats,
        "token_counts": _q_token_counts,
        "minhash_lsh_pairs": _q_minhash_lsh_pairs,
        "simhash_groups": _q_simhash_groups,
        "ngram_jaccard": _q_ngram_jaccard,
        "cosine_topk": _q_cosine_topk,
        "ann_lsh_topk": _q_ann_lsh,
        "ann_ivf_topk": _q_ann_ivf,
        "embedding_neardup": _q_embedding_neardup,
        "multimodal_features": _q_multimodal_features,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    return {
        "smt_encrypt_roundtrip": "SELECT doc_id, text FROM documents",
        "smt_roundtrip_jvm": "SELECT doc_id, text FROM documents",
        "smt_array_wildcard": "SELECT doc_id, text, source FROM documents",
        "smt_conditional_crypto": "SELECT doc_id, text, source FROM documents",
        "condition_gate": """
            SELECT event_id,
                   CASE WHEN event_type = 'click' THEN round(value * 2, 6)
                        ELSE round(value, 6) END AS value_out
            FROM events
        """,
        "cdc_window_dedup": """
            SELECT user_id, event_type, event_id, round(value, 6) AS value
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY user_id, event_type
                      ORDER BY ts DESC, event_id DESC) rn
                  FROM events)
            WHERE rn = 1
        """,
        "cdc_last_writer_wins": """
            SELECT user_id, event_id AS last_event_id,
                   round(value, 6) AS last_value
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
                  FROM events)
            WHERE rn = 1
        """,
        "cdc_merge_full_outer": """
            WITH state AS (
              SELECT user_id, event_type, event_id, value
              FROM (SELECT *, row_number() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts DESC, event_id DESC) rn
                    FROM events WHERE event_id % 2 = 0) WHERE rn = 1),
            change AS (
              SELECT user_id, event_type, event_id, value
              FROM (SELECT *, row_number() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts DESC, event_id DESC) rn
                    FROM events WHERE event_id % 2 = 1) WHERE rn = 1)
            SELECT COALESCE(b.user_id, t.user_id) AS user_id,
                   COALESCE(b.event_type, t.event_type) AS event_type,
                   COALESCE(b.event_id, t.event_id) AS event_id,
                   round(COALESCE(b.value, t.value), 6) AS value
            FROM state t FULL OUTER JOIN change b
              USING (user_id, event_type)
        """,
        # NOTE: DuckDB's sum(BIGINT) returns HUGEINT (int128) — the OUTER
        # CAST back to BIGINT makes the value dtype match Spark's bigint
        # (values were already identical; round-1 hash mismatch was this
        # dtype artifact, VERDICT.md "What's wrong" #1).
        "tpch_q1_agg": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                     AS sum_base_cents,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
                     AS sum_disc_e4,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_join_revenue": """
            SELECT n_name,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
                     AS revenue_e4,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
                   count(*) AS n_copies
            FROM documents WHERE text IS NOT NULL
            GROUP BY md5(text)
        """,
        "text_stats": """
            SELECT doc_id,
              length(text) AS n_chars,
              CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
              round((length(text) - length(regexp_replace(text,
                    '[.,;:!?''"()\\[\\]{}]', '', 'g')))
                    / greatest(length(text), 1)::DOUBLE, 6) AS punct_ratio,
              round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                    / greatest(length(text), 1)::DOUBLE, 6) AS digit_ratio,
              round(greatest(
                least(length(text) / 500.0, 1.0) * 0.4
                + least(round((length(text) - length(replace(text, ' ', '')))
                        / greatest(length(text), 1)::DOUBLE, 6) * 8, 1.0) * 0.4
                + (1 - least((
                    round((length(text) - length(regexp_replace(text,
                          '[.,;:!?''"()\\[\\]{}]', '', 'g')))
                          / greatest(length(text), 1)::DOUBLE, 6)
                  + round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                          / greatest(length(text), 1)::DOUBLE, 6)) * 3, 1.0)) * 0.2,
                0.0), 6) AS quality,
              CASE
                WHEN len(regexp_extract_all(text, '[぀-ヿ一-鿿]')) > 0 THEN 'cjk'
                WHEN len(regexp_extract_all(text, '[Ͱ-Ͽ]')) > 0 THEN 'greek'
                WHEN (length(text) - length(replace(text, ' the ', ''))) / 5.0
                   + (length(text) - length(replace(text, ' and ', ''))) / 5.0
                   + (length(text) - length(replace(text, ' of ', ''))) / 4.0
                   + (length(text) - length(replace(text, ' to ', ''))) / 4.0 >= 1
                  THEN 'en'
                ELSE 'other'
              END AS lang_guess
            FROM documents
        """,
        "token_counts": """
            SELECT doc_id,
              CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)
                AS n_tokens,
              CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
                + floor(length(regexp_replace(text, '\\s', '', 'g')) / 4) AS BIGINT)
                AS n_subwords
            FROM documents
        """,
        "cosine_topk": """
            SELECT query_id, neighbor_id, rank, sim FROM (
              SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
                     round(list_cosine_similarity(
                       q.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(list_cosine_similarity(
                         q.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4)
                                DESC, b.vec_id ASC) AS rank
              FROM embeddings q, embeddings b
              WHERE q.vec_id < 10 AND q.vec_id <> b.vec_id)
            WHERE rank <= 5
        """,
        "ann_ivf_topk": """
            SELECT query_id, neighbor_id, rank, sim FROM (
              SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
                     round(list_cosine_similarity(
                       q.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(list_cosine_similarity(
                         q.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4)
                                DESC, b.vec_id ASC) AS rank
              FROM embeddings q, embeddings b
              WHERE q.vec_id < 10 AND q.vec_id <> b.vec_id)
            WHERE rank <= 5
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(
                     a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND round(list_cosine_similarity(
                    a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.4
        """,
        "multimodal_features": """
            SELECT doc_id,
              CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                   WHEN doc_id % 3 = 1 THEN 'audio/wav'
                   ELSE 'video/mp4' END AS media_type,
              CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT) AS byte_len,
              CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                   WHEN doc_id % 3 = 1 THEN
                     greatest(1, octet_length(encode(COALESCE(text, ''))) // 64)
                   ELSE greatest(1, octet_length(encode(COALESCE(text, ''))) // 256)
              END AS INTEGER) AS n_frames
            FROM documents
        """,
        # minhash_lsh_pairs / simhash_groups / ngram_jaccard / ann_lsh_topk:
        # Spark-only xxhash64 seeds -> rows-only check (verified in tests/)
    }
