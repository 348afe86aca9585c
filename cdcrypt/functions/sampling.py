"""Deterministic dataset splitting and sampling for training pipelines.

Training data must split REPRODUCIBLY: the same corpus, salt, and weights
must yield the same train/val/test assignment on every run, every engine,
and every cluster size — `df.sample()`/`randomSplit()` are seeded per
partition and change with the partitioning, which silently reshuffles a
split when the input layout changes. Here assignment is a pure function
of (id, salt): the shared md5-derived 60-bit hash (functions/hash64.py,
bit-identical in DuckDB) scaled to [0, 1) and cut at literal thresholds.
Properties that fall out:

- stable under repartitioning, re-ordering, engine, and incremental
  ingest (a new document's split never moves an old one's);
- disjoint and exhaustive by construction (one CASE over one value);
- a different ``salt`` is a fresh independent split — version it;
- oracle-verifiable end to end (the correctness gates hash-compare
  every assignment against DuckDB).

``leakage_safe_split`` closes the classic eval-contamination hole: two
near-duplicate documents must never straddle train and test, or the
model is evaluated on (near-copies of) its training data. Assignment is
therefore made per near-dup CLUSTER — the connected component over the
LSH candidate pairs (operators/docdedup.py) — so every member of a
cluster lands in the same split. Cost at scale: the component join is
the only addition, and components were already computed for dedup.

Threshold arithmetic note: cumulative weights are summed in PYTHON and
embedded as repr'd double literals in both the Column expression and the
oracle SQL — neither engine does float accumulation, so 0.8 + 0.1
rounding cannot diverge between them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdcrypt.functions.hash64 import h60, h60_sql

_SCALE = float(1 << 60)


def _sq(s: str) -> str:
    """Escape a string for interpolation into a SQL single-quoted literal
    (the Spark side uses F.lit and needs none)."""
    return str(s).replace("'", "''")


def unit_hash(col: Column | str, salt: str) -> Column:
    """Deterministic uniform [0, 1) from a column + salt: the 60-bit
    md5 hash of ``CAST(col AS STRING) || ':' || salt`` divided by 2^60.
    NON-NULL inputs only: ``concat_ws`` SKIPS nulls, so every null input
    silently hashes to ``h60(':salt')`` and the whole null population lands
    in ONE split/sample bucket. The split/sample operators below enforce
    this with :func:`checked_id`; callers composing ``unit_hash`` directly
    must guarantee non-null themselves (the oracles hash literal non-null
    keys)."""
    c = F.col(col) if isinstance(col, str) else col
    return h60(F.concat_ws(":", c.cast("string"), F.lit(salt))) / F.lit(_SCALE)


def checked_id(col: Column | str, what: str) -> Column:
    """The id column cast to string, raising at EXECUTION on any NULL —
    a null id must error loudly, not quietly collapse into one bucket
    (``concat_ws`` null-skip). CaseWhen is lazy, so non-null rows never
    evaluate the error branch."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNotNull(), c.cast("string")).otherwise(
        F.raise_error(F.lit(
            f"{what}: NULL id — concat_ws would skip it and hash every "
            "null row into one bucket; filter or fill ids first")))


def unit_hash_sql(expr: str, salt: str) -> str:
    """The DuckDB side of :func:`unit_hash` (oracle fragment)."""
    return (h60_sql(f"CAST({expr} AS VARCHAR) || ':' || '{_sq(salt)}'")
            + f" / {_SCALE!r}")


def _cumulative(weights: dict[str, float]) -> list[tuple[str, float]]:
    if not weights:
        raise ValueError("weights must be a non-empty {label: weight} dict")
    bad = {k: w for k, w in weights.items() if not w > 0}
    if bad:
        raise ValueError(f"weights must be positive, got {bad}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    cum, acc = [], 0.0
    labels = list(weights.items())
    for label, w in labels[:-1]:        # last label takes the remainder
        acc += w
        cum.append((label, acc))
    cum.append((labels[-1][0], None))
    return cum


def split_case(u: Column, weights: dict[str, float]) -> Column:
    """The threshold CASE over an ALREADY-COMPUTED unit hash — callers
    compute the hash once per row (a CASE that embeds the md5 expression
    would recompute it per threshold in both engines)."""
    cum = _cumulative(weights)
    expr = F.lit(cum[-1][0])
    for label, threshold in reversed(cum[:-1]):
        expr = F.when(u < F.lit(threshold), F.lit(label)).otherwise(expr)
    return expr


def split_label(col: Column | str, weights: dict[str, float],
                salt: str = "split-v1") -> Column:
    """The split label as a single Column expression: first label whose
    cumulative threshold exceeds ``unit_hash(col, salt)``. Dict order
    sets the cut order. NOTE: as one expression the hash is re-evaluated
    per threshold — fine for one-off use; the split operators below go
    through a hashed helper column instead (one md5 per row)."""
    return split_case(unit_hash(col, salt), weights)


def split_case_sql(u_expr: str, weights: dict[str, float]) -> str:
    """The DuckDB side of :func:`split_case` — identical literal
    thresholds, identical comparison, so assignments hash-match. Pass a
    cheap ``u_expr`` (a subquery column holding the unit hash)."""
    cum = _cumulative(weights)
    whens = "".join(f" WHEN {u_expr} < {t!r} THEN '{_sq(label)}'"
                    for label, t in cum[:-1])
    return f"CASE{whens} ELSE '{_sq(cum[-1][0])}' END"


def split_label_sql(expr: str, weights: dict[str, float],
                    salt: str = "split-v1") -> str:
    """Single-expression oracle form of :func:`split_label` (same
    per-threshold recompute note)."""
    return split_case_sql(unit_hash_sql(expr, salt), weights)


def deterministic_split(df: DataFrame, weights: dict[str, float],
                        id_col: str = "doc_id", salt: str = "split-v1",
                        out_col: str = "split") -> DataFrame:
    """Append a reproducible split label keyed on ``id_col`` (one md5
    per row via a hashed helper column). NULL ids raise at execution."""
    u = unit_hash(checked_id(id_col, "deterministic_split"), salt)
    return (df.withColumn("_u", u)
            .withColumn(out_col, split_case(F.col("_u"), weights))
            .drop("_u"))


def deterministic_sample(df: DataFrame, fraction: float,
                         id_col: str = "doc_id",
                         salt: str = "sample-v1") -> DataFrame:
    """Keep a deterministic ``fraction`` of rows keyed on ``id_col`` —
    stable under repartitioning and engine, unlike ``df.sample``. Nested
    samples with the SAME salt: a 0.1 sample is a subset of a 0.25 sample
    (both cut the same unit hash), which is exactly what staged
    experiments want; use different salts for independent draws."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    u = unit_hash(checked_id(id_col, "deterministic_sample"), salt)
    return df.where(u < F.lit(float(fraction)))


def stratified_sample(df: DataFrame, fractions: dict, strata_col: str,
                      id_col: str = "doc_id",
                      salt: str = "sample-v1") -> DataFrame:
    """Per-stratum deterministic sampling: ``fractions`` maps a stratum
    value to its keep fraction (missing strata keep nothing). The hash is
    keyed on the id ONLY, so changing one stratum's fraction never
    reshuffles another's sample (and nested-subset behavior holds
    per stratum)."""
    u = unit_hash(checked_id(id_col, "stratified_sample"), salt)
    keep = F.lit(0.0)
    for value, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1]")
        keep = F.when(F.col(strata_col) == F.lit(value),
                      F.lit(float(frac))).otherwise(keep)
    return df.where(u < keep)


def quota_sample(df: DataFrame, quotas: dict, strata_col: str,
                 id_col: str = "doc_id", salt: str = "sample-v1") -> DataFrame:
    """Exact per-stratum quotas ("10k docs per language"): keep each
    stratum's ``n`` smallest unit-hashes. Deterministic and
    engine/layout-stable like the rate samples, and NESTED under one
    salt: a smaller quota is a prefix of a larger one's hash order, so
    staged experiments downsample consistently. Strata not listed keep
    nothing. Ties are broken by id (hash collisions).

    Differs from :func:`stratified_sample` (rate-based, zero-shuffle)
    in guaranteeing exact counts when the stratum is large enough — the
    price is ONE exchange for the per-stratum rank. Scale: the filter
    conjunct ``rank <= max(quota)`` is a literal, so Spark's rank-limit
    pushdown (WindowGroupLimit) pre-filters map-side — the shuffle
    carries O(partitions x quota) rows, not the corpus."""
    if not quotas:
        raise ValueError("quotas must be non-empty")
    for value, n in quotas.items():
        if not isinstance(n, int) or n < 0:
            raise ValueError(f"quota for {value!r} must be an int >= 0")
    from pyspark.sql import Window
    u = unit_hash(checked_id(id_col, "quota_sample"), salt)
    w = Window.partitionBy(strata_col).orderBy(
        F.col("_u").asc(), F.col(id_col).asc())
    limit = F.lit(0)
    for value, n in quotas.items():
        limit = F.when(F.col(strata_col) == F.lit(value),
                       F.lit(int(n))).otherwise(limit)
    max_q = max(quotas.values())
    return (df.withColumn("_u", u)
            .withColumn("_rk", F.row_number().over(w))
            .where((F.col("_rk") <= F.lit(max_q)) & (F.col("_rk") <= limit))
            .drop("_u", "_rk"))


def shuffle_dataset(df: DataFrame, num_shards: int,
                    id_col: str = "doc_id", salt: str = "shuffle-v1",
                    with_rank: bool = False) -> DataFrame:
    """Deterministic global shuffle for training export: every row gets a
    ``shard`` and a 60-bit ``sort_key``, and the corpus's shuffled order
    is (shard asc, sort_key asc, id asc) — a pure function of (id, salt),
    so the permutation is identical across engines, layouts, cluster
    sizes, and incremental re-runs (append-only corpora keep old rows'
    positions within their shard). A different ``salt`` is a fresh
    independent permutation — version it per training run.

    Scale design — NO global range sort: ``orderBy(rand())`` needs a
    range-partitioner sampling job and produces skew-prone ranges, and a
    global row_number is a single-task reduction. Here shard assignment
    is one hash (balanced by construction, ±O(sqrt) binomial deviation)
    and ordering is LOCAL per shard: export writes with
    ``repartition(num_shards, shard).sortWithinPartitions(sort_key, id)``
    — one exchange, each task streams one sorted shard file, nothing
    driver-side. Readers consume shards in index order (or any order —
    shards are independent uniform samples, which is exactly what
    epoch-shuffled training wants).

    ``with_rank=True`` additionally materializes the dense within-shard
    position (``shard_rank``) via a per-shard window — one task per
    shard, so use it for verification/small corpora, not the 100 TB
    export path (the sorted write above never needs the dense rank)."""
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    h = h60(F.concat_ws(":", checked_id(id_col, "shuffle_dataset"),
                        F.lit(salt)))
    out = (df.withColumn("sort_key", h)
           .withColumn("shard", F.pmod(F.col("sort_key"),
                                       F.lit(num_shards)).cast("int")))
    if with_rank:
        from pyspark.sql import Window
        w = Window.partitionBy("shard").orderBy(
            F.col("sort_key").asc(), F.col(id_col).asc())
        out = out.withColumn("shard_rank", F.row_number().over(w))
    return out


def write_shuffled(df: DataFrame, path: str, num_shards: int,
                   id_col: str = "doc_id", salt: str = "shuffle-v1",
                   mode: str = "error") -> None:
    """Materialize :func:`shuffle_dataset`'s permutation: one SORTED
    parquet file per ``shard=N`` directory — the export path the shuffle
    contract promises. Each shard is clustered into one task
    (repartition on the shard value) and written pre-sorted by
    (sort_key, id), so the global shuffled order is simply shard dirs in
    index order, rows in file order; a training reader streams shards
    (in any order — each is an independent uniform sample) with zero
    further sorting. One exchange total, no global range sort, no
    driver-side work, deterministic bytes for a given (corpus, salt)."""
    out = shuffle_dataset(df, num_shards, id_col=id_col, salt=salt)
    (out.repartition(num_shards, F.col("shard"))
        .sortWithinPartitions("shard", "sort_key", id_col)
        .write.mode(mode).partitionBy("shard").parquet(path))


def shuffle_dataset_sql(id_expr: str, salt: str, num_shards: int) -> str:
    """DuckDB replica of :func:`shuffle_dataset`'s (sort_key, shard)."""
    h = h60_sql(f"CAST({id_expr} AS VARCHAR) || ':' || '{_sq(salt)}'")
    return (f"{h} AS sort_key, "
            f"CAST(({h}) % {num_shards} AS INTEGER) AS shard")


def _check_shares(shares: dict[str, float]) -> None:
    if not shares:
        raise ValueError("shares must be a non-empty {domain: share} dict")
    bad = {k: w for k, w in shares.items() if not w > 0}
    if bad:
        raise ValueError(f"shares must be positive, got {bad}")
    total = sum(shares.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"shares must sum to 1, got {total}")


def _mixture_fractions(docs: DataFrame, shares: dict[str, float],
                       domain_col: str, text_col: str,
                       token_budget: int | None,
                       budget_factor: float | None) -> DataFrame:
    """Per-domain keep/repeat fraction for a token-share mixture:
    ``fraction_d = share_d * T / tokens_d`` where T is the mix's total
    token budget. Tiny relation (one row per listed domain) computed
    IN-PLAN: one aggregation pass over the corpus for the exact per-domain
    token totals, one 1-row reduction for the natural budget, zero driver
    collects.

    Float-identity contract with the DuckDB oracle: token totals are
    EXACT int64 sums; every double op (cast, divide, multiply, min) is an
    IEEE-754 correctly-rounded primitive written in the SAME order on
    both sides, so the fractions are bit-identical across engines — the
    same discipline as the split thresholds above, extended to in-engine
    arithmetic (no float ACCUMULATION happens: sums are integral, min is
    selection)."""
    from cdcrypt.functions.text import token_count

    _check_shares(shares)
    if token_budget is not None and budget_factor is not None:
        raise ValueError("pass token_budget OR budget_factor, not both")
    if token_budget is not None and not token_budget > 0:
        raise ValueError(f"token_budget must be > 0, got {token_budget}")
    if budget_factor is not None and not budget_factor > 0:
        raise ValueError(f"budget_factor must be > 0, got {budget_factor}")
    share_col = F.lit(None).cast("double")
    for value, w in shares.items():
        share_col = F.when(F.col(domain_col) == F.lit(value),
                           F.lit(float(w))).otherwise(share_col)
    tot = (docs.where(F.col(domain_col).isin(list(shares)))
           .groupBy(domain_col)
           .agg(F.sum(token_count(F.col(text_col))).alias("n_tokens"),
                F.count(F.lit(1)).alias("n_docs"))
           .withColumn("share", share_col))
    ntok_d = F.col("n_tokens").cast("double")
    if token_budget is not None:
        budget = F.lit(float(token_budget))
        tot = tot.withColumn("_T", budget)
    else:
        # natural budget: the largest mix needing no upsampling, scaled
        nat = tot.agg(F.min(ntok_d / F.col("share")).alias("_t0"))
        tot = tot.crossJoin(F.broadcast(nat)).withColumn(
            "_T", F.col("_t0") * F.lit(float(budget_factor or 1.0))
        ).drop("_t0")
    return tot.withColumn(
        "fraction", F.col("share") * F.col("_T") / ntok_d).drop("_T")


def mixture_plan(docs: DataFrame, shares: dict[str, float],
                 domain_col: str = "source", text_col: str = "text",
                 token_budget: int | None = None,
                 budget_factor: float | None = None) -> DataFrame:
    """The mixture's resolved sampling plan, one row per listed domain:
    ``(domain_col, n_docs, n_tokens, share, fraction)`` — inspect/record
    this before a training export (the LLaMA-style "what got up/downsampled
    how much" table). ``fraction`` is rounded to 6 decimals for display
    and oracle stability; :func:`mixture_by_tokens` decides on the
    unrounded value. Domains absent from ``shares`` are excluded; listed
    domains with no rows simply don't appear (they contribute no tokens —
    validate upstream if absence is an error)."""
    fr = _mixture_fractions(docs, shares, domain_col, text_col,
                            token_budget, budget_factor)
    return fr.select(domain_col, "n_docs", "n_tokens", "share",
                     F.round(F.col("fraction"), 6).alias("fraction"))


def mixture_by_tokens(docs: DataFrame, shares: dict[str, float],
                      domain_col: str = "source", text_col: str = "text",
                      id_col: str = "doc_id", token_budget: int | None = None,
                      budget_factor: float | None = None,
                      salt: str = "mix-v1", max_epochs: int = 64) -> DataFrame:
    """Token-budget domain mixture — the data-mixing step of a pretraining
    pipeline ("40% web, 30% code, 2.4 epochs of wikipedia"): resample the
    corpus so each listed domain contributes ``shares[d]`` of the mix's
    TOKENS, down- OR up-sampling as needed. Returns the mixed corpus:
    ``docs.*`` + ``epoch`` (0-based copy index — a document kept ``c``
    times appears with epochs ``0..c-1``).

    Budget: ``token_budget`` fixes the mix's total tokens T absolutely;
    ``budget_factor`` scales the natural budget T0 = min_d(tokens_d /
    share_d) (the largest T needing no upsampling — factor 1.0 makes the
    binding domain keep everything, 2.0 trains ~2 epochs of it). With
    ``fraction_d = share_d * T / tokens_d``, every document of domain d
    appears ``floor(fraction_d)`` times plus one more iff its unit hash
    falls under the remainder — so realized token mass is unbiased per
    domain with binomial deviation only, and the decision is a pure
    function of (id, salt): engine/layout/ingest-stable like every
    sampler here, and nested across budgets under one salt (a bigger
    budget never drops a copy a smaller one kept). NULL ids raise at
    execution; fractions over ``max_epochs`` raise at execution (a
    fat-finger share on a tiny domain would otherwise explode the
    corpus).

    Scale shape: one aggregation pass for exact per-domain token totals
    (map-side combined, #domains rows), a broadcast join of the fraction
    relation onto the corpus, and a per-row ``explode(sequence(0,
    floor(f)))`` whose output is exactly the mix — no shuffle of the
    corpus itself, no driver-side arithmetic."""
    fr = _mixture_fractions(docs, shares, domain_col, text_col,
                            token_budget, budget_factor)
    f = F.when(
        F.col("fraction") <= F.lit(float(max_epochs)), F.col("fraction")
    ).otherwise(F.raise_error(F.concat(
        F.lit(f"mixture_by_tokens: fraction for domain "),
        F.col(domain_col),
        F.lit(f" exceeds max_epochs={max_epochs} — share vs domain size "
              "implies a runaway upsample; raise max_epochs if intended"))))
    u = unit_hash(checked_id(id_col, "mixture_by_tokens"), salt)
    full = F.floor(F.col("_f"))
    return (
        docs.join(F.broadcast(fr.select(domain_col, "fraction")),
                  domain_col, "inner")
        .withColumn("_f", f)
        .withColumn("_u", u)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0).cast("long"),
                                                  full)))
        .where((F.col("epoch") < full)
               | (F.col("_u") < F.col("_f") - full.cast("double")))
        .drop("fraction", "_f", "_u")
    )


def leakage_safe_split(docs: DataFrame, pairs: DataFrame,
                       weights: dict[str, float], id_col: str = "doc_id",
                       salt: str = "split-v1",
                       out_col: str = "split") -> DataFrame:
    """Split with near-dup clusters kept whole: assignment hashes the
    CONNECTED COMPONENT label (min reachable id over the candidate-pair
    graph), so no near-duplicate pair ever straddles two splits —
    eval-set contamination by training near-copies is structurally
    impossible. Singletons hash their own id (component label == id for
    them, so the assignment is consistent with :func:`deterministic_split`
    restricted to un-paired docs).

    ``pairs`` is any (id_a, id_b) near-dup relation — minhash LSH,
    simhash, or embedding pairs. Returns docs + (component, split)."""
    from cdcrypt.operators.docdedup import connected_components
    comps = connected_components(pairs).select(
        F.col("node").alias(id_col), "component")
    return (
        docs.join(comps, id_col, "left")
        .withColumn("component",
                    F.coalesce("component", F.col(id_col)))
        .withColumn("_u", unit_hash(
            checked_id("component", "leakage_safe_split"), salt))
        .withColumn(out_col, split_case(F.col("_u"), weights))
        .drop("_u")
    )
