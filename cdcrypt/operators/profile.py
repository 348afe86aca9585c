"""Corpus profiling: per-column statistics + deterministic HyperLogLog.

Before a 100 TB corpus is curated, a pipeline needs to SEE it: null
rates, value-length distributions, and distinct cardinalities per column
decide dedup keys, partition columns, and quality filters. Exact
``COUNT(DISTINCT col)`` at that scale is a full shuffle of every value
per column; the standard answer is HyperLogLog (Flajolet et al. 2007 —
the same sketch behind Spark's ``approx_count_distinct`` and DuckDB's
``approx_count_distinct``). Neither engine's builtin is usable here,
though: their register hashing is engine-private, so the two sides of
the correctness gate could never agree. This module implements HLL from
the repo's cross-engine 60-bit md5 family (functions/hash64.py), making
the whole profile — including the cardinality estimate — bit-replicable
in DuckDB SQL.

Determinism details that make the oracle possible:
- register index = h60(value) % 2^p, rank = zeros-in-the-top-(60-p)-bits
  + 1, computed via integer-exact binary-string length (``conv(x,10,2)``
  / DuckDB ``bin(x)``) — no floating log2 at cell boundaries;
- the estimate folds registers with the canonical alpha_m * m^2 /
  sum(2^-M_j) formula plus the small-range linear count; the float fold
  is over <= 2^p doubles and the result is ROUNDED to a long, so
  register-order FP noise (~1e-12 relative) cannot move the reported
  value;
- values hash via their canonical string rendering (CAST AS VARCHAR on
  both engines), the same contract the split/sample family uses.

Scale shape (the part that matters at 10^10 rows): ONE pass over the
data in long form (``stack`` — no join, no self-union), then two
map-side-combining aggregations whose post-shuffle cardinality is
``n_cols`` rows (moment stats) and ``n_cols * 2^p`` rows (registers) —
independent of input row count. No collect, no window, no skew (the
group keys are (col) and (col, register), both bounded and uniform by
construction of the hash).

Reference parity note: the reference SMT transforms records and has no
profiling surface; this operator exists for the engine's own
training-data pipeline tier (SURVEY.md §2.5), patterned on published
HLL, not on reference code.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdcrypt.functions.hash64 import h60, h60_sql

DEFAULT_P = 12  # 4096 registers, ~1.6% standard error


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def _rank_col(w: Column, wbits: int) -> Column:
    """Leading-zero rank of the top ``wbits`` bits of a long: wbits -
    bitlength(w) + 1, with the all-zero word mapping to wbits + 1.
    bitlength via length(conv(w, 10, 2)) — integer-exact, and identical
    to DuckDB's length(bin(w)) modulo bin()'s fixed-width zero padding
    (the oracle strips it with ltrim)."""
    return F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.conv(w.cast("string"), 10, 2)))


def hll_registers(df: DataFrame, col: str, p: int = DEFAULT_P,
                  salt: str = "") -> DataFrame:
    """(register, max_rank) for the non-null values of ``col`` — the
    mergeable HLL state (union sketches by max-ing registers). Exposed
    separately so incremental profiles can persist and fold per-epoch
    register tables instead of rescanning the corpus."""
    m = 1 << p
    h = h60(F.concat(F.col(col).cast("string"), F.lit(salt)))
    return (df.where(F.col(col).isNotNull())
              .select((h % m).alias("register"),
                      # shiftright, NOT float division: h/4096 needs the
                      # full 48-bit quotient and doubles round past 2^53
                      _rank_col(F.shiftright(h, p), 60 - p).alias("rank"))
              .groupBy("register").agg(F.max("rank").alias("max_rank")))


def hll_estimate_from_registers(registers: list[tuple[int, int]],
                                p: int = DEFAULT_P) -> int:
    """Fold (register, max_rank) pairs to the HLL cardinality estimate
    (driver-side: at most 2^p pairs). Canonical bias paths: linear
    counting under 2.5m with empty registers; raw estimate otherwise
    (the 60-bit hash space makes the large-range correction moot)."""
    m = 1 << p
    s = float(m - len(registers))  # empty registers contribute 2^0
    for _, r in registers:
        s += 2.0 ** (-int(r))
    raw = _alpha(m) * m * m / s
    zeros = m - len(registers)
    if raw <= 2.5 * m and zeros > 0:
        return int(round(m * math.log(m / float(zeros))))
    return int(round(raw))


def profile_columns(df: DataFrame, cols: list[str] | None = None,
                    p: int = DEFAULT_P) -> DataFrame:
    """One profile row per column: rows, nulls, distinct_est (HLL),
    and the length moments of the value's string rendering (min/max/avg
    — avg rounded to 6 so the float divide compares stably).

    Single input pass: every row is unpivoted to (col, val) with
    ``stack`` (a generator inside the scan stage — no join/union), then
    two algebraic aggregations. Columns profile their canonical STRING
    rendering — that is the distinct-ness contract. Cross-engine caveat:
    string and integer renderings agree between Spark and DuckDB, but
    float/timestamp renderings differ ('1.0E-4' vs '0.0001'), so the
    correctness oracle (:func:`profile_columns_sql`) is only valid for
    string/integer columns; profiling floats still works, just with
    engine-local renderings."""
    cols = list(cols) if cols is not None else list(df.columns)
    m = 1 << p
    pairs = df.select(F.stack(
        F.lit(len(cols)),
        *[x for c in cols
          for x in (F.lit(c), F.col(c).cast("string"))]
    ).alias("col", "val"))

    moments = (pairs.groupBy("col").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("val").isNull(), 1).otherwise(0))
        .alias("n_nulls"),
        F.min(F.length("val")).alias("min_len"),
        F.max(F.length("val")).alias("max_len"),
        F.round(F.avg(F.length("val")), 6).alias("avg_len")))

    h = h60(F.col("val"))
    regs = (pairs.where(F.col("val").isNotNull())
            .select("col", (h % m).alias("register"),
                    _rank_col(F.shiftright(h, p), 60 - p).alias("rank"))
            .groupBy("col", "register").agg(F.max("rank").alias("max_rank")))

    # register fold -> estimate, still distributed (group key = col):
    # sum(2^-max_rank) over present registers + one 2^0 per empty one
    alpha = _alpha(m)
    est = (regs.groupBy("col").agg(
        F.count(F.lit(1)).alias("present"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("s_present"))
        .select(
            "col",
            F.round(F.when(
                # linear counting branch (small range, empty registers)
                (F.lit(alpha * m * m)
                 / (F.col("s_present") + (F.lit(m) - F.col("present"))))
                <= F.lit(2.5 * m),
                F.when(F.col("present") < m,
                       F.lit(float(m))
                       * F.log(F.lit(float(m))
                               / (F.lit(m) - F.col("present"))))
                .otherwise(F.lit(alpha * m * m) / F.col("s_present")))
            .otherwise(
                F.lit(alpha * m * m)
                / (F.col("s_present") + (F.lit(m) - F.col("present")))), 0)
            .cast("long").alias("distinct_est")))

    return (moments.join(est, "col", "left")
            .select("col", "n_rows", "n_nulls",
                    F.coalesce("distinct_est", F.lit(0)).alias(
                        "distinct_est"),
                    "min_len", "max_len", "avg_len"))


# ---- the DuckDB oracle side (used by the correctness gate) ----

def profile_columns_sql(table: str, cols: list[str],
                        p: int = DEFAULT_P) -> str:
    """ANSI/DuckDB SQL computing exactly :func:`profile_columns` for
    ``cols`` of ``table`` — same hash, same registers, same fold, same
    rounding. Kept next to the operator so the contract evolves in one
    place."""
    m = 1 << p
    # pre-folded and CAST AS DOUBLE: DuckDB parses a bare high-precision
    # literal as DECIMAL, and DECIMAL * 4096 * 4096 overflows DECIMAL(18)
    amm = f"CAST({_alpha(m) * m * m!r} AS DOUBLE)"
    unpivot = " UNION ALL ".join(
        f"SELECT '{c}' AS col, CAST({c} AS VARCHAR) AS val FROM {table}"
        for c in cols)
    h = h60_sql("val")
    return f"""
        WITH pairs AS ({unpivot}),
        moments AS (
            SELECT col, count(*) AS n_rows,
                   CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_nulls,
                   min(length(val)) AS min_len,
                   max(length(val)) AS max_len,
                   round(avg(length(val)), 6) AS avg_len
            FROM pairs GROUP BY col),
        regs AS (
            SELECT col, ({h}) % {m} AS register,
                   max(CASE WHEN ({h}) // {m} = 0 THEN {60 - p + 1}
                       ELSE {60 - p + 1}
                            - length(ltrim(bin(({h}) // {m}), '0'))
                       END) AS max_rank
            FROM pairs WHERE val IS NOT NULL
            GROUP BY col, ({h}) % {m}),
        est AS (
            SELECT col, count(*) AS present,
                   sum(pow(2.0, -max_rank)) AS s_present
            FROM regs GROUP BY col)
        SELECT m.col AS col, m.n_rows AS n_rows, m.n_nulls AS n_nulls,
               CAST(coalesce(CASE WHEN
                   ({amm}
                    / (e.s_present + ({m} - e.present))) <= {2.5 * m!r}
                   THEN round(CASE WHEN e.present < {m}
                        THEN {float(m)!r}
                             * ln({float(m)!r} / ({m} - e.present))
                        ELSE {amm} / e.s_present END, 0)
                   ELSE round({amm}
                        / (e.s_present + ({m} - e.present)), 0)
               END, 0) AS BIGINT) AS distinct_est,
               m.min_len AS min_len, m.max_len AS max_len,
               m.avg_len AS avg_len
        FROM moments m LEFT JOIN est e ON m.col = e.col
    """
