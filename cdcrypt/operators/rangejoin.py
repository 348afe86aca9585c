"""Bucketed range join: interval-containment joins without a cross product.

``points JOIN intervals ON start <= ts < end`` is the classic Spark
pain point: expressed directly it is a non-equi join, which the planner
can only execute as BroadcastNestedLoopJoin (broadcast one whole side)
or CartesianProduct — both O(|points| x |intervals|) and both fatal at
scale. The standard distributed fix (same recipe as Databricks' range
join optimization and the interval-join of stream processors) is TIME
BINNING:

1. pick a bin width >= the longest interval;
2. each interval replicates to the bins it overlaps (<= 2 when the
   width bound holds);
3. each point lands in exactly ONE bin;
4. equi-join on the bin key, then re-check the precise range predicate
   on the original full-precision timestamps.

Every point has one bin, so a point matches a 2-bin interval at most
once — no post-join dedup. Shuffle volume is |points| + 2|intervals|
rows hashed by bin: linear, skew governed by events-per-bin (bin width
is the knob, and a hot bin can additionally be salted by the point-side
id like any hot key). The bin-width precondition is ENFORCED: an
interval longer than ``bin_seconds`` raises at execution instead of
silently losing matches.

Engine context: the reference SMT has no joins at all (SURVEY §2.4);
this operator serves the engine's CDC-side consumers — incident
windows over a change stream, SCD2-style validity assignment, session
containment — wherever "which window does this event fall in" must run
at stream scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join"]


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_seconds: int = 600,
    salt_k: int = 1,
) -> DataFrame:
    """All (interval, point) pairs with ``start <= ts < end``.

    Output columns: every ``intervals`` column, then every ``points``
    column (names must not collide — rename before calling). The range
    is half-open (end exclusive) and evaluated on the full-precision
    original timestamps; the bins only route the join.

    ``bin_seconds`` must be >= the longest interval; violations raise
    at execution (never a silent miss). Smaller bins shrink per-bin
    fan-in for dense streams; bins are derived from exact integer epoch
    microseconds, so the same wall-time always lands in the same bin on
    every engine. Inverted intervals (end < start) also raise — a
    corrupt upstream row must fail loud, not silently explode into one
    replica per bin between the two epochs.

    ``salt_k > 1`` splits each bin's POINT population into ``salt_k``
    sub-partitions (hash of the point timestamp) and replicates the
    interval side to all of them — the standard hot-key salt, for when
    one time bin holds a burst (flash-crowd minute) that would
    otherwise pin a single reducer. Costs ``salt_k`` x interval
    replication, never changes results.
    """
    if bin_seconds <= 0:
        raise ValueError(f"bin_seconds must be positive, got {bin_seconds}")
    if salt_k < 1:
        raise ValueError(f"salt_k must be >= 1, got {salt_k}")
    s, e = F.col(start_col), F.col(end_col)
    ts = F.col(point_ts)
    bin_us = F.lit(int(bin_seconds) * 1_000_000)

    def micros(c):
        # exact integer epoch microseconds — no double ulp; TIMESTAMP_NTZ
        # (parquet us-without-tz) first casts to TIMESTAMP under the UTC
        # session TZ (cdcrypt.session). Bins only ROUTE the join; the
        # precise predicate below compares the original columns.
        return F.unix_micros(c.cast("timestamp"))

    def fdiv(a, b):
        # exact integer floor division on long Columns: (a - pmod(a,b))
        # is an exact multiple of b, so the double division is exact —
        # a plain a/b at epoch-microsecond magnitudes has quotient ulp
        # ~5e-7, large enough to round an edge-adjacent value across an
        # integer boundary (the same bug class as the epsilon this
        # replaced). pmod gives floor semantics for negative epochs too.
        return ((a - F.pmod(a, b)) / b).cast("long")

    us_s, us_e = micros(s), micros(e)
    # a well-formed interval has start <= end AND fits one bin width. An
    # inverted interval (corrupt upstream row) would otherwise make
    # sequence() count DOWN through every bin between the two epochs — a
    # silent million-replica explosion — so BOTH violations raise.
    ok = (us_e >= us_s) & ((us_e - us_s) <= bin_us)
    checked_end_us = F.when(ok, us_e).otherwise(
        F.raise_error(F.concat(
            F.lit(f"range_join: interval inverted or longer than "
                  f"bin_seconds={bin_seconds}; fix the interval or raise "
                  "bin_seconds (start="),
            s.cast("string"), F.lit(" end="), e.cast("string"),
            F.lit(")"))))

    ib = intervals.withColumn(
        "__bin",
        F.explode(F.sequence(
            fdiv(us_s, bin_us),
            # end is exclusive: an interval ending exactly on a bin edge
            # does not reach into that bin — exact integer floor of
            # (end_us - 1), not a sub-ulp double epsilon
            fdiv(checked_end_us - F.lit(1), bin_us),
        )))
    pb = points.withColumn("__bin", fdiv(micros(ts), bin_us))
    keys = ["__bin"]
    if salt_k > 1:
        ib = ib.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_k - 1))))
        pb = pb.withColumn("__salt", F.pmod(F.hash(ts), F.lit(salt_k)))
        keys.append("__salt")
    return (
        pb.join(ib, keys)
        .where((s <= ts) & (ts < e))
        # interval columns first, point columns after — a stable contract
        .select(*intervals.columns, *points.columns)
    )
