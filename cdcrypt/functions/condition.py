"""Row-level condition gate (O6) — a per-row branch, NOT a filter.

Reference semantics (``Conditions.java:17-44``, gate applied
``Transform.java:87-89``; tests ``ConditionsTest.java:16-45``,
``TransformTest.java:165-173``):

- equality of the value at ``condition.field`` against ``condition.equals``,
  compared on the string form (``toString`` comparison);
- existential over multi-valued paths: ANY matching instance accepts;
- missing field or empty selection -> reject (gate false);
- rows failing the gate pass through UNMODIFIED (they are not dropped).

Compiled once, driver-side, into a boolean Column; Catalyst short-circuits
the CASE WHEN so non-matching rows skip the crypto UDF entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdcrypt.functions.fieldpath import CompiledPath, compile_path, path_exists, select_column


def compile_condition(
    df: DataFrame, field: str | None, equals: str | None
) -> Column:
    """Boolean gate Column. ``field is None`` -> accept-all
    (``Conditions.java:25-30``)."""
    if field is None:
        return F.lit(True)
    if equals is None:
        raise ValueError("condition.field set without condition.equals "
                         "(both-or-neither, Config.java:170-180)")
    cp: CompiledPath = compile_path(field)
    if not path_exists(df, cp):
        return F.lit(False)  # missing field -> reject (Conditions.java:34-36)
    target = F.lit(str(equals))
    if cp.array_wildcard or cp.inner_wildcard:
        # select_column yields the leaf array for every wildcard shape
        # (nested [*]...[*] yields array<array>: flatten for the match,
        # null inner arrays contributing nothing) — existential any-match
        # (Conditions.java:38-43); null array -> false
        arr = select_column(cp)
        if cp.array_wildcard and cp.inner_wildcard:
            arr = F.flatten(F.transform(
                arr, lambda a: F.coalesce(a, F.array())))
        return F.coalesce(
            F.exists(arr, lambda x: x.cast("string") == target), F.lit(False)
        )
    if (cp.array_index is not None and not cp.suffix
            and not cp.has_inner):
        # terminal [n]: select yields the raw array, pick the element
        v = F.element_at(select_column(cp), cp.array_index + 1)
        return F.coalesce(v.cast("string") == target, F.lit(False))
    # plain scalar path, [n].field, and [n]...[m].field all select the leaf
    v = select_column(cp)
    return F.coalesce(v.cast("string") == target, F.lit(False))
