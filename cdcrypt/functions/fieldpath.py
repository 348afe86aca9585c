"""Field-path compiler: limited-JsonPath strings -> Column rewrites.

Grammar parity with the reference (``README.md:138-148``; compiled per path
at config time, ``Config.java:153-166``):

    $            root
    .name        child (dot notation)
    ['name']     child (bracket notation)
    [n]          array index
    [*]          array wildcard

A path compiles ONCE, driver-side, into a rewrite plan; applying it to a
DataFrame produces a pure Column expression (``withColumn`` /
``withField`` chain), with the crypto UDF as the only Python element.
Wildcards over arrays do NOT expand per record (the reference expands
``[*]`` to concrete ``[0]``,``[1]``,... per record, ``Transform.java:92-97``)
— instead the whole array column flows through one vectorized array UDF,
which is the Spark-native equivalent with identical semantics and order
preservation (SURVEY.md O5).

Mid-path array segments (``$.arr[*].field`` / ``$.arr[n].field`` — the
reference's syntax table permits positional operators anywhere,
``README.md:142-148``, and arrays-of-structs are a legal Connect shape,
nested fixture ``TransformTest.java:43-49``) compile to a struct-suffix
navigation: the leaf values are extracted with ``F.transform`` (wildcard)
or ``element_at`` (index), cryptoed as one batch, and written back with a
``transform`` lambda that rebuilds each struct element via ``withField`` —
still zero per-record Python outside the crypto UDF. Scope: ONE array
segment per path (a second array segment raises ``PathCompileError`` at
config time, mirroring the reference's ``ConfigException`` on invalid
paths, ``Config.java:161-163``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class PathCompileError(ValueError):
    """Invalid or unsupported field path (config-time error)."""


@dataclass(frozen=True)
class Name:
    value: str


@dataclass(frozen=True)
class Index:
    value: int


class Wildcard:
    def __repr__(self) -> str:  # pragma: no cover
        return "Wildcard()"


WILDCARD = Wildcard()

_TOKEN = re.compile(
    r"""
    \.(?P<dot>[A-Za-z_][A-Za-z0-9_\-]*)      # .name
  | \[\s*'(?P<sq>[^']*)'\s*\]                 # ['name']
  | \[\s*"(?P<dq>[^"]*)"\s*\]                 # ["name"]
  | \[\s*(?P<idx>\d+)\s*\]                    # [n]
  | \[\s*\*\s*\]                              # [*]
    """,
    re.VERBOSE,
)


def parse_path(path: str) -> list[object]:
    """Parse a path string into segments. ``$`` prefix optional."""
    if not isinstance(path, str) or not path.strip():
        raise PathCompileError(f"empty field path: {path!r}")
    s = path.strip()
    if s.startswith("$"):
        s = s[1:]
    elif not s.startswith("."):
        s = "." + s  # allow bare "a.b" form
    segs: list[object] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            raise PathCompileError(f"invalid field path {path!r} at offset {pos}")
        if m.group("dot") is not None:
            segs.append(Name(m.group("dot")))
        elif m.group("sq") is not None:
            segs.append(Name(m.group("sq")))
        elif m.group("dq") is not None:
            segs.append(Name(m.group("dq")))
        elif m.group("idx") is not None:
            segs.append(Index(int(m.group("idx"))))
        else:
            segs.append(WILDCARD)
        pos = m.end()
    if not segs:
        raise PathCompileError(f"path selects the root record, unsupported: {path!r}")
    return segs


@dataclass(frozen=True)
class CompiledPath:
    """Driver-side compiled form: struct-name prefix + up to TWO array
    segments, each with its own struct-name suffix
    (``$.a.b[*].c.d`` -> names=(a,b), wildcard, suffix=(c,d);
    ``$.turns[*].tool_calls[*].args`` -> names=(turns,), wildcard,
    suffix=(tool_calls,), inner wildcard, inner_suffix=(args,))."""

    names: tuple[str, ...]  # struct navigation (a, b, c)
    array_index: int | None = None  # outer [n] segment
    array_wildcard: bool = False  # outer [*] segment
    suffix: tuple[str, ...] = ()  # struct navigation under each array element
    inner_index: int | None = None  # second [n] segment (nested array)
    inner_wildcard: bool = False  # second [*] segment (nested array)
    inner_suffix: tuple[str, ...] = ()  # struct navigation under inner elems

    @property
    def is_array(self) -> bool:
        return self.array_wildcard or self.array_index is not None

    @property
    def has_inner(self) -> bool:
        return self.inner_wildcard or self.inner_index is not None

    @property
    def vector_crypto(self) -> bool:
        """True when the crypto input is an array<string> (one array UDF
        call); False when it is a scalar (``[n].field`` and ``[n]...[m].f``
        select one leaf)."""
        if self.has_inner:
            return self.array_wildcard or self.inner_wildcard
        return self.array_wildcard or (
            self.array_index is not None and not self.suffix)


def compile_path(path: str) -> CompiledPath:
    segs = parse_path(path)
    names: list[str] = []
    i = 0
    while i < len(segs) and isinstance(segs[i], Name):
        names.append(segs[i].value)
        i += 1
    if not names:
        raise PathCompileError(f"path must start with a field name: {path!r}")

    def _take_array(i):
        """(index_or_None, wildcard_bool, suffix, next_i) for one
        array-segment + struct-suffix group starting at segs[i]."""
        tail = segs[i]
        i += 1
        suffix: list[str] = []
        while i < len(segs) and isinstance(segs[i], Name):
            suffix.append(segs[i].value)
            i += 1
        if isinstance(tail, Index):
            return tail.value, False, tuple(suffix), i
        if tail is WILDCARD or isinstance(tail, Wildcard):
            return None, True, tuple(suffix), i
        raise PathCompileError(f"invalid array segment in {path!r}")

    if i == len(segs):
        return CompiledPath(tuple(names))
    idx, wc, suffix, i = _take_array(i)
    if i == len(segs):
        return CompiledPath(tuple(names), array_index=idx,
                            array_wildcard=wc, suffix=suffix)
    iidx, iwc, isuffix, i = _take_array(i)
    if i != len(segs):
        raise PathCompileError(
            f"unsupported path shape {path!r}: at most two array segments "
            "per path"
        )
    return CompiledPath(tuple(names), array_index=idx, array_wildcard=wc,
                        suffix=suffix, inner_index=iidx,
                        inner_wildcard=iwc, inner_suffix=isuffix)


def _nav(names: tuple[str, ...]) -> Column:
    col = F.col(names[0])
    for n in names[1:]:
        col = col.getField(n)
    return col


def _suffix_of(col: Column, suffix: tuple[str, ...]) -> Column:
    for n in suffix:
        col = col.getField(n)
    return col


def select_column(cp: CompiledPath) -> Column:
    """Column that feeds the crypto UDF:

    - plain struct path -> the scalar leaf;
    - terminal ``[*]`` / ``[n]`` -> the whole array (array UDF handles the
      index);
    - ``[*].field`` -> array of extracted leaves (one ``F.transform`` pass);
    - ``[n].field`` -> the single extracted leaf (scalar; out-of-range ->
      NULL -> crypto passthrough);
    - nested ``[*]...[*]`` -> the NESTED array<array> of leaves (null inner
      arrays preserved; the nested array UDF flattens into one crypto batch
      and regroups by span — alignment lives in Python, not in a Catalyst
      prefix-sum, because an offset ``aggregate`` nested two lambda scopes
      deep blocks Python-UDF extraction: the UDF child ends up inside an
      interpreted projection, INTERNAL_ERROR on Spark 4); ``[*]...[n]`` ->
      one leaf per outer element; ``[n]...[*]`` -> that element's leaf
      array; ``[n]...[m]`` -> the single leaf (scalar).
    """
    col = _nav(cp.names)
    if not cp.is_array:
        return col
    if cp.has_inner:
        if cp.array_wildcard:
            if cp.inner_wildcard:
                return F.transform(col, lambda x: F.transform(
                    _suffix_of(x, cp.suffix),
                    lambda y: _suffix_of(y, cp.inner_suffix)))
            return F.transform(col, lambda x: _suffix_of(
                F.get(_suffix_of(x, cp.suffix), cp.inner_index),
                cp.inner_suffix))
        inner = _suffix_of(F.get(col, cp.array_index), cp.suffix)
        if cp.inner_wildcard:
            return F.transform(inner,
                               lambda y: _suffix_of(y, cp.inner_suffix))
        return _suffix_of(F.get(inner, cp.inner_index), cp.inner_suffix)
    if not cp.suffix:
        return col  # array UDF consumes the array itself
    if cp.array_wildcard:
        return F.transform(col, lambda x: _suffix_of(x, cp.suffix))
    return _suffix_of(F.get(col, cp.array_index), cp.suffix)


def path_exists(df: DataFrame, cp: CompiledPath) -> bool:
    """Schema-time existence check — missing/optional target fields are
    silently skipped (``Transform.java:99-101``, ``TransformTest.java:176-183``)."""
    dt = df.schema
    fields = {f.name: f.dataType for f in dt.fields}
    cur = fields
    t = None
    for i, n in enumerate(cp.names):
        if not isinstance(cur, dict) or n not in cur:
            return False
        t = cur[n]
        if i < len(cp.names) - 1:
            if not hasattr(t, "fields"):
                return False
            cur = {f.name: f.dataType for f in t.fields}
    if not cp.suffix and not cp.has_inner:
        return True
    # array-of-structs: t must be ArrayType whose elementType carries suffix
    et = getattr(t, "elementType", None)
    if et is None:
        return False
    for n in cp.suffix:
        if not hasattr(et, "fields"):
            return False
        sub = {f.name: f.dataType for f in et.fields}
        if n not in sub:
            return False
        et = sub[n]
    if not cp.has_inner:
        return True
    # nested array segment: the suffix target must itself be an array
    et = getattr(et, "elementType", None)
    if et is None:
        return False
    for n in cp.inner_suffix:
        if not hasattr(et, "fields"):
            return False
        sub = {f.name: f.dataType for f in et.fields}
        if n not in sub:
            return False
        et = sub[n]
    return True


def rewrite(df: DataFrame, cp: CompiledPath, new_value: Column) -> DataFrame:
    """Replace the value at ``cp`` with ``new_value`` (a Column computed from
    :func:`select_column`'s output), preserving the rest of the row — the
    writeback half of the transform (``Transform.java:106-121``).

    Mid-path array shapes rebuild the array with ``F.transform``: the crypto
    UDF column is evaluated once per row into a temp column (its own
    ArrowEvalPython node — Catalyst forbids a Python UDF expression inside a
    higher-order-function lambda), then zipped back element-by-element inside
    whole-stage codegen and the temp dropped.
    """
    top = cp.names[0]
    drop_tmp = None
    if cp.has_inner:
        tmp = "__cdcrypt_leaf_tmp"
        df = df.withColumn(tmp, new_value)
        leaf = F.col(tmp)
        drop_tmp = tmp
        arr = _nav(cp.names)
        osub = ".".join(f"`{n}`" for n in cp.suffix)
        isub = ".".join(f"`{n}`" for n in cp.inner_suffix)

        def inner_of(x):
            return _suffix_of(x, cp.suffix)

        def put_leaf(y, value):
            # rebuild one inner element with its new leaf
            return y.withField(isub, value) if cp.inner_suffix else value

        def put_inner(x, new_inner):
            # rebuild one outer element with its new inner array
            return x.withField(osub, new_inner) if cp.suffix else new_inner

        if cp.array_wildcard and cp.inner_wildcard:
            # leaf: NESTED rewritten leaves, index-aligned with arr at both
            # levels (the nested array UDF preserved shape). The writeback
            # uses only element_at over the leaf ATTRIBUTE + lambda vars —
            # deliberately no aggregate/slice offsets here: a HOF nested
            # two lambda scopes deep in an expression that later becomes a
            # Python-UDF child (decrypt over an encrypted column) defeats
            # UDF extraction and dies in an interpreted projection.
            new_value = F.transform(
                arr,
                lambda x, i: F.when(inner_of(x).isNull(), x).otherwise(
                    put_inner(x, F.transform(
                        inner_of(x),
                        lambda y, j: put_leaf(
                            y, F.element_at(F.element_at(leaf, i + 1),
                                            j + 1))))),
            )
        elif cp.array_wildcard:
            # inner [m]: leaf is index-aligned with the OUTER array
            m = cp.inner_index
            new_value = F.transform(
                arr,
                lambda x, i: F.when(inner_of(x).isNull(), x).otherwise(
                    put_inner(x, F.transform(
                        inner_of(x),
                        lambda y, j: F.when(
                            j == F.lit(m),
                            put_leaf(y, F.element_at(leaf, i + 1))
                        ).otherwise(y)))),
            )
        elif cp.inner_wildcard:
            # outer [n]: leaf is that element's rewritten leaf array
            n_idx = cp.array_index
            new_value = F.transform(
                arr,
                lambda x, i: F.when(
                    (i == F.lit(n_idx)) & inner_of(x).isNotNull(),
                    put_inner(x, F.transform(
                        inner_of(x),
                        lambda y, j: put_leaf(y, F.element_at(leaf, j + 1))))
                ).otherwise(x),
            )
        else:
            # [n]...[m]: leaf is the single rewritten scalar
            n_idx, m = cp.array_index, cp.inner_index
            new_value = F.transform(
                arr,
                lambda x, i: F.when(
                    (i == F.lit(n_idx)) & inner_of(x).isNotNull(),
                    put_inner(x, F.transform(
                        inner_of(x),
                        lambda y, j: F.when(j == F.lit(m),
                                            put_leaf(y, leaf)).otherwise(y)))
                ).otherwise(x),
            )
        # Catalyst guard (measured on Spark 4.1, see tests): a nested-array
        # rebuild that references the crypto-UDF column inside depth-2
        # lambdas must NOT be inlined into a LATER Python UDF's child
        # (encrypt -> decrypt chains): extraction then fails and the UDF
        # dies in an interpreted projection (INTERNAL_ERROR "Cannot
        # evaluate expression"). CollapseProject ALWAYS inlines a
        # deterministic single-reference projection, so the only
        # expression-level off switch is the nondeterminism bit.
        # shuffle() of a singleton array is the identity, but is flagged
        # nondeterministic and — unlike an always-true rand() comparison,
        # which Spark 4 constant-folds away — survives the optimizer.
        # Cost: one 1-element array wrap per row and no filter pushdown
        # through the rewritten column — irrelevant for ciphertext arrays.
        new_value = F.element_at(F.shuffle(F.array(new_value)), 1)
    elif cp.suffix:
        tmp = "__cdcrypt_leaf_tmp"
        df = df.withColumn(tmp, new_value)
        leaf = F.col(tmp)
        drop_tmp = tmp
        arr = _nav(cp.names)
        sub = ".".join(f"`{n}`" for n in cp.suffix)
        if cp.array_wildcard:
            # leaf: array of rewritten leaves, index-aligned with arr
            new_value = F.transform(
                arr,
                lambda x, i: x.withField(sub, F.element_at(leaf, i + 1)),
            )
        else:
            n_idx = cp.array_index
            # leaf: the single rewritten leaf for element [n]
            new_value = F.transform(
                arr,
                lambda x, i: F.when(i == F.lit(n_idx),
                                    x.withField(sub, leaf)).otherwise(x),
            )
    if len(cp.names) == 1:
        out = df.withColumn(top, new_value)
        return out.drop(drop_tmp) if drop_tmp else out
    # nested: rebuild the top-level struct column with withField at the
    # dotted sub-path (Spark resolves a.b.c inside withField natively)
    sub = ".".join(f"`{n}`" for n in cp.names[1:])
    out = df.withColumn(top, F.col(top).withField(sub, new_value))
    return out.drop(drop_tmp) if drop_tmp else out
