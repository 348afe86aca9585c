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
    """Driver-side compiled form: struct-name prefix + optional array segment
    + optional struct-name suffix (``$.a.b[*].c.d`` -> names=(a,b),
    wildcard, suffix=(c,d))."""

    names: tuple[str, ...]  # struct navigation (a, b, c)
    array_index: int | None = None  # [n] segment
    array_wildcard: bool = False  # [*] segment
    suffix: tuple[str, ...] = ()  # struct navigation under each array element

    @property
    def is_array(self) -> bool:
        return self.array_wildcard or self.array_index is not None

    @property
    def vector_crypto(self) -> bool:
        """True when the crypto input is an array<string> (one array UDF
        call); False when it is a scalar (``[n].field`` selects one leaf)."""
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
    if i == len(segs):
        return CompiledPath(tuple(names))
    tail = segs[i]
    i += 1
    suffix: list[str] = []
    while i < len(segs) and isinstance(segs[i], Name):
        suffix.append(segs[i].value)
        i += 1
    if i != len(segs):
        raise PathCompileError(
            f"unsupported path shape {path!r}: at most one array segment per "
            "path (nested arrays not supported)"
        )
    if isinstance(tail, Index):
        return CompiledPath(tuple(names), array_index=tail.value,
                            suffix=tuple(suffix))
    if tail is WILDCARD or isinstance(tail, Wildcard):
        return CompiledPath(tuple(names), array_wildcard=True,
                            suffix=tuple(suffix))
    raise PathCompileError(f"invalid array segment in {path!r}")


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
      NULL -> crypto passthrough).
    """
    col = _nav(cp.names)
    if not cp.is_array:
        return col
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
    if not cp.suffix:
        return True
    # array-of-structs: t must be ArrayType whose elementType carries suffix
    et = getattr(t, "elementType", None)
    if et is None:
        return False
    for i, n in enumerate(cp.suffix):
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
    if cp.suffix:
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
