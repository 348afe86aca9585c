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

Unsupported shapes (arrays of structs, wildcard mid-path) raise
``PathCompileError`` at config time, mirroring the reference's
``ConfigException`` on invalid paths (``Config.java:161-163``).
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
    """Driver-side compiled form: struct-name prefix + optional array tail."""

    names: tuple[str, ...]  # struct navigation (a, b, c)
    array_index: int | None = None  # [n] tail
    array_wildcard: bool = False  # [*] tail

    @property
    def is_array(self) -> bool:
        return self.array_wildcard or self.array_index is not None


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
    if i != len(segs) - 1:
        raise PathCompileError(
            f"unsupported path shape {path!r}: array segment must be terminal "
            "(arrays of structs / wildcard mid-path not supported)"
        )
    if isinstance(tail, Index):
        return CompiledPath(tuple(names), array_index=tail.value)
    if tail is WILDCARD or isinstance(tail, Wildcard):
        return CompiledPath(tuple(names), array_wildcard=True)
    raise PathCompileError(f"invalid terminal segment in {path!r}")


def select_column(cp: CompiledPath) -> Column:
    """Column that reads the path's value (array paths read the whole array)."""
    col = F.col(cp.names[0])
    for n in cp.names[1:]:
        col = col.getField(n)
    return col


def path_exists(df: DataFrame, cp: CompiledPath) -> bool:
    """Schema-time existence check — missing/optional target fields are
    silently skipped (``Transform.java:99-101``, ``TransformTest.java:176-183``)."""
    dt = df.schema
    fields = {f.name: f.dataType for f in dt.fields}
    cur = fields
    for i, n in enumerate(cp.names):
        if not isinstance(cur, dict) or n not in cur:
            return False
        t = cur[n]
        if i < len(cp.names) - 1:
            if not hasattr(t, "fields"):
                return False
            cur = {f.name: f.dataType for f in t.fields}
    return True


def rewrite(df: DataFrame, cp: CompiledPath, new_value: Column) -> DataFrame:
    """Replace the value at ``cp`` with ``new_value`` (a Column computed from
    :func:`select_column`'s output), preserving the rest of the row — the
    writeback half of the transform (``Transform.java:106-121``).
    """
    top = cp.names[0]
    if len(cp.names) == 1:
        return df.withColumn(top, new_value)
    # nested: rebuild the top-level struct column with withField at the
    # dotted sub-path (Spark resolves a.b.c inside withField natively)
    sub = ".".join(f"`{n}`" for n in cp.names[1:])
    return df.withColumn(top, F.col(top).withField(sub, new_value))
