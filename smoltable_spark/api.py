"""Query input structs — 1:1 mirrors of the reference's serde inputs.

The reference has no SQL; its query "IR" is JSON input structs
(``smoltable/src/query/{scan,row,count}.rs``). These dataclasses are the
Python equivalents; operator modules compile them to DataFrame expressions.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

#: identifier charset for families/qualifiers
#: (reference smoltable/src/column_key.rs:4-11: [A-Za-z0-9-_.#$], len < 512).
#: \A..\Z, NOT ^..$: Python $ matches before a trailing newline, so
#: "f\n" would pass a $-anchored charset check (same hole fixed with
#: \A..\z in sources/wire.py's Java-regex twin)
_IDENT_RE = re.compile(r"\A[A-Za-z0-9\-_.#$]*\Z")


def _check_ident(s: str, what: str) -> None:
    if len(s) >= 512 or not _IDENT_RE.match(s):
        raise ValueError(f"invalid {what}: {s!r}")


@dataclass(frozen=True)
class ColumnKey:
    """``family[:qualifier]`` — qualifier None means "whole family".

    Reference: smoltable/src/column_key.rs:20-58. The empty string is a
    valid qualifier (the "default column") and is distinct from None.
    """

    family: str
    qualifier: str | None = None

    def __post_init__(self):
        _check_ident(self.family, "family")
        if self.qualifier is not None:
            _check_ident(self.qualifier, "qualifier")

    @classmethod
    def parse(cls, s: str) -> "ColumnKey":
        """Parse ``family`` / ``family:`` / ``family:qualifier``.

        ``family:`` (trailing colon) selects the whole family — same as
        bare ``family``; ``family:<empty>`` cannot be expressed in string
        form (use the constructor with qualifier='').
        """
        if ":" in s:
            fam, qual = s.split(":", 1)
            return cls(fam, qual if qual != "" else None)
        return cls(s, None)


@dataclass(frozen=True)
class ColumnFilter:
    """Column-coordinate filter (reference smoltable/src/column_filter.rs:10-19).

    kind:
      - ``key``: single ColumnKey; family-only matches the whole family
      - ``multi_key``: OR over keys
      - ``prefix``: family == key.family AND qualifier startswith key.qualifier
    """

    kind: str  # 'key' | 'multi_key' | 'prefix'
    keys: tuple[ColumnKey, ...]

    @classmethod
    def key(cls, k: ColumnKey | str) -> "ColumnFilter":
        k = ColumnKey.parse(k) if isinstance(k, str) else k
        return cls("key", (k,))

    @classmethod
    def multi_key(cls, ks) -> "ColumnFilter":
        ks = tuple(ColumnKey.parse(k) if isinstance(k, str) else k for k in ks)
        return cls("multi_key", ks)

    @classmethod
    def prefix(cls, family: str, qualifier_prefix: str) -> "ColumnFilter":
        return cls("prefix", (ColumnKey(family, qualifier_prefix),))


@dataclass(frozen=True)
class RowRange:
    """Row-key range predicate (reference smoltable/src/query/scan.rs:5-9)."""

    start: str
    end: str
    inclusive: bool = True  # end-inclusive flag


@dataclass(frozen=True)
class ScanInput:
    """Scan request (reference smoltable/src/query/scan.rs:24-58).

    Exactly one of ``prefix`` / ``range`` should be set; prefix '' scans all.
    Limit defaults are u16::MAX in the reference
    (smoltable/src/table/mod.rs:635-650); we use None = unlimited and let
    callers cap explicitly.
    """

    prefix: str | None = None
    range: RowRange | None = None
    #: EXTENSION: multiple disjoint ranges OR'd together — the reference
    #: stubs this as a commented TODO (smoltable/src/query/scan.rs:18-20)
    ranges: tuple[RowRange, ...] | None = None
    column_filter: ColumnFilter | None = None
    row_limit: int | None = None
    row_offset: int = 0
    cell_limit: int | None = None  # global cap on returned cells (Q1c)
    row_cell_limit: int | None = None  # per-row cell budget (Q1d)
    column_cell_limit: int | None = None  # per-column version limit (Q1e)
    sample: float | None = None  # deterministic row stride (Q1f)
    #: EXTENSION: cell timestamp window [ts_min, ts_max] — the reference
    #: stubs time-range filters as TODO (query/scan.rs:46-51, row.rs:22-25)
    ts_min: int | None = None
    ts_max: int | None = None
    #: EXTENSION: backward scan (row keys descending) — documented as
    #: unsupported in the reference (docs/.../scan-rows.md:189)
    reverse: bool = False


@dataclass(frozen=True)
class QueryRowInput:
    """Point-read request (reference smoltable/src/query/row.rs:5-39)."""

    row_key: str
    column_filter: ColumnFilter | None = None
    cell_limit: int | None = None  # whole-row budget
    column_cell_limit: int | None = None  # per-column version limit


@dataclass(frozen=True)
class CountInput:
    """Predicated count (reference smoltable/src/query/count.rs:6-28)."""

    prefix: str | None = None
    range: RowRange | None = None
    column_filter: ColumnFilter | None = None


@dataclass(frozen=True)
class ColumnFamilyDef:
    """Column family + GC options.

    Reference smoltable/src/table/mod.rs:82-99 (ColumnFamilyDefinition /
    GarbageCollectionOptions); ``lg`` assigns the family to a locality
    group ('' = default data partition).
    """

    name: str
    ttl_secs: int | None = None
    version_limit: int | None = None
    lg: str = ""
