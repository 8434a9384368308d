"""Multi-dimensional storage layout: Z-order (Morton) composite
partition keys.

One partition dimension prunes one predicate family — the CellStore's
``lg=`` dirs prune column families, the day store prunes time ranges,
the IVF index prunes probe lists. A 2-D box predicate (time range AND
key range) over a 1-D layout reads a full stripe of the table however
selective the second dimension is. The classic warehouse answer
(Bigtable/Delta/Iceberg Z-ORDER) interleaves the bits of both
dimensions into one Morton key: nearby (a, b) cells share key prefixes,
so a partition/file holds a compact box in BOTH dimensions and a 2-D
box predicate touches only the partitions whose box intersects it —
|a-buckets| × |b-buckets| of the total, not a stripe.

Here the Morton key is materialized as an explicit partition column
(``partitionBy(zb)``), so pruning is plain Catalyst partition pruning
on a ``zb IN (covering set)`` literal — metadata-level, no files
opened — and the covering set is closed-form from the box bounds
(``zorder_covering``), never data-dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def morton2(a: Column, b: Column, bits: int = 3) -> Column:
    """Bit-interleave two ``bits``-bit non-negative ints into one Morton
    key: z = … b1 a1 b0 a0 (a in even positions, b in odd). A bijection
    [0,2^bits)² → [0,4^bits), so one z partition holds exactly one
    (a, b) cell — the covering set below is exact, not a superset."""
    z = F.lit(0)
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def morton2_py(a: int, b: int, bits: int = 3) -> int:
    """Python twin of ``morton2`` (drives the closed-form covering set)."""
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def zorder_covering(
    a_values: "list[int]", b_values: "list[int]", bits: int = 3
) -> "list[int]":
    """The exact set of Morton partitions a 2-D box touches — pure
    arithmetic over the box bounds (|a| × |b| keys), computed
    driver-side once and pushed down as a ``zb IN (...)`` literal."""
    return sorted(
        morton2_py(a, b, bits) for a in a_values for b in b_values
    )
