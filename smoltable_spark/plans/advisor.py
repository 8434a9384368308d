"""Cost-based scan advisor (round 13, VERDICT r12 ask #8): pick the
cheapest physical strategy for a store scan FROM METADATA ALONE —
parquet footer row counts per partition, no data pages read, no Spark
job — the seed of what a real engine's CBO does with table statistics.

The first supported decision is the one the Z-order layout exists for:
given a 2-D box query (key-bucket range × time-bucket range) over a
``ZorderCellStore``, should the scan

- read the COVERING ``zb`` partitions (``box_scan`` — metadata-pruned,
  cost tracks the box volume), or
- scan the store FLAT (cost = the whole current snapshot — the right
  choice when the box covers most of the space, where the pruned plan's
  many-partition overhead buys nothing)?

Cost is measured in ROWS READ, the unit both strategies share and the
one that is exact at partition granularity: a ``zb`` partition holds
precisely the rows whose (a, b) buckets Morton-encode to it (bucketing
is modular arithmetic, no sampling), so summing covered partitions'
footer counts IS the box's row cost — deterministic, engine-replayable,
and therefore DuckDB-oracle-checkable (the oracle counts bucket
membership in SQL and must land on the same integers).

Scale note: the advisor cost is one footer walk of the current chain —
O(files) metadata RPCs, amortizable with the store's chain manifest —
versus the 100 TB cost of a wrong plan choice (reading 64/64 partitions
when 15 would do, or scheduling 64 pruned-partition tasks to read 95 %
of the table anyway). This is exactly the file-skipping "should I even
prune" decision Delta/Iceberg make from their table-level stats.

Reference anchor: the reference's inverted-ts key layout
(smoltable/src/cell.rs:168-182) bakes ONE ordering into the storage and
always seeks; with two layouts available, choosing per-query becomes a
planning decision — which is this module.
"""

from __future__ import annotations

from smoltable_spark.functions.layout import zorder_covering


def zorder_box_costs(store, a_values, b_values) -> dict:
    """Metadata-only cost facts for serving the 2-D box
    ``a_values × b_values`` from a Z-ordered store.

    Returns a dict of exact, deterministic integers (footer sums over
    the current snapshot's chain):

    - ``n_parts_total`` / ``n_parts_read``: zb partitions in the layout
      vs in the covering set (with files on disk — an empty bucket
      costs nothing and is not counted);
    - ``rows_total`` / ``rows_box``: snapshot rows vs rows in covering
      partitions;
    - ``choice``: ``"zorder_box"`` when the pruned read is strictly
      cheaper, else ``"flat_scan"`` (ties go flat: same rows with fewer,
      larger reads — at object-store latency, task count is the
      tie-break);
    - ``read_fraction``: rows_box / rows_total (0.0 for an empty store).
    """
    covering = set(
        zorder_covering(list(a_values), list(b_values), bits=store._bits)
    )
    rows_by_zb: dict[int, int] = {}
    for d in store._chain_dirs():
        for name, full, _sz in store._fs.walk_files(d):
            if not name.endswith(".parquet"):
                continue
            zb = _zb_of(full)
            if zb is None:
                continue
            rows_by_zb[zb] = rows_by_zb.get(zb, 0) + store._fs.parquet_num_rows(full)
    rows_total = sum(rows_by_zb.values())
    rows_box = sum(n for zb, n in rows_by_zb.items() if zb in covering)
    n_read = sum(1 for zb in rows_by_zb if zb in covering)
    choice = "zorder_box" if rows_box < rows_total else "flat_scan"
    return {
        "n_parts_total": len(rows_by_zb),
        "n_parts_read": n_read,
        "rows_total": int(rows_total),
        "rows_box": int(rows_box),
        "choice": choice,
        "read_fraction": (rows_box / rows_total) if rows_total else 0.0,
    }


def _zb_of(path: str) -> int | None:
    """zb partition value encoded in a file's directory path, if any."""
    for part in path.split("/"):
        if part.startswith("zb="):
            try:
                return int(part[3:])
            except ValueError:
                return None
    return None


def advise_box_scan(store, a_values, b_values):
    """The decision itself: the DataFrame of the chosen strategy —
    ``box_scan`` when the covering read is cheaper, the plain ``read()``
    otherwise — plus the cost facts that justified it. One footer walk,
    then the winning plan; callers that only want the verdict use
    ``zorder_box_costs`` directly."""
    costs = zorder_box_costs(store, a_values, b_values)
    if costs["choice"] == "zorder_box":
        return store.box_scan(list(a_values), list(b_values)), costs
    return store.read(), costs
