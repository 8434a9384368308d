"""Differential property test: scan_cells vs an independent pure-Python
model of the reference's stream semantics (smoltable/src/table/mod.rs:
630-801). Hypothesis drives random cell tables × random ScanInputs; the
Spark pipeline and the model must select exactly the same cell set.

The model is written directly from the reference's cell-loop order:
predicates → per-column version limit → per-row budget → row accounting
(offset → stride sample → limit) → global cell limit.
"""

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from smoltable_spark.api import ColumnFilter, RowRange, ScanInput
from smoltable_spark.operators.scan import scan_cells
from tests.conftest import make_cells

ROW_KEYS = ["a", "ab", "b", "ba", "bb", "c"]
FAMILIES = ["f", "g"]
QUALS = ["", "q1", "q2"]


def model_scan(cells, inp):
    """cells: list of (row_key, family, qual, ts). Returns the kept set."""
    out = []
    for rk, fam, q, ts in cells:
        if inp.prefix is not None and not rk.startswith(inp.prefix):
            continue
        if inp.range is not None:
            r = inp.range
            if not (r.start <= rk and (rk <= r.end if r.inclusive else rk < r.end)):
                continue
        if inp.ranges:
            if not any(
                r.start <= rk and (rk <= r.end if r.inclusive else rk < r.end)
                for r in inp.ranges
            ):
                continue
        cf = inp.column_filter
        if cf is not None:
            def key_ok(k):
                if cf.kind == "prefix":
                    return fam == k.family and q.startswith(k.qualifier)
                return fam == k.family and (k.qualifier is None or q == k.qualifier)
            if not any(key_ok(k) for k in cf.keys):
                continue
        if inp.ts_min is not None and ts < inp.ts_min:
            continue
        if inp.ts_max is not None and ts > inp.ts_max:
            continue
        out.append((rk, fam, q, ts))

    if inp.column_cell_limit is not None:
        bycol = {}
        for c in out:
            bycol.setdefault(c[:3], []).append(c)
        out = [
            c
            for vs in bycol.values()
            for c in sorted(vs, key=lambda c: -c[3])[: inp.column_cell_limit]
        ]
    if inp.row_cell_limit is not None:
        byrow = {}
        for c in out:
            byrow.setdefault(c[0], []).append(c)
        out = [
            c
            for vs in byrow.values()
            for c in sorted(vs, key=lambda c: (c[1], c[2], -c[3]))[: inp.row_cell_limit]
        ]

    # sample and offset are both conditions on the SCANNED row rank
    # (reference mod.rs:724-756); phase: first scanned row always emitted
    # (row_sample_counter starts at 1.0, mod.rs:660). Offset uses the sane
    # skip-`offset`-rows semantics (documented divergence from the
    # reference's off-by-one `< row_offset`).
    keys = sorted({c[0] for c in out}, reverse=inp.reverse)
    sampling = inp.sample is not None and inp.sample < 1.0
    kept = []
    for i, k in enumerate(keys, start=1):
        if sampling and not (
            i == 1 or math.floor(i * inp.sample) > math.floor((i - 1) * inp.sample)
        ):
            continue
        if i <= inp.row_offset:
            continue
        kept.append(k)
    if inp.row_limit is not None:
        kept = kept[: inp.row_limit]
    kept_keys = set(kept)
    out = [c for c in out if c[0] in kept_keys]

    if inp.cell_limit is not None:
        out = sorted(
            out,
            key=lambda c: (c[0] if not inp.reverse else "", c[1], c[2], -c[3]),
        )
        if inp.reverse:
            out = sorted(out, key=lambda c: (c[1], c[2], -c[3]))
            out = sorted(out, key=lambda c: c[0], reverse=True)
        out = out[: inp.cell_limit]
    return set(out)


cells_strategy = st.lists(
    st.tuples(
        st.sampled_from(ROW_KEYS),
        st.sampled_from(FAMILIES),
        st.sampled_from(QUALS),
        st.integers(min_value=0, max_value=4),
    ),
    min_size=1,
    max_size=25,
    unique=True,
)

filters = st.one_of(
    st.none(),
    st.builds(lambda f: ColumnFilter.key(f), st.sampled_from(["f", "g", "f:q1", "g:"])),
    st.builds(
        lambda: ColumnFilter.multi_key(["f:q1", "g:q2"])
    ),
    st.builds(lambda: ColumnFilter.prefix("f", "q")),
)

inputs_strategy = st.builds(
    ScanInput,
    prefix=st.one_of(st.none(), st.sampled_from(["", "a", "b", "ba", "z"])),
    range=st.one_of(
        st.none(),
        st.builds(
            RowRange,
            start=st.sampled_from(["a", "b"]),
            end=st.sampled_from(["bb", "c"]),
            inclusive=st.booleans(),
        ),
    ),
    column_filter=filters,
    row_limit=st.one_of(st.none(), st.integers(1, 4)),
    row_offset=st.integers(0, 3),
    cell_limit=st.one_of(st.none(), st.integers(1, 8)),
    row_cell_limit=st.one_of(st.none(), st.integers(1, 3)),
    column_cell_limit=st.one_of(st.none(), st.integers(1, 2)),
    sample=st.one_of(st.none(), st.sampled_from([0.34, 0.5, 1.0])),
    ts_min=st.one_of(st.none(), st.integers(0, 2)),
    ts_max=st.one_of(st.none(), st.integers(2, 4)),
    reverse=st.booleans(),
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(cells=cells_strategy, inp=inputs_strategy)
def test_scan_matches_model(spark, cells, inp):
    rows = [(rk, fam, q, ts, "string", f"v{ts}") for rk, fam, q, ts in cells]
    df = make_cells(spark, rows)
    got = {
        (r["row_key"], r["family"], r["qualifier"], r["ts"])
        for r in scan_cells(df, inp).select("row_key", "family", "qualifier", "ts").collect()
    }
    assert got == model_scan(cells, inp)


# -- point reads share the limit machinery: differential-test them too ------

from smoltable_spark.api import QueryRowInput
from smoltable_spark.operators.read import get_row_cells, multi_get_cells


def model_get_row(cells, inp: QueryRowInput):
    scan_like = ScanInput(
        prefix=None,
        column_filter=inp.column_filter,
        column_cell_limit=inp.column_cell_limit,
        row_cell_limit=inp.cell_limit,
    )
    return {
        c
        for c in model_scan(cells, scan_like)
        if c[0] == inp.row_key
    }


row_inputs = st.builds(
    QueryRowInput,
    row_key=st.sampled_from(ROW_KEYS + ["missing"]),
    column_filter=filters,
    cell_limit=st.one_of(st.none(), st.integers(1, 4)),
    column_cell_limit=st.one_of(st.none(), st.integers(1, 2)),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(cells=cells_strategy, inp=row_inputs)
def test_get_row_matches_model(spark, cells, inp):
    rows = [(rk, fam, q, ts, "string", f"v{ts}") for rk, fam, q, ts in cells]
    df = make_cells(spark, rows)
    got = {
        (r["row_key"], r["family"], r["qualifier"], r["ts"])
        for r in get_row_cells(df, inp)
        .select("row_key", "family", "qualifier", "ts")
        .collect()
    }
    assert got == model_get_row(cells, inp)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(cells=cells_strategy, inps=st.lists(row_inputs, min_size=1, max_size=3))
def test_multi_get_matches_model(spark, cells, inps):
    rows = [(rk, fam, q, ts, "string", f"v{ts}") for rk, fam, q, ts in cells]
    df = make_cells(spark, rows)
    got = sorted(
        (r["row_key"], r["family"], r["qualifier"], r["ts"])
        for r in multi_get_cells(df, inps)
        .select("row_key", "family", "qualifier", "ts")
        .collect()
    )
    want = sorted(
        c for inp in inps for c in model_get_row(cells, inp)
    )
    assert got == want


# -- predicated counts share the predicate compiler: differential-test ------

from smoltable_spark.api import CountInput
from smoltable_spark.operators.count import scan_count


count_inputs = st.builds(
    CountInput,
    prefix=st.one_of(st.none(), st.sampled_from(["", "a", "b", "ba", "z"])),
    range=st.one_of(
        st.none(),
        st.builds(
            RowRange,
            start=st.sampled_from(["a", "b"]),
            end=st.sampled_from(["bb", "c"]),
            inclusive=st.booleans(),
        ),
    ),
    column_filter=filters,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(cells=cells_strategy, inp=count_inputs)
def test_scan_count_matches_model(spark, cells, inp):
    rows = [(rk, fam, q, ts, "string", f"v{ts}") for rk, fam, q, ts in cells]
    df = make_cells(spark, rows)
    got = scan_count(df, inp).collect()[0]
    want = model_scan(
        cells,
        ScanInput(prefix=inp.prefix, range=inp.range, column_filter=inp.column_filter),
    )
    assert got["cell_count"] == len(want)
    assert got["row_count"] == len({c[0] for c in want})
