"""Driver-contract hygiene: the query registries must stay collision-free
and fully documented — a name collision in the merged dict would silently
drop a query from the correctness gate."""

import __spark_entry__ as entry
from smoltable_spark.queries_analytics import ANALYTICS_QUERIES
from smoltable_spark.queries_core import CORE_QUERIES


def test_no_registry_collisions():
    overlap = set(CORE_QUERIES) & set(ANALYTICS_QUERIES)
    assert not overlap, f"colliding query names: {overlap}"
    assert len(entry.queries()) == len(CORE_QUERIES) + len(ANALYTICS_QUERIES)


def test_oracles_subset_of_queries():
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(oracles) <= set(qs)
    # every oracle is a non-trivial SELECT
    for name, sql in oracles.items():
        assert "select" in sql.lower(), name


def test_every_query_documented():
    for name, fn in entry.queries().items():
        assert fn.__doc__ and len(fn.__doc__.strip()) > 10, f"{name} lacks docstring"


def test_naming_convention():
    prefixes = (
        "wc_", "rel_", "txt_", "dedup_", "ann_", "emb_", "mm_", "stream_",
        "pipeline_",
    )
    for name in entry.queries():
        assert name.startswith(prefixes), name
