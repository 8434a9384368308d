import pytest

from smoltable_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="smoltable_spark_tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


def make_cells(spark, rows):
    """rows: list of (row_key, family, qualifier, ts, vtype, value)."""
    from smoltable_spark.schema import CELLS_SCHEMA, VTYPE_COLUMNS

    recs = []
    for row_key, family, qualifier, ts, vtype, value in rows:
        rec = dict(
            row_key=row_key,
            family=family,
            qualifier=qualifier,
            ts=ts,
            vtype=vtype,
            v_str=None,
            v_bool=None,
            v_byte=None,
            v_i32=None,
            v_i64=None,
            v_f32=None,
            v_f64=None,
        )
        rec[VTYPE_COLUMNS[vtype]] = value
        recs.append(rec)
    return spark.createDataFrame(recs, CELLS_SCHEMA)
