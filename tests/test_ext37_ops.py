"""Extension batch 37: star-schema denormalization."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation", "region",
              "part", "supplier"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _sorted(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_denormalized_sales_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext37 import (
        SQL_DENORMALIZED_SALES, q_denormalized_sales,
    )

    d = _sorted(q_denormalized_sales(SF).to_pandas())
    o = con.execute(SQL_DENORMALIZED_SALES).df()
    o = _sorted(o.astype(d.dtypes.to_dict()))
    assert len(d) == len(o) > 0
    assert d.equals(o)


def test_denormalized_sales_shape(ray_session, con):
    """Row count == lineitem count (every fact row survives the widening,
    none duplicated), and every dim attribute is populated."""
    from polylabel_rs_ray.pipelines.queries_ext37 import q_denormalized_sales

    d = q_denormalized_sales(SF).to_pandas()
    n_li = con.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    assert len(d) == n_li
    assert not d.isna().any().any()
    regions = set(con.execute("SELECT r_name FROM region").df()["r_name"])
    assert set(d["region_name"]) <= regions


def test_denormalized_sales_partition_invariant(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext37 import q_denormalized_sales

    a = _sorted(q_denormalized_sales(SF, n_parts=1).to_pandas())
    b = _sorted(q_denormalized_sales(SF, n_parts=5).to_pandas())
    assert a.equals(b)
