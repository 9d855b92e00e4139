"""Extension batch 103: TPC-H Q10 returned-item revenue + Q12
shipping-lag priority pivot."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "lineitem", "customer"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_q10_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext103 import (
        SQL_RETURNED_ITEM_REVENUE_Q10, q_returned_item_revenue_q10,
    )

    d = q_returned_item_revenue_q10(SF)
    o = con.execute(SQL_RETURNED_ITEM_REVENUE_Q10).df()
    assert len(d) == len(o) == 20
    assert _norm(d).equals(_norm(o))


def test_q10_descending_revenue(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext103 import (
        q_returned_item_revenue_q10,
    )

    d = q_returned_item_revenue_q10(SF)
    rev = d["revenue_micro"].to_numpy()
    assert (rev[:-1] >= rev[1:]).all()
    assert (rev > 0).all()


def test_q10_partition_invariance(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext103 import (
        q_returned_item_revenue_q10,
    )

    a = q_returned_item_revenue_q10(SF, n_parts=2)
    b = q_returned_item_revenue_q10(SF, n_parts=11)
    assert _norm(a).equals(_norm(b))


def test_q12_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext103 import (
        SQL_SHIPPING_LAG_Q12, q_shipping_lag_q12,
    )

    d = q_shipping_lag_q12(SF).to_pandas()
    o = con.execute(SQL_SHIPPING_LAG_Q12).df()
    assert len(d) == len(o) == 3
    assert _norm(d).equals(_norm(o))


def test_q12_totals_cover_every_lineitem(ray_session, con):
    """The 3x2 pivot partitions the joined fact exactly: totals sum to
    the lineitem rowcount (every lineitem has its order)."""
    from polylabel_rs_ray.pipelines.queries_ext103 import q_shipping_lag_q12

    d = q_shipping_lag_q12(SF).to_pandas()
    total = int((d["critical_lines"] + d["other_lines"]).sum())
    n_li = con.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    assert total == n_li
