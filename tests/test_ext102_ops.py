"""Extension batch 102: TPC-H Q6 forecast revenue + Q4 order-priority
late-shipment semi-join."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "lineitem"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_q6_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext102 import (
        SQL_FORECAST_REVENUE_Q6, q_forecast_revenue_q6,
    )

    d = q_forecast_revenue_q6(SF).to_pandas()
    o = con.execute(SQL_FORECAST_REVENUE_Q6).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_q6_band_bounds(ray_session):
    """revenue is cents * pct with pct in [5, 7]: the total divided by
    the item count must land inside 5x..7x the max line price."""
    from polylabel_rs_ray.pipelines.queries_ext102 import (
        q_forecast_revenue_q6,
    )

    d = q_forecast_revenue_q6(SF).to_pandas().iloc[0]
    assert d["n_items"] > 0
    per_item = d["revenue_micro"] / d["n_items"]
    assert 5 * 100 <= per_item <= 7 * 100_000 * 100


def test_q4_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext102 import (
        SQL_ORDER_PRIORITY_Q4, q_order_priority_q4,
    )

    d = q_order_priority_q4(SF).to_pandas()
    o = con.execute(SQL_ORDER_PRIORITY_Q4).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_q4_semi_join_is_subset(ray_session, con):
    """Every counted order sits in the window: the per-priority counts
    are bounded by the windowed-order counts per priority."""
    from polylabel_rs_ray.pipelines.queries_ext102 import (
        Q4_HI, Q4_LO, q_order_priority_q4,
    )

    d = q_order_priority_q4(SF).to_pandas().set_index("o_orderpriority")
    w = con.execute(
        f"""SELECT o_orderpriority, COUNT(*) AS n FROM orders
            WHERE o_orderdate >= TIMESTAMP '{Q4_LO}'
              AND o_orderdate < TIMESTAMP '{Q4_HI}'
            GROUP BY 1"""
    ).df().set_index("o_orderpriority")
    for prio, row in d.iterrows():
        assert 0 < row["order_count"] <= w.loc[prio, "n"]


def test_q4_partition_invariance(ray_session, con):
    """The co-partitioned EXISTS is partition-count independent."""
    from polylabel_rs_ray.pipelines.queries_ext102 import (
        q_order_priority_q4,
    )

    a = q_order_priority_q4(SF, n_parts=2).to_pandas()
    b = q_order_priority_q4(SF, n_parts=13).to_pandas()
    assert _norm(a).equals(_norm(b))
