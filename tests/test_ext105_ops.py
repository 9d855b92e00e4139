"""Extension batch 105: TPC-H Q21 waiting suppliers + Q20 dominant parts."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "orders", "supplier"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_q21_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext105 import (
        SQL_ORDER_WAITING_Q21, q_order_waiting_q21,
    )

    d = q_order_waiting_q21(SF).to_pandas()
    o = con.execute(SQL_ORDER_WAITING_Q21).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_q21_partition_invariance(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext105 import q_order_waiting_q21

    a = _norm(q_order_waiting_q21(SF, n_parts=2).to_pandas())
    b = _norm(q_order_waiting_q21(SF, n_parts=13).to_pandas())
    assert a.equals(b)


def test_q21_census_semantics(ray_session, con):
    """Total numwait == count of F-status orders with >=2 suppliers and
    exactly one late supplier (the double-correlated EXISTS collapses to
    a per-order census)."""
    from polylabel_rs_ray.pipelines.queries_ext105 import (
        Q21_LATE_DAYS, q_order_waiting_q21,
    )

    d = q_order_waiting_q21(SF).to_pandas()
    expected = con.execute(f"""
        WITH pair AS (
          SELECT l.l_orderkey ok, l.l_suppkey sk,
                 MAX(epoch_us(l.l_shipdate)) ms,
                 MIN(epoch_us(o.o_orderdate)) od
          FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          WHERE o.o_orderstatus = 'F' GROUP BY 1, 2)
        SELECT COUNT(*) FROM (
          SELECT ok, COUNT(*) ns,
                 SUM(CASE WHEN ms > od + {Q21_LATE_DAYS}*86400000000::BIGINT
                     THEN 1 ELSE 0 END) nl
          FROM pair GROUP BY ok) WHERE ns >= 2 AND nl = 1""").fetchone()[0]
    assert int(d["numwait"].sum()) == expected >= 1


def test_q20_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext105 import (
        SQL_DOMINANT_PART_SUPPLIERS_Q20, q_dominant_part_suppliers_q20,
    )

    d = q_dominant_part_suppliers_q20(SF).to_pandas()
    o = con.execute(SQL_DOMINANT_PART_SUPPLIERS_Q20).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_q20_partition_invariance(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext105 import (
        q_dominant_part_suppliers_q20,
    )

    a = _norm(q_dominant_part_suppliers_q20(SF, n_parts=2).to_pandas())
    b = _norm(q_dominant_part_suppliers_q20(SF, n_parts=13).to_pandas())
    assert a.equals(b)


def test_q20_threshold_fires(ray_session):
    """The relative 1.5x-even-share threshold must actually select
    something (a fixed 50% share selects zero on this data — measured)."""
    from polylabel_rs_ray.pipelines.queries_ext105 import (
        q_dominant_part_suppliers_q20,
    )

    d = q_dominant_part_suppliers_q20(SF).to_pandas()
    assert int(d["n_dominant_parts"].sum()) >= 10
