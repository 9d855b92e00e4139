"""Extension batch 64: TPC-H Q16/Q7 shapes (two-level distinct, nation pairs)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "supplier", "part", "orders", "customer", "nation"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_q16_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext64 import (
        SQL_PARTS_SUPPLIER_COUNTS_Q16, q_parts_supplier_counts_q16,
    )

    d = q_parts_supplier_counts_q16(SF).to_pandas()
    o = con.execute(SQL_PARTS_SUPPLIER_COUNTS_Q16).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_q16_constraints(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext64 import (
        Q16_EXCLUDE_BRAND, Q16_SIZES, q_parts_supplier_counts_q16,
    )

    d = q_parts_supplier_counts_q16(SF).to_pandas()
    assert (d["p_brand"] != Q16_EXCLUDE_BRAND).all()
    assert d["p_size"].isin(Q16_SIZES).all()
    assert (d["supplier_cnt"] >= 1).all()
    # supplier_cnt can never exceed the supplier dim size
    n_supp = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/supplier.parquet'").fetchone()[0]
    assert (d["supplier_cnt"] <= n_supp).all()


def test_q7_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext64 import (
        SQL_NATION_TRADE_VOLUME_Q7, q_nation_trade_volume_q7,
    )

    d = q_nation_trade_volume_q7(SF).to_pandas()
    o = con.execute(SQL_NATION_TRADE_VOLUME_Q7).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_q7_directions_and_years(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext64 import (
        Q7_NATION_A, Q7_NATION_B, q_nation_trade_volume_q7,
    )

    d = q_nation_trade_volume_q7(SF).to_pandas()
    # every row is one of the two cross directions, never intra-nation
    pairs = set(zip(d["supp_nation"], d["cust_nation"]))
    assert pairs <= {(Q7_NATION_A, Q7_NATION_B), (Q7_NATION_B, Q7_NATION_A)}
    assert d["l_year"].between(1996, 1997).all()


def test_q7_partition_invariance(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext64 import q_nation_trade_volume_q7

    a = _norm(q_nation_trade_volume_q7(SF, n_parts=2).to_pandas())
    b = _norm(q_nation_trade_volume_q7(SF, n_parts=9).to_pandas())
    assert a.equals(b)
