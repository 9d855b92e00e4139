"""Extension batch 104: TPC-H Q8 market share + Q9 nation profit."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "supplier", "part",
              "nation", "region"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_q8_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext104 import (
        SQL_MARKET_SHARE_Q8, q_market_share_q8,
    )

    d = q_market_share_q8(SF).to_pandas()
    o = con.execute(SQL_MARKET_SHARE_Q8).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_q8_share_bounds(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext104 import q_market_share_q8

    d = q_market_share_q8(SF).to_pandas()
    assert ((d["mkt_share"] >= 0) & (d["mkt_share"] <= 1)).all()
    assert (d["nation_micro"] <= d["total_micro"]).all()


def test_q9_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext104 import (
        SQL_NATION_PROFIT_Q9, q_nation_profit_q9,
    )

    d = q_nation_profit_q9(SF).to_pandas()
    o = con.execute(SQL_NATION_PROFIT_Q9).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_q9_partition_invariance(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext104 import q_nation_profit_q9

    a = q_nation_profit_q9(SF, n_parts=2).to_pandas()
    b = q_nation_profit_q9(SF, n_parts=9).to_pandas()
    assert _norm(a).equals(_norm(b))


def test_q9_total_matches_global_profit(ray_session, con):
    """The (nation, year) rollup partitions all lineitems: summing it
    reproduces the global profit."""
    from polylabel_rs_ray.pipelines.queries_ext104 import (
        Q9_COST_PCT, q_nation_profit_q9,
    )

    d = q_nation_profit_q9(SF).to_pandas()
    total = con.execute(f"""
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
                      - CAST(ROUND(l_quantity) AS BIGINT)
                        * CAST(ROUND(p_retailprice*100) AS BIGINT)
                        * {Q9_COST_PCT}) AS BIGINT)
        FROM lineitem JOIN part ON p_partkey = l_partkey
    """).fetchone()[0]
    assert int(d["profit_micro"].sum()) == total
