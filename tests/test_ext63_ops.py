"""Extension batch 63: TPC-H Q11/Q15 shapes (global-share HAVING, argmax ties)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "supplier", "part"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_q11_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext63 import (
        SQL_IMPORTANT_PARTS_Q11, q_important_parts_q11,
    )

    d = q_important_parts_q11(SF).to_pandas()
    o = con.execute(SQL_IMPORTANT_PARTS_Q11).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))
    # the threshold is a real discriminator: strict subset of all parts
    n_parts = con.execute(
        "SELECT COUNT(DISTINCT l_partkey) FROM lineitem").fetchone()[0]
    assert 0 < len(d) < n_parts


def test_q11_threshold_semantics(ray_session, con):
    """Every selected part is strictly above NUM/DEN x average part revenue;
    every rejected part is at or below it."""
    from polylabel_rs_ray.pipelines.queries_ext63 import (
        Q11_DEN, Q11_NUM, q_important_parts_q11,
    )

    d = q_important_parts_q11(SF).to_pandas()
    pr = con.execute("""
        SELECT l_partkey,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS rev
        FROM lineitem GROUP BY l_partkey""").df()
    total, n = int(pr["rev"].sum()), len(pr)
    sel = set(d["p_partkey"].tolist())
    for _, row in pr.iterrows():
        above = int(row["rev"]) * n * Q11_DEN > Q11_NUM * total
        assert (int(row["l_partkey"]) in sel) == above


def test_q15_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext63 import (
        SQL_TOP_SUPPLIER_Q15, q_top_supplier_q15,
    )

    d = q_top_supplier_q15(SF)
    o = con.execute(SQL_TOP_SUPPLIER_Q15).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))
    # all returned rows share the one maximal revenue (ties semantics)
    assert d["revenue_micro"].nunique() == 1
