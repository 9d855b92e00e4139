"""Extension batch 59: compound-predicate dim join (TPC-H Q19 shape)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "part"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def test_q19_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext59 import (
        SQL_DISCOUNT_REVENUE_Q19, q_discount_revenue_q19,
    )

    d = q_discount_revenue_q19(SF).to_pandas()
    o = con.execute(SQL_DISCOUNT_REVENUE_Q19).df()
    assert len(d) == len(o) == 1
    assert int(d.iloc[0]["n_rows"]) == int(o.iloc[0]["n_rows"])
    assert int(d.iloc[0]["revenue_micro"]) == int(o.iloc[0]["revenue_micro"])
    # the disjunction actually selects a non-trivial strict subset
    total = con.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    assert 0 < int(d.iloc[0]["n_rows"]) < total


def test_q19_branch_decomposition(ray_session, con):
    """Inclusion-exclusion sanity: the union count is bounded by the branch
    counts and at least the largest branch."""
    from polylabel_rs_ray.pipelines.queries_ext59 import q_discount_revenue_q19

    branches = [
        "(p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 "
        "AND CAST(ROUND(l_quantity) AS BIGINT) BETWEEN 1 AND 20)",
        "(p_brand = 'Brand#5' AND p_size BETWEEN 10 AND 30 "
        "AND CAST(ROUND(l_quantity) AS BIGINT) BETWEEN 10 AND 40)",
        "(p_type = 'PROMO' AND p_size >= 20 "
        "AND CAST(ROUND(l_quantity) AS BIGINT) >= 25)",
    ]
    counts = [
        con.execute(
            "SELECT COUNT(*) FROM lineitem l JOIN part p "
            f"ON l.l_partkey = p.p_partkey WHERE {b}"
        ).fetchone()[0]
        for b in branches
    ]
    got = int(q_discount_revenue_q19(SF).to_pandas().iloc[0]["n_rows"])
    assert max(counts) <= got <= sum(counts)
