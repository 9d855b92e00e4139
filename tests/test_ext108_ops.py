"""Extension batch 108: basket triple support + exact order-count Gini."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "orders"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_triples_match_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext108 import (
        SQL_BASKET_TRIPLE_SUPPORT, q_basket_triple_support,
    )

    d = q_basket_triple_support(SF).to_pandas()
    o = con.execute(SQL_BASKET_TRIPLE_SUPPORT).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_triples_partition_invariance(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext108 import (
        q_basket_triple_support,
    )

    a = _norm(q_basket_triple_support(SF, n_parts=2).to_pandas())
    b = _norm(q_basket_triple_support(SF, n_parts=13).to_pandas())
    assert a.equals(b)


def test_triples_total_vs_brute_force(ray_session, con):
    """Σ support·n_triples == Σ_orders C(basket_size, 3), set semantics
    (duplicate same-part rows within an order collapse first)."""
    from math import comb

    from polylabel_rs_ray.pipelines.queries_ext108 import (
        q_basket_triple_support,
    )

    d = q_basket_triple_support(SF).to_pandas()
    sizes = con.execute("""
        SELECT COUNT(DISTINCT l_partkey) k FROM lineitem
        GROUP BY l_orderkey""").df()["k"]
    expected = sum(comb(int(k), 3) for k in sizes)
    assert int((d["support"] * d["n_triples"]).sum()) == expected >= 1


def test_gini_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext108 import (
        SQL_CUSTOMER_ORDER_GINI, q_customer_order_gini,
    )

    d = q_customer_order_gini(SF).to_pandas()
    o = con.execute(SQL_CUSTOMER_ORDER_GINI).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_gini_vs_brute_force(ray_session, con):
    """Pin the histogram fold against the classic sorted-values formula
    computed directly over the per-customer counts."""
    from polylabel_rs_ray.pipelines.queries_ext108 import (
        q_customer_order_gini,
    )

    counts = sorted(con.execute(
        "SELECT COUNT(*) FROM orders GROUP BY o_custkey").df().iloc[:, 0])
    n = len(counts)
    s = sum(counts)
    ranksum = sum((i + 1) * x for i, x in enumerate(counts))
    brute = (2 * ranksum - (n + 1) * s) / (n * s)
    d = q_customer_order_gini(SF).to_pandas()
    assert int(d["n_customers"].iloc[0]) == n
    assert abs(float(d["gini"].iloc[0]) - brute) < 1e-12
    assert 0.0 <= float(d["gini"].iloc[0]) < 1.0
