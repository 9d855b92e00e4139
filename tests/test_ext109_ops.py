"""Extension batch 109: TPC-H Q2 cheapest supplier + chi-square audit."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "part",
              "nation", "region"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_q2_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext109 import (
        SQL_CHEAPEST_SUPPLIER_Q2, q_cheapest_supplier_q2,
    )

    d = q_cheapest_supplier_q2(SF).to_pandas()
    o = con.execute(SQL_CHEAPEST_SUPPLIER_Q2).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_q2_packed_argmin_tie_rule(ray_session, con):
    """Every reported (part, cost) is the true minimum among EUROPE
    suppliers' offers, and the winner is the smallest suppkey among ties
    (the packed-int64 min encodes exactly that lexicographic rule)."""
    from polylabel_rs_ray.pipelines.queries_ext109 import (
        q_cheapest_supplier_q2,
    )

    d = q_cheapest_supplier_q2(SF).to_pandas()
    truth = con.execute("""
        SELECT l.l_partkey pk,
               MIN(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)) min_cents
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type='STANDARD'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE' GROUP BY 1""").df()
    m = dict(zip(truth["pk"].astype(int), truth["min_cents"].astype(int)))
    for pk, cents in zip(d["p_partkey"].astype(int),
                         d["min_cost_cents"].astype(int)):
        assert m[pk] == cents


def test_q2_partition_invariance(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext109 import (
        q_cheapest_supplier_q2,
    )

    a = _norm(q_cheapest_supplier_q2(SF, n_parts=2).to_pandas())
    b = _norm(q_cheapest_supplier_q2(SF, n_parts=13).to_pandas())
    assert a.equals(b)


def test_independence_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext109 import (
        SQL_SEGMENT_PRIORITY_INDEPENDENCE, q_segment_priority_independence,
    )

    d = q_segment_priority_independence(SF).to_pandas()
    o = con.execute(SQL_SEGMENT_PRIORITY_INDEPENDENCE).df()
    assert len(d) == len(o) == 25
    assert _norm(d).equals(_norm(o))


def test_independence_marginals(ray_session):
    """Contingency identities: Σ observed == Σ dev-weighted identities,
    row/col totals consistent, Σ dev == 0 exactly (n·ΣO − ΣR·C telescopes),
    chi2 terms nonnegative."""
    from polylabel_rs_ray.pipelines.queries_ext109 import (
        q_segment_priority_independence,
    )

    d = q_segment_priority_independence(SF).to_pandas()
    n = int(d["observed"].sum())
    assert (d.groupby("segment")["observed"].sum()
            == d.groupby("segment")["row_total"].first()).all()
    assert (d.groupby("priority")["observed"].sum()
            == d.groupby("priority")["col_total"].first()).all()
    assert int(d["dev"].sum()) == 0
    assert (d["chi2_term"] >= 0).all()
    assert n >= 1
