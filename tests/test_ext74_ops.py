"""Extension batch 74: incremental view maintenance + quality filter funnel."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "documents"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_ivm_matches_full_recompute(ray_session, con):
    """The incrementally maintained view equals the from-scratch recompute
    over the merged table — the IVM correctness property itself."""
    from polylabel_rs_ray.pipelines.queries_ext74 import (
        SQL_IVM_DAILY_REVENUE, q_ivm_daily_revenue,
    )

    d = q_ivm_daily_revenue(SF).to_pandas()
    o = con.execute(SQL_IVM_DAILY_REVENUE).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_ivm_delta_classes_nontrivial(ray_session, con):
    """The planted update and delete classes both actually fire."""
    from polylabel_rs_ray.pipelines.queries_ext74 import (
        DEL_EQ, DEL_MOD, UPD_EQ, UPD_MOD,
    )

    n_upd, n_del = con.execute(f"""
        SELECT SUM(CASE WHEN o_orderkey % {UPD_MOD} = {UPD_EQ}
                         AND o_orderkey % {DEL_MOD} <> {DEL_EQ}
                   THEN 1 ELSE 0 END),
               SUM(CASE WHEN o_orderkey % {DEL_MOD} = {DEL_EQ}
                   THEN 1 ELSE 0 END)
        FROM orders""").fetchone()
    assert n_upd > 0 and n_del > 0


def test_ivm_total_differs_from_base(ray_session, con):
    """Maintenance changed the aggregate (deletes + bumps are visible)."""
    from polylabel_rs_ray.pipelines.queries_ext74 import q_ivm_daily_revenue

    d = q_ivm_daily_revenue(SF).to_pandas()
    base_total = con.execute(
        "SELECT SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) FROM orders"
    ).fetchone()[0]
    assert int(d["revenue_cents"].sum()) != int(base_total)


def test_funnel_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext74 import (
        SQL_FILTER_FUNNEL, q_filter_funnel,
    )

    d = q_filter_funnel(SF).to_pandas()
    o = con.execute(SQL_FILTER_FUNNEL).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_funnel_is_monotone_and_discriminating(ray_session):
    """Each stage passes no more than the previous, and every stage
    actually rejects someone (the thresholds bite)."""
    from polylabel_rs_ray.pipelines.queries_ext74 import q_filter_funnel

    d = q_filter_funnel(SF).to_pandas().iloc[0]
    seq = [d["n_docs"], d["pass_length"], d["pass_word_len"],
           d["pass_unique_ratio"]]
    assert seq == sorted(seq, reverse=True)
    for a, b in zip(seq, seq[1:]):
        assert b < a  # strictly fewer at every stage on this corpus
    assert seq[-1] > 0
