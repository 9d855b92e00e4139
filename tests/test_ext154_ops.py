"""Extension batch 154: MMR diversified retrieval + cohort LTV."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("embeddings", "orders"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_mmr_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext154 import (
        MMR_K, _sql_mmr_topk, q_mmr_topk,
    )

    d = q_mmr_topk(SF).to_pandas()
    o = con.execute(_sql_mmr_topk()).df()
    assert len(d) == len(o) == MMR_K
    assert _norm(d).equals(_norm(o))


def test_mmr_greedy_invariants(ray_session):
    """Selections are distinct, the first pick is the pure-relevance
    argmax, scores are non-increasing within the greedy (each step's
    winner would have scored at least as well a step earlier), and
    score == rel - maxsim exactly."""
    from polylabel_rs_ray.pipelines.queries_ext154 import q_mmr_topk

    d = q_mmr_topk(SF).to_pandas().sort_values("sel_rank")
    assert d["vec_id"].nunique() == len(d)
    assert d.iloc[0]["maxsim"] == 0
    assert (d["score"] == d["rel"] - d["maxsim"]).all()
    # maxsim only grows as the selected set grows, so the chosen score
    # sequence is non-increasing
    s = d["score"].to_numpy()
    assert (np.diff(s) <= 0).all()


def test_ltv_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext154 import (
        SQL_ORDER_COHORT_LTV, q_order_cohort_ltv,
    )

    d = q_order_cohort_ltv(SF).to_pandas()
    o = con.execute(SQL_ORDER_COHORT_LTV).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_ltv_reconciles(ray_session, con):
    """Triangle mass equals the orders table: total count and cents, and
    every cohort's offset-0 cell exists (a customer's first order lands
    in their own cohort month by construction)."""
    from polylabel_rs_ray.pipelines.queries_ext154 import q_order_cohort_ltv

    d = q_order_cohort_ltv(SF).to_pandas()
    n, cents = con.execute("""
        SELECT COUNT(*), SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
        FROM orders""").fetchone()
    assert int(d["n_orders"].sum()) == n
    assert int(d["rev_cents"].sum()) == cents
    assert (d["month_offset"] >= 0).all()
    zero = set(d.loc[d["month_offset"] == 0, "cohort_month"])
    assert set(d["cohort_month"]) == zero
