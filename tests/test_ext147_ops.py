"""Extension batch 147: brand leadership flips + P90 exemplar."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "part", "orders"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_flips_match_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext147 import (
        SQL_BRAND_LEADERSHIP_FLIPS, q_brand_leadership_flips,
    )

    d = q_brand_leadership_flips(SF).to_pandas()
    o = con.execute(SQL_BRAND_LEADERSHIP_FLIPS).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_flips_consistency(ray_session):
    """First month never flips; flipped == (leader != previous leader)
    replayed from the output itself; leader_rev positive."""
    from polylabel_rs_ray.pipelines.queries_ext147 import (
        q_brand_leadership_flips,
    )

    d = q_brand_leadership_flips(SF).to_pandas().sort_values(
        "month_idx").reset_index(drop=True)
    assert d["flipped"].iloc[0] == 0
    lead = d["leader"].tolist()
    expect = [0] + [int(lead[i] != lead[i - 1]) for i in range(1, len(lead))]
    assert d["flipped"].tolist() == expect
    assert (d["leader_rev"] > 0).all()


def test_p90_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext147 import (
        SQL_P90_ORDER_EXEMPLAR, q_p90_order_exemplar,
    )

    d = q_p90_order_exemplar(SF).to_pandas()
    o = con.execute(SQL_P90_ORDER_EXEMPLAR).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_p90_brute(ray_session, con):
    """Numpy sort twin: the P90 value, its exemplar, and the rank
    sandwich #(< p90) <= idx < #(<= p90)."""
    from polylabel_rs_ray.pipelines.queries_ext147 import (
        q_p90_order_exemplar,
    )

    d = q_p90_order_exemplar(SF).to_pandas().iloc[0]
    rows = con.execute("""
        SELECT o_orderkey k, CAST(ROUND(o_totalprice*100) AS BIGINT) c
        FROM orders
    """).df()
    c = np.sort(rows["c"].to_numpy().astype(np.int64))
    idx = (len(c) - 1) * 9 // 10
    assert d["p90_cents"] == int(c[idx])
    assert d["exemplar_orderkey"] == int(
        rows.loc[rows["c"] == d["p90_cents"], "k"].min())
    below = int((c < d["p90_cents"]).sum())
    at_or_below = int((c <= d["p90_cents"]).sum())
    assert below <= idx < at_or_below
    assert d["n_orders"] == len(c)
