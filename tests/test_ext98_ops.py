"""Extension batch 98: winsorized stats + blocking efficiency."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "documents"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_winsorized_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext98 import (
        SQL_WINSORIZED_VALUE_STATS, q_winsorized_value_stats,
    )

    d = q_winsorized_value_stats(SF)
    o = con.execute(SQL_WINSORIZED_VALUE_STATS).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_winsorized_bounds(ray_session, con):
    """Cuts are realized values, lo <= hi, and the winsorized sum is
    bounded by n*lo and n*hi."""
    from polylabel_rs_ray.pipelines.queries_ext98 import (
        q_winsorized_value_stats,
    )

    d = q_winsorized_value_stats(SF)
    for _, r in d.iterrows():
        assert r["lo_cut_cents"] <= r["hi_cut_cents"]
        assert (r["n_events"] * r["lo_cut_cents"]
                <= r["winsorized_sum_cents"]
                <= r["n_events"] * r["hi_cut_cents"])


def test_winsorized_clamps_less_than_raw_spread(ray_session, con):
    """The winsorized sum differs from the raw sum whenever outliers were
    clamped (the estimator actually does something)."""
    from polylabel_rs_ray.pipelines.queries_ext98 import (
        q_winsorized_value_stats,
    )

    d = q_winsorized_value_stats(SF)
    raw = con.execute("""
        SELECT event_type, SUM(CAST(ROUND(value*100) AS BIGINT)) AS s
        FROM events GROUP BY 1""").df().set_index("event_type")["s"]
    diffs = [abs(int(r["winsorized_sum_cents"]) - int(raw[r["event_type"]]))
             for _, r in d.iterrows()]
    assert any(x > 0 for x in diffs)


def test_blocking_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext98 import (
        SQL_BLOCKING_EFFICIENCY, q_blocking_efficiency,
    )

    d = q_blocking_efficiency(SF)
    o = con.execute(SQL_BLOCKING_EFFICIENCY).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_blocking_reduces_pairs(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext98 import q_blocking_efficiency

    d = q_blocking_efficiency(SF).iloc[0]
    assert 0 < d["blocked_pairs"] < d["total_pairs"]
    assert d["max_block"] <= d["n_docs"]
    assert d["n_blocks"] >= 1
