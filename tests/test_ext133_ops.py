"""Extension batch 133: Kadane revenue window + maximum drawdown."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def _daily(con):
    return con.execute("""
        SELECT epoch_us(o_orderdate) // 86400000000 AS day,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
        FROM orders GROUP BY 1 ORDER BY 1
    """).df()


def test_window_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext133 import (
        SQL_MAX_REVENUE_WINDOW, q_max_revenue_window,
    )

    d = q_max_revenue_window(SF).to_pandas()
    o = con.execute(SQL_MAX_REVENUE_WINDOW).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_window_kadane_twin(ray_session, con):
    """Classic O(n) Kadane twin (no tie metadata) must agree on the
    best sum; the reported window must attain it; dev-sum identity
    D·window_rev − (j−i+1)·T == best_dev_sum."""
    from polylabel_rs_ray.pipelines.queries_ext133 import (
        q_max_revenue_window,
    )

    d = q_max_revenue_window(SF).to_pandas().iloc[0]
    daily = _daily(con)
    rev = daily["rev"].to_numpy().astype(np.int64)
    days = daily["day"].to_numpy().astype(np.int64)
    D, T = len(rev), int(rev.sum())
    dev = D * rev - T
    best, cur = dev[0], dev[0]
    for x in dev[1:]:
        cur = max(x, cur + x)
        best = max(best, cur)
    assert d["best_dev_sum"] == int(best)
    i = int(np.searchsorted(days, d["start_day"]))
    j = int(np.searchsorted(days, d["end_day"]))
    assert int(dev[i:j + 1].sum()) == d["best_dev_sum"]
    assert int(rev[i:j + 1].sum()) == d["window_rev"]
    assert D * d["window_rev"] - (j - i + 1) * T == d["best_dev_sum"]


def test_drawdown_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext133 import (
        SQL_REVENUE_DRAWDOWN, q_revenue_drawdown,
    )

    d = q_revenue_drawdown(SF).to_pandas()
    o = con.execute(SQL_REVENUE_DRAWDOWN).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_drawdown_brute(ray_session, con):
    """Pure-Python running peak twin, plus bounds: 0 <= dd <= peak."""
    from polylabel_rs_ray.pipelines.queries_ext133 import (
        q_revenue_drawdown,
    )

    d = q_revenue_drawdown(SF).to_pandas().iloc[0]
    daily = _daily(con)
    peak = cum = 0
    best = -1
    trough_day = None
    for r in daily.itertuples():
        cum += int(r.rev)
        peak = max(peak, cum)
        if peak - cum > best:
            best = peak - cum
            trough_day = int(r.day)
    assert d["max_drawdown"] == best
    assert d["trough_day"] == trough_day
    assert 0 <= d["max_drawdown"] <= d["peak_cum_rev"]
    assert d["n_days"] == len(daily)
