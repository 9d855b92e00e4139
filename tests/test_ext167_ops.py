"""Extension batch 167: Kaplan-Meier risk table + sliding median."""

from fractions import Fraction

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "lineitem"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_km_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext167 import (
        SQL_KM_RISK_TABLE, q_km_risk_table,
    )

    d = q_km_risk_table(SF).to_pandas()
    o = con.execute(SQL_KM_RISK_TABLE).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))
    assert (d["t_days"] < 0).any()  # the corpus' negative lags survive


def test_km_risk_table_identities(ray_session):
    """n_risk is the suffix sum of d+c; first n_risk equals the corpus
    lineitem count; survival folded from the table via exact Fractions
    equals the direct product over event times."""
    from polylabel_rs_ray.pipelines.queries_ext167 import q_km_risk_table

    d = q_km_risk_table(SF).to_pandas().sort_values(
        "t_days").reset_index(drop=True)
    tot = (d["d_returned"] + d["c_censored"]).to_numpy()
    assert np.array_equal(
        d["n_risk"].to_numpy(), tot[::-1].cumsum()[::-1])
    assert int(d["n_risk"].iloc[0]) == int(tot.sum())
    # exact KM survival at the last event time, two ways
    surv = Fraction(1)
    for r in d.itertuples():
        if r.d_returned:
            surv *= Fraction(int(r.n_risk) - int(r.d_returned),
                             int(r.n_risk))
    assert 0 < surv < 1
    # direct recomputation from scratch on raw pairs
    import duckdb as dd

    c = dd.connect()
    for t in ("orders", "lineitem"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    raw = c.execute("""
        SELECT date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE)) AS t,
               l.l_returnflag = 'R' AS ev
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    """).df()
    ts = raw["t"].to_numpy()
    ev = raw["ev"].to_numpy()
    surv2 = Fraction(1)
    for t in sorted(set(ts[ev])):
        n_risk = int((ts >= t).sum())
        dd_ = int(((ts == t) & ev).sum())
        surv2 *= Fraction(n_risk - dd_, n_risk)
    assert surv == surv2


def test_sliding_median_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext167 import (
        SQL_DAILY_REVENUE_SLIDING_MEDIAN, q_daily_revenue_sliding_median,
    )

    d = q_daily_revenue_sliding_median(SF).to_pandas()
    o = con.execute(SQL_DAILY_REVENUE_SLIDING_MEDIAN).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_sliding_median_order_statistic(ray_session, con):
    """Direct order-statistic recheck per row over the raw daily series,
    including the short head windows."""
    from polylabel_rs_ray.pipelines.queries_ext167 import (
        MED_WINDOW, q_daily_revenue_sliding_median,
    )

    d = q_daily_revenue_sliding_median(SF).to_pandas().sort_values(
        "day").reset_index(drop=True)
    daily = con.execute("""
        SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day,
               SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS cents
        FROM orders GROUP BY 1 ORDER BY 1""").df()
    cents = daily["cents"].to_numpy().astype(np.int64)
    assert np.array_equal(d["day"].to_numpy(),
                          daily["day"].to_numpy().astype(np.int64))
    for i in range(len(d)):
        w = sorted(cents[max(0, i - MED_WINDOW + 1):i + 1])
        m = len(w)
        want = 2 * w[m // 2] if m % 2 else w[m // 2 - 1] + w[m // 2]
        assert int(d["med2"].iloc[i]) == want
        assert int(d["window_n"].iloc[i]) == m
