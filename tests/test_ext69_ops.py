"""Extension batch 69: time-weighted value integral + CUSUM change-point."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_twv_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext69 import (
        SQL_USER_TIME_WEIGHTED_VALUE, q_user_time_weighted_value,
    )

    d = q_user_time_weighted_value(SF).to_pandas()
    o = con.execute(SQL_USER_TIME_WEIGHTED_VALUE).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_twv_partition_invariance(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext69 import (
        q_user_time_weighted_value,
    )

    a = _norm(q_user_time_weighted_value(SF, n_parts=1).to_pandas())
    b = _norm(q_user_time_weighted_value(SF, n_parts=6).to_pandas())
    assert a.equals(b)


def test_twv_average_bounded_by_extremes(ray_session, con):
    """num/den (the time-weighted average) lies within the user's value
    range — the defining property of a weighted mean."""
    from polylabel_rs_ray.pipelines.queries_ext69 import (
        q_user_time_weighted_value,
    )

    d = q_user_time_weighted_value(SF).to_pandas()
    ext = con.execute("""
        SELECT user_id,
               MIN(CAST(ROUND(value*100) AS BIGINT)) AS lo,
               MAX(CAST(ROUND(value*100) AS BIGINT)) AS hi
        FROM events GROUP BY user_id""").df().set_index("user_id")
    for _, row in d.iterrows():
        if row["twv_den_us"] == 0:
            assert row["twv_num"] == 0
            continue
        avg = row["twv_num"] / row["twv_den_us"]
        lo, hi = ext.loc[int(row["user_id"])]
        assert lo - 1e-9 <= avg <= hi + 1e-9


def test_cusum_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext69 import (
        SQL_DAILY_CUSUM_CHANGEPOINT, q_daily_cusum_changepoint,
    )

    d = q_daily_cusum_changepoint(SF)
    o = con.execute(SQL_DAILY_CUSUM_CHANGEPOINT).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_cusum_planted_level_shift():
    """A series with a hard level shift puts the change-point at the shift
    boundary (last day of the low regime)."""
    from polylabel_rs_ray.pipelines.queries_ext69 import q_daily_cusum_changepoint  # noqa: F401

    # pure-python replay of the scaled-CUSUM rule on a synthetic series
    x = np.array([2] * 10 + [20] * 10, dtype=np.int64)
    T, total = len(x), int(x.sum())
    s = np.cumsum(T * x - total)
    k = int(np.argmax(np.abs(s)))
    assert k == 9  # boundary: cumulative deviation extremal at regime end
