"""Extension batch 138: lifetime-activity matrix + weekend share."""

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


def test_matrix_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext138 import (
        SQL_LIFETIME_ACTIVITY_MATRIX, q_lifetime_activity_matrix,
    )

    d = q_lifetime_activity_matrix(SF).to_pandas()
    o = con.execute(SQL_LIFETIME_ACTIVITY_MATRIX).df()
    assert len(d) == len(o) == 25
    assert _norm(d).equals(_norm(o))


def test_matrix_brute(ray_session, con):
    """Pure-Python bucket twin over per-user rollups; matrix total ==
    user count; full 5x5 grid is always emitted."""
    from polylabel_rs_ray.pipelines.queries_ext138 import (
        ACTIVITY_EDGES, LIFETIME_EDGES, q_lifetime_activity_matrix,
    )

    d = q_lifetime_activity_matrix(SF).to_pandas()
    u = con.execute("""
        SELECT MAX(epoch_us(ts) // 86400000000)
               - MIN(epoch_us(ts) // 86400000000) AS life,
               COUNT(*) AS n
        FROM events GROUP BY user_id
    """).df()
    got = {(int(r.lifetime_bucket), int(r.activity_bucket)): int(r.n_users)
           for r in d.itertuples()}
    from collections import Counter
    expect: Counter = Counter()
    for r in u.itertuples():
        lb = sum(r.life > e for e in LIFETIME_EDGES)
        ab = sum(r.n > e for e in ACTIVITY_EDGES)
        expect[(lb, ab)] += 1
    for k in got:
        assert got[k] == expect.get(k, 0)
    assert sum(got.values()) == len(u)
    assert len(got) == 25


def test_weekend_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext138 import (
        SQL_WEEKEND_SHARE_HISTOGRAM, q_weekend_share_histogram,
    )

    d = q_weekend_share_histogram(SF).to_pandas()
    o = con.execute(SQL_WEEKEND_SHARE_HISTOGRAM).df()
    assert len(d) == len(o) == 11
    assert _norm(d).equals(_norm(o))


def test_weekend_calendar_identity(ray_session, con):
    """The epoch-day mod-7 weekend set {2,3} equals DuckDB's
    dayofweek-based Saturday/Sunday classification, and the histogram
    totals one entry per user."""
    from polylabel_rs_ray.pipelines.queries_ext138 import (
        q_weekend_share_histogram,
    )

    d = q_weekend_share_histogram(SF).to_pandas()
    n_users, mismatch = con.execute("""
        SELECT COUNT(DISTINCT user_id),
               SUM(CASE WHEN ((epoch_us(ts) // 86400000000) % 7 IN (2, 3))
                         <> (dayofweek(ts) IN (0, 6))
                    THEN 1 ELSE 0 END)
        FROM events
    """).fetchone()
    assert mismatch == 0
    assert int(d["n_users"].sum()) == n_users
    assert (d["share_bucket"].to_numpy() == np.arange(11)).all()
