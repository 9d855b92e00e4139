"""Extension batch 124: hourly peaks + Wald-Wolfowitz daily runs test."""

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


def test_peaks_match_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext124 import (
        SQL_HOURLY_PEAK_COUNTS, q_hourly_peak_counts,
    )

    d = q_hourly_peak_counts(SF).to_pandas()
    o = con.execute(SQL_HOURLY_PEAK_COUNTS).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_peaks_brute(ray_session, con):
    """Pure-Python neighbor-scan twin + the alternation bound
    n_peaks <= (n_hours - 1) // 2."""
    from polylabel_rs_ray.pipelines.queries_ext124 import q_hourly_peak_counts

    d = q_hourly_peak_counts(SF).to_pandas().set_index("event_type")
    hourly = con.execute("""
        SELECT event_type, epoch_us(ts) // 3600000000 AS h, COUNT(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    for et, g in hourly.groupby("event_type"):
        c = list(g["n"])
        peaks = sum(1 for i in range(1, len(c) - 1)
                    if c[i - 1] < c[i] > c[i + 1])
        row = d.loc[et]
        assert row["n_peaks"] == peaks
        assert row["n_hours"] == len(c)
        assert row["max_hour_n"] == max(c)
        assert row["n_peaks"] <= (row["n_hours"] - 1) // 2


def test_runs_match_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext124 import (
        SQL_RUNS_TEST_DAILY, q_runs_test_daily,
    )

    d = q_runs_test_daily(SF).to_pandas()
    o = con.execute(SQL_RUNS_TEST_DAILY).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_runs_identities(ray_session):
    """n_above + n_below = observed days; 1 <= runs <= n; the lower
    median guarantees n_above <= n_below (strictly-above can cover at
    most the upper half)."""
    from polylabel_rs_ray.pipelines.queries_ext124 import q_runs_test_daily

    d = q_runs_test_daily(SF).to_pandas()
    n = d["n_above"] + d["n_below"]
    assert (n > 0).all()
    assert (d["n_runs"] >= 1).all()
    assert (d["n_runs"] <= n).all()
    assert (d["n_above"] <= d["n_below"]).all()
    # runs can never exceed 2·min(n_above, n_below) + 1
    m = np.minimum(d["n_above"], d["n_below"])
    assert (d["n_runs"] <= 2 * m + 1).all()
