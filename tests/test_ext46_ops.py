"""Extension batch 46: dataset drift audit (two-sample chi-square bins)."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return c


def _sorted(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_value_drift_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext46 import (
        SQL_VALUE_DRIFT_BINS, q_value_drift_bins,
    )

    d = _sorted(q_value_drift_bins(SF).to_pandas())
    o = con.execute(SQL_VALUE_DRIFT_BINS).df()
    o = _sorted(o.astype(d.dtypes.to_dict()))
    assert len(d) == len(o) > 0
    assert d.equals(o)


def test_value_drift_semantics(ray_session, con):
    """Bin totals partition the event stream; terms are non-negative; the
    scalar chi-square equals a scipy-free brute-force replay."""
    from polylabel_rs_ray.pipelines.queries_ext46 import (
        BIN_W, q_value_drift_bins,
    )

    df = q_value_drift_bins(SF).to_pandas()
    n_events = con.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    assert df["n_first"].sum() + df["n_second"].sum() == n_events
    assert (df["chi2_term"] >= 0).all()
    # brute force with the same midpoint split
    rows = con.execute(
        "SELECT epoch_us(ts) AS tu, value FROM events"
    ).df()
    tmid = (rows["tu"].min() + rows["tu"].max()) // 2
    bins = np.floor(rows["value"].to_numpy() / BIN_W).astype(int)
    first = (rows["tu"].to_numpy() < tmid)
    N1, N2 = int(first.sum()), int((~first).sum())
    chi2 = 0.0
    for b in np.unique(bins):
        a = int((first & (bins == b)).sum())
        c = int(((~first) & (bins == b)).sum())
        num = (a * N2 - c * N1) ** 2
        den = N1 * N2 * (a + c)
        chi2 += float(num) / float(den)
    assert np.isclose(df["chi2_term"].sum(), chi2, rtol=0, atol=1e-9)
    # the two halves are draws of the same process: drift stays modest
    # (chi-square per dof near 1) — sanity bound, not a tight pin
    assert df["chi2_term"].sum() < 5 * len(df)
