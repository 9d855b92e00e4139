"""Extension batch 144: session type pairs + rate control chart."""

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


def test_pairs_match_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext144 import (
        SQL_SESSION_TYPE_PAIRS, q_session_type_pairs,
    )

    d = q_session_type_pairs(SF).to_pandas()
    o = con.execute(SQL_SESSION_TYPE_PAIRS).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_pairs_consistent_with_sessions(ray_session):
    """Pair support can never exceed the total session count, and for
    any pair (a,b) it is bounded by the per-type session supports
    computed from the sessionize operator."""
    from polylabel_rs_ray.pipelines.queries import q_sessionize
    from polylabel_rs_ray.pipelines.queries_ext144 import (
        q_session_type_pairs,
    )

    d = q_session_type_pairs(SF).to_pandas()
    s = q_sessionize(SF).to_pandas()
    n_sessions = len(s)
    assert (d["n_sessions"] <= n_sessions).all()
    assert (d["type_a"] < d["type_b"]).all()
    assert (d["n_sessions"] >= 1).all()


def test_chart_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext144 import (
        SQL_RATE_CONTROL_CHART, q_rate_control_chart,
    )

    d = q_rate_control_chart(SF).to_pandas()
    o = con.execute(SQL_RATE_CONTROL_CHART).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_chart_integer_identity(ray_session):
    """dev_sq == (H·n − S)² recomputed, flag == the exact inequality,
    and the flag agrees with the float 3σ Poisson test away from the
    boundary (sanity that the scaling is the right test)."""
    from polylabel_rs_ray.pipelines.queries_ext144 import (
        q_rate_control_chart,
    )

    d = q_rate_control_chart(SF).to_pandas()
    H = len(d)
    S = int(d["n"].sum())
    n = d["n"].to_numpy().astype(np.int64)
    dev = H * n - S
    assert (d["dev_sq"].to_numpy() == dev * dev).all()
    assert (d["out_of_control"].to_numpy()
            == (dev * dev > 9 * S * H).astype(np.int64)).all()
    mu = S / H
    float_flag = (np.abs(n - mu) > 3 * np.sqrt(mu)).astype(np.int64)
    assert (float_flag == d["out_of_control"].to_numpy()).all()
