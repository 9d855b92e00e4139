"""Extension batch 67: lag-1 autocovariance moments + OLS via Cramer rationals."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "lineitem"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_lag1_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext67 import (
        SQL_USER_LAG1_MOMENTS, q_user_lag1_moments,
    )

    d = q_user_lag1_moments(SF).to_pandas()
    o = con.execute(SQL_USER_LAG1_MOMENTS).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_lag1_partition_invariance(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext67 import q_user_lag1_moments

    a = _norm(q_user_lag1_moments(SF, n_parts=1).to_pandas())
    b = _norm(q_user_lag1_moments(SF, n_parts=7).to_pandas())
    assert a.equals(b)


def test_lag1_brute_force_one_user(ray_session, con):
    """Recompute one user's moments from the raw ordered series."""
    from polylabel_rs_ray.pipelines.queries_ext67 import q_user_lag1_moments

    d = q_user_lag1_moments(SF).to_pandas()
    uid = int(d["user_id"].iloc[0])
    raw = con.execute(
        "SELECT CAST(ROUND(value*100) AS BIGINT) AS c FROM events "
        f"WHERE user_id = {uid} ORDER BY ts, event_id").df()["c"].to_numpy()
    row = d[d["user_id"] == uid].iloc[0]
    assert int(row["n_events"]) == len(raw)
    assert int(row["sum_cents"]) == int(raw.sum())
    assert int(row["sum_sq_cents"]) == int((raw * raw).sum())
    assert int(row["sum_lag1_prod"]) == int((raw[:-1] * raw[1:]).sum())


def test_ols_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext67 import (
        SQL_OLS_PRICE_MODEL, q_ols_price_model,
    )

    d = q_ols_price_model(SF)
    o = con.execute(SQL_OLS_PRICE_MODEL).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_ols_solves_normal_equations(ray_session, con):
    """beta = num/den satisfies the float normal equations to rounding."""
    from polylabel_rs_ray.pipelines.queries_ext67 import q_ols_price_model

    d = q_ols_price_model(SF).iloc[0]
    den = int(d["beta_den"])
    assert den != 0
    beta = np.array([int(d["beta0_num"]), int(d["beta1_num"]),
                     int(d["beta2_num"])], dtype=np.float64) / den
    t = con.execute("""
        SELECT CAST(ROUND(l_quantity) AS BIGINT) AS x1,
               CAST(ROUND(l_discount*100) AS BIGINT) AS x2,
               CAST(ROUND(l_extendedprice*100) AS BIGINT) AS y
        FROM lineitem""").df()
    X = np.column_stack([np.ones(len(t)), t["x1"], t["x2"]]).astype(np.float64)
    y = t["y"].to_numpy().astype(np.float64)
    ref, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert np.allclose(beta, ref, rtol=1e-8)
