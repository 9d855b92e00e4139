"""Extension batch 156: Chebyshev distance transform + vertical seam DP."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_chebyshev_dt_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext156 import (
        _sql_tile_chebyshev_dt, q_tile_chebyshev_dt,
    )

    d = q_tile_chebyshev_dt(SF).to_pandas()
    o = con.execute(_sql_tile_chebyshev_dt()).df()
    assert len(d) == len(o) == 1024
    assert _norm(d).equals(_norm(o))


def test_chebyshev_dt_bruteforce_and_lipschitz(ray_session):
    """Third implementation: dense numpy min over occupied cells; plus the
    1-Lipschitz property of any metric DT under king moves."""
    from polylabel_rs_ray.pipelines.queries_ext156 import (
        _lattice, q_tile_chebyshev_dt,
    )

    d = q_tile_chebyshev_dt(SF).to_pandas()
    lat = _lattice(SF)
    n = lat.shape[0]
    ox, oy = np.nonzero(lat > 0)
    assert len(ox) > 0
    dt = np.empty((n, n), dtype=np.int64)
    for x in range(n):
        for y in range(n):
            dt[x, y] = np.maximum(np.abs(ox - x), np.abs(oy - y)).min()
    got = np.zeros((n, n), dtype=np.int64)
    got[d["ix"].to_numpy(), d["iy"].to_numpy()] = d["dt"].to_numpy()
    assert np.array_equal(got, dt)
    # occupied iff dt == 0
    assert np.array_equal(got == 0, lat > 0)
    # 1-Lipschitz in the king metric: adjacent cells differ by <= 1
    assert np.all(np.abs(np.diff(got, axis=0)) <= 1)
    assert np.all(np.abs(np.diff(got, axis=1)) <= 1)
    assert np.all(np.abs(got[1:, 1:] - got[:-1, :-1]) <= 1)


def test_seam_dp_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext156 import (
        _sql_tile_seam_dp, q_tile_seam_dp,
    )

    d = q_tile_seam_dp(SF).to_pandas()
    o = con.execute(_sql_tile_seam_dp()).df()
    assert len(d) == len(o) == 1024
    assert _norm(d).equals(_norm(o))


def test_seam_dp_recurrence_and_scalar_dp(ray_session):
    """Scalar-loop reference DP + per-state recurrence check; the terminal
    max must dominate every greedy seam and be achieved by some seam."""
    from polylabel_rs_ray.pipelines.queries_ext156 import (
        _lattice, q_tile_seam_dp,
    )

    d = q_tile_seam_dp(SF).to_pandas()
    w = _lattice(SF).T  # [iy, ix]
    n = w.shape[0]
    M = np.zeros((n, n), dtype=np.int64)
    got = np.zeros((n, n), dtype=np.int64)
    got[d["iy"].to_numpy(), d["ix"].to_numpy()] = d["best_mass"].to_numpy()
    for x in range(n):
        M[0, x] = w[0, x]
    for y in range(1, n):
        for x in range(n):
            best = M[y - 1, x]
            if x > 0:
                best = max(best, M[y - 1, x - 1])
            if x < n - 1:
                best = max(best, M[y - 1, x + 1])
            M[y, x] = w[y, x] + best
    assert np.array_equal(got, M)
    # terminal value is achieved by the backtracked greedy seam
    total = int(M[n - 1].max())
    x = int(np.argmax(M[n - 1]))
    mass = int(w[n - 1, x])
    for y in range(n - 1, 0, -1):
        cands = [c for c in (x - 1, x, x + 1) if 0 <= c < n]
        x = max(cands, key=lambda c: (M[y - 1, c], -c))
        mass += int(w[y - 1, x])
    assert mass == total
    assert total >= int(w.sum(axis=1).max() // n)  # sanity: non-negative
