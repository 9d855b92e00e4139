"""Extension batch 116: AMS F2 sketch + Haar hourly energy spectrum."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_ams_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext116 import (
        _sql_ams_f2_sketch, q_ams_f2_sketch,
    )

    d = q_ams_f2_sketch(SF).to_pandas()
    o = con.execute(_sql_ams_f2_sketch()).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_ams_estimator_contract(ray_session):
    """The mean-of-squares estimate lands inside a loose variance band
    of exact F2 (Var(z²) <= 2·F2² per counter, so the K=64 mean has
    relative std ~ sqrt(2/64) ≈ 0.18; 1.0 is >5 sigma)."""
    from polylabel_rs_ray.pipelines.queries_ext116 import (
        AMS_K, q_ams_f2_sketch,
    )

    d = q_ams_f2_sketch(SF).to_pandas()
    assert len(d) == AMS_K
    f2 = int(d["f2_exact"].iloc[0])
    est_num = int(d["f2_est_x_k"].iloc[0])
    # the published numerator really is Σ z² over the published counters
    assert est_num == int(np.dot(d["z"].to_numpy(), d["z"].to_numpy()))
    est = est_num / AMS_K
    assert f2 > 0
    assert abs(est / f2 - 1.0) < 1.0


def test_haar_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext116 import (
        _sql_haar_hourly_energy, q_haar_hourly_energy,
    )

    d = q_haar_hourly_energy(SF).to_pandas()
    o = con.execute(_sql_haar_hourly_energy()).df()
    assert len(d) == len(o) == 10
    assert _norm(d).equals(_norm(o))


def test_haar_parseval_identity(ray_session):
    """Unnormalized-Haar Parseval: Σ_L energy_L·N/2^L + (Σh)² == N·Σh²,
    with the level-L coefficient count halving down to 1."""
    from polylabel_rs_ray.pipelines.queries_ext116 import (
        HAAR_N, _hourly_counts, q_haar_hourly_energy,
    )

    d = q_haar_hourly_energy(SF).to_pandas().sort_values("level")
    h = _hourly_counts(SF)
    lhs = int(sum(int(e) * (HAAR_N >> int(lv))
                  for lv, e in zip(d["level"], d["energy"])))
    lhs += int(h.sum()) ** 2
    assert lhs == HAAR_N * int(np.dot(h, h))
    assert list(d["n_coeffs"]) == [HAAR_N >> lv for lv in d["level"]]
    # brute-force recount of the transform on the driver vector
    cur, energies = h.copy(), []
    while len(cur) > 1:
        a, b = cur[0::2], cur[1::2]
        energies.append(int(np.dot(a - b, a - b)))
        cur = a + b
    assert list(d["energy"]) == energies
