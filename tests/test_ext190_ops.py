"""Extension batch 190: tile 3-NN profile + SPF histogram."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "orders"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_knn3_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext190 import (
        _sql_tile_knn3_profile, q_tile_knn3_profile,
    )

    d = q_tile_knn3_profile(SF).to_pandas()
    o = con.execute(_sql_tile_knn3_profile()).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))
    assert d["d3_cheb"].nunique() > 1


def test_knn3_scalar_twin(ray_session):
    """Per-cell sorted-distance recheck; d3 >= d1 trivially and the
    k-distance is monotone in k."""
    from polylabel_rs_ray.pipelines.queries_ext190 import (
        KNN_K, KNN_RES, q_tile_knn3_profile,
    )
    from polylabel_rs_ray.pipelines.queries_ext159 import _lattice_res

    d = q_tile_knn3_profile(SF).to_pandas()
    lat = _lattice_res(SF, KNN_RES)
    cells = list(zip(*np.nonzero(lat > 0)))
    got = {(int(r.ix), int(r.iy)): int(r.d3_cheb) for r in d.itertuples()}
    for (x, y) in cells:
        ds = sorted(max(abs(x - u), abs(y - v))
                    for (u, v) in cells if (u, v) != (x, y))
        assert got[(int(x), int(y))] == ds[KNN_K - 1]
        assert ds[KNN_K - 1] >= ds[0]


def test_spf_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext190 import (
        _sql_orderkey_spf_histogram, q_orderkey_spf_histogram,
    )

    d = q_orderkey_spf_histogram(SF).to_pandas()
    o = con.execute(_sql_orderkey_spf_histogram()).df()
    assert len(d) == len(o) > 10
    assert _norm(d).equals(_norm(o))


def test_spf_number_theory(ray_session, con):
    """Scalar sympy-free recheck, density identities: spf=2 is every
    second key (keys are the dense 2..N+1 range), spf values are prime,
    masses sum to the order count."""
    from polylabel_rs_ray.pipelines.queries_ext190 import (
        SPF_PROBE_MAX, q_orderkey_spf_histogram,
    )

    d = q_orderkey_spf_histogram(SF).to_pandas().set_index("spf")
    keys = [int(r[0]) + 2 for r in con.execute(
        "SELECT o_orderkey FROM orders").fetchall()]
    want = {}
    for k in keys:
        s = 0
        for p in range(2, SPF_PROBE_MAX):
            if all(p % q for q in range(2, int(p ** 0.5) + 1)) \
                    and k % p == 0:
                s = p
                break
        want[s] = want.get(s, 0) + 1
    assert {int(i): int(v) for i, v in d["n_keys"].items()} == want
    assert int(d["n_keys"].sum()) == len(keys)
    n = len(keys)
    assert abs(int(d["n_keys"].get(2, 0)) - n // 2) <= 1  # dense range
    for s in d.index:
        s = int(s)
        if s:
            assert all(s % q for q in range(2, int(s ** 0.5) + 1))
