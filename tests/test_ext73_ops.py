"""Extension batch 73: minimum enclosing circle + cumulative unique users."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "documents"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_mec_matches_oracle(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext73 import (
        _sql_bounding_circle_stats, q_bounding_circle_stats,
    )

    d = q_bounding_circle_stats(SF).to_pandas()
    o = con.execute(_sql_bounding_circle_stats()).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_welzl_equals_brute_force_on_fixtures():
    from polylabel_rs_ray.pipelines.queries_ext73 import (
        _brute_force_mec, _welzl,
    )
    from polylabel_rs_ray.pipelines.queries_ext import _norm_exterior
    from polylabel_rs_ray.sources.fixtures import DYADIC_FIXTURES, FIXTURES

    for name in DYADIC_FIXTURES:
        ext = _norm_exterior(
            [np.asarray(r, dtype=np.float64) for r in FIXTURES[name].rings])
        poly = ext[:-1] if np.array_equal(ext[0], ext[-1]) else ext
        assert _welzl(poly) == _brute_force_mec(poly), name


def test_mec_contains_all_and_is_tight():
    """Every vertex inside; for the unit-square shape the MEC is the
    circumcircle of the diagonal."""
    from polylabel_rs_ray.pipelines.queries_ext73 import IN_EPS, _welzl

    sq = np.array([(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)])
    cx, cy, rsq = _welzl(sq)
    assert (cx, cy) == (1.0, 1.0)
    assert rsq == 2.0  # half-diagonal squared
    for p in sq:
        assert (p[0] - cx) ** 2 + (p[1] - cy) ** 2 <= rsq + IN_EPS


def test_mec_collinear_points():
    """Collinear input degenerates to the diameter circle of the extremes."""
    from polylabel_rs_ray.pipelines.queries_ext73 import _welzl

    line = np.array([(0.0, 0.0), (1.0, 1.0), (3.0, 3.0), (2.0, 2.0)])
    cx, cy, rsq = _welzl(line)
    assert (cx, cy) == (1.5, 1.5)
    assert rsq == pytest.approx(4.5)


def test_cumulative_users_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext73 import (
        SQL_CUMULATIVE_UNIQUE_USERS, q_cumulative_unique_users,
    )

    d = q_cumulative_unique_users(SF)
    o = con.execute(SQL_CUMULATIVE_UNIQUE_USERS).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))
    # final cumulative equals the total distinct user count
    total = con.execute(
        "SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    assert int(d["cum_users"].iloc[-1]) == total
    assert (d["new_users"] >= 1).all()
