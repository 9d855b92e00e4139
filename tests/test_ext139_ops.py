"""Extension batch 139: rolling max + tile equalization."""

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


def test_rolling_max_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext139 import (
        SQL_HOURLY_ROLLING_MAX, q_hourly_rolling_max,
    )

    d = q_hourly_rolling_max(SF).to_pandas()
    o = con.execute(SQL_HOURLY_ROLLING_MAX).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_rolling_max_properties(ray_session):
    """rolling_max >= n everywhere, monotone under window growth
    (trailing-6 max >= the element 5 back), and a brute window twin."""
    from polylabel_rs_ray.pipelines.queries_ext139 import (
        ROLL_WINDOW, q_hourly_rolling_max,
    )

    d = q_hourly_rolling_max(SF).to_pandas()
    assert (d["rolling_max"] >= d["n"]).all()
    for et, g in d.groupby("event_type"):
        g = g.sort_values("hour").reset_index(drop=True)
        c = g["n"].to_numpy()
        for i in range(len(g)):
            lo = max(0, i - ROLL_WINDOW + 1)
            assert g["rolling_max"].iloc[i] == c[lo:i + 1].max()


def test_equalize_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext139 import (
        _sql_tile_equalize, q_tile_equalize,
    )

    d = q_tile_equalize(SF).to_pandas()
    o = con.execute(_sql_tile_equalize()).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_equalize_properties(ray_session):
    """Equalized levels are monotone in (count, tile_id) order, live in
    [0, L), and the count-heaviest tile maps to the top occupied level;
    reconciles with tile_counts."""
    from polylabel_rs_ray.pipelines.queries import q_tile_counts
    from polylabel_rs_ray.pipelines.queries_ext139 import (
        EQ_LEVELS, q_tile_equalize,
    )

    d = q_tile_equalize(SF).to_pandas()
    tc = q_tile_counts(SF).to_pandas()
    assert len(d) == len(tc)
    assert int(d["n_points"].sum()) == int(tc["n_points"].sum())
    assert (d["eq_level"] >= 0).all()
    assert (d["eq_level"] < EQ_LEVELS).all()
    g = d.sort_values(["n_points", "tile_id"]).reset_index(drop=True)
    assert (np.diff(g["eq_level"].to_numpy()) >= 0).all()
