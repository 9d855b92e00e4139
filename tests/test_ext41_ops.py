"""Extension batch 41: Moran's I spatial autocorrelation."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


def test_morans_i_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext41 import (
        _sql_morans_i_tiles, q_morans_i_tiles,
    )

    d = q_morans_i_tiles(SF).to_pandas()
    o = con.execute(_sql_morans_i_tiles()).df()
    assert len(d) == len(o) == 1
    for col in ("n_tiles", "w_pairs", "num", "den"):
        assert int(d.iloc[0][col]) == int(o.iloc[0][col]), col
    assert d.iloc[0]["morans_i"] == o.iloc[0]["morans_i"]


def test_morans_i_brute_force(ray_session):
    """Densified-histogram replay with numpy == the pipeline, and the
    statistic is inside its mathematical range."""
    from polylabel_rs_ray.pipelines.queries import _dyadic_labeled
    from polylabel_rs_ray.pipelines.queries_ext41 import (
        _grid_params, q_morans_i_tiles,
    )

    got = q_morans_i_tiles(SF).to_pandas().iloc[0]
    n, wmin, ts = _grid_params()
    pts = _dyadic_labeled(SF).to_pandas()
    ix = np.clip(np.floor((pts["label_x"] - wmin) / ts).astype(int), 0, n - 1)
    iy = np.clip(np.floor((pts["label_y"] - wmin) / ts).astype(int), 0, n - 1)
    grid = np.zeros((n, n), dtype=np.int64)
    np.add.at(grid, (ix, iy), 1)
    T, N = n * n, int(grid.sum())
    d = (T * grid - N).astype(object)
    den = int((d * d).sum())
    num = 2 * int((d[:-1, :] * d[1:, :]).sum()) + 2 * int((d[:, :-1] * d[:, 1:]).sum())
    assert int(got["num"]) == num
    assert int(got["den"]) == den
    assert got["morans_i"] == float(T * num) / float(4 * n * (n - 1) * den)
    # labels cluster into the fixture offsets -> strong positive
    # autocorrelation, and |I| is bounded by ~1 on any lattice
    assert -1.5 < got["morans_i"] < 1.5
    assert got["morans_i"] > 0
