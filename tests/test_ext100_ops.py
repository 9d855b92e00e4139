"""Extension batch 100: curve locality comparison + extent ratio."""

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


def test_locality_matches_oracle(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext100 import (
        _sql_curve_locality_compare, q_curve_locality_compare,
    )

    d = q_curve_locality_compare(SF)
    o = con.execute(_sql_curve_locality_compare()).df()
    assert len(d) == len(o) == 2
    assert _norm(d).equals(_norm(o))


def test_hilbert_beats_zorder(ray_session):
    """The design claim the op exists to document: Hilbert ordering walks
    the occupied cells with strictly less total Manhattan distance."""
    from polylabel_rs_ray.pipelines.queries_ext100 import (
        q_curve_locality_compare,
    )

    d = q_curve_locality_compare(SF).set_index("curve")
    assert (d.loc["hilbert", "total_manhattan_step"]
            < d.loc["zorder", "total_manhattan_step"])
    # both walks are lower-bounded by n_cells - 1 (unit steps minimum)
    n = int(d["n_cells"].iloc[0])
    assert (d["total_manhattan_step"] >= n - 1).all()


def test_full_grid_locality_is_optimal_for_hilbert():
    """On the FULL grid the Hilbert walk is all unit steps (255 for 16x16);
    z-order pays the long diagonal jumps."""
    from polylabel_rs_ray.pipelines.queries_ext100 import (
        GRID_N, _interleave16,
    )
    from polylabel_rs_ray.pipelines.queries_ext79 import hilbert_xy2d

    xs, ys = np.meshgrid(np.arange(GRID_N), np.arange(GRID_N))
    cx, cy = xs.ravel().astype(np.int64), ys.ravel().astype(np.int64)
    h = hilbert_xy2d(cx, cy, n=GRID_N)
    oh = np.argsort(h)
    steps_h = (np.abs(np.diff(cx[oh])) + np.abs(np.diff(cy[oh]))).sum()
    assert steps_h == GRID_N * GRID_N - 1
    z = (_interleave16(cx) | (_interleave16(cy) << np.uint64(1))).astype(
        np.int64)
    oz = np.argsort(z)
    steps_z = (np.abs(np.diff(cx[oz])) + np.abs(np.diff(cy[oz]))).sum()
    assert steps_z > steps_h


def test_extent_matches_oracle(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext100 import (
        _sql_extent_stats, q_extent_stats,
    )

    d = q_extent_stats(SF).to_pandas()
    o = con.execute(_sql_extent_stats()).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))
    # extent is a ratio in [0, 1] wherever the bbox is non-degenerate
    nz = d[d["bbox_area"] > 0]
    assert ((nz["area"] >= 0) & (nz["area"] <= nz["bbox_area"])).all()


def test_extent_known_shapes():
    from polylabel_rs_ray.pipelines.queries_ext100 import _extent

    sq = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0),
                   (0.0, 0.0)])
    a, b = _extent(sq)
    assert a == b == 16.0
    tri = np.array([(0.0, 0.0), (4.0, 0.0), (0.0, 4.0), (0.0, 0.0)])
    a, b = _extent(tri)
    assert a == 8.0 and b == 16.0  # extent 1/2
