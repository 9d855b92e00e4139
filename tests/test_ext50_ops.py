"""Extension batch 50: ear-clipping triangulation with area closure."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


def _sorted(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_triangulate_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext50 import (
        _sql_triangulate_stats, q_triangulate_stats,
    )

    d = _sorted(q_triangulate_stats(SF).to_pandas())
    o = con.execute(_sql_triangulate_stats()).df()
    o = _sorted(o.astype(d.dtypes.to_dict()))
    assert len(d) == len(o) > 0
    assert d.equals(o)
    # both degenerate (0 triangles) and real rings are exercised
    assert (d["n_triangles"] == 0).any()
    assert (d["n_triangles"] > 0).any()


def test_ear_clip_properties():
    """Hand geometry: triangle counts, exact area closure on concave and
    convex rings (with and without a closing vertex), CW input, and
    degenerate rings."""
    from polylabel_rs_ray.pipelines.queries_ext50 import ear_clip, tri_area2_sum

    square = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)
    tris = ear_clip(square)
    assert len(tris) == 2
    assert tri_area2_sum(square, tris) == 32.0

    # concave L (closed ring), area 12 -> 2*area 24, 6 effective verts
    ell = np.array(
        [[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4], [0, 0]], dtype=float
    )
    tris = ear_clip(ell)
    assert len(tris) == 4
    assert tri_area2_sum(ell, tris) == 24.0

    # clockwise input triangulates identically (orientation normalized)
    cw = ell[::-1]
    tris_cw = ear_clip(cw)
    assert len(tris_cw) == 4
    assert tri_area2_sum(cw, tris_cw) == 24.0

    # degenerate: collinear and too-short rings produce nothing
    assert ear_clip(np.array([[0, 0], [1, 1], [2, 2]], dtype=float)) == []
    assert ear_clip(np.array([[0, 0], [1, 1]], dtype=float)) == []

    # non-overlapping cover: every triangle positively oriented
    from polylabel_rs_ray.pipelines.queries_ext50 import _cross, _strip_close

    pts = _strip_close(ell)
    for a, b, c in tris:
        assert _cross(pts[a], pts[b], pts[c]) > 0
