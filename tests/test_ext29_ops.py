"""Extension batch 29: exact rectangle-union area (Klee's problem)."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


def test_bbox_union_area_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext29 import (
        _sql_bbox_union_area, q_bbox_union_area,
    )

    d = q_bbox_union_area(SF).to_pandas()
    o = con.execute(_sql_bbox_union_area()).df()
    cols = sorted(d.columns)
    a = d[cols].sort_values(cols).reset_index(drop=True)
    b = o[cols].astype(a.dtypes.to_dict()).sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert a.equals(b)
    # slab identities
    assert (a["x1"] > a["x0"]).all()
    assert (a["area"] == (a["x1"] - a["x0"]) * a["y_len"]).all()
    # zero-height bboxes (degenerate dyadic fixtures) yield y_len == 0 rows
    assert (a["y_len"] >= 0).all()
    assert (a["y_len"] > 0).any()


def test_bbox_union_area_partition_invariant(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext29 import q_bbox_union_area

    a = (q_bbox_union_area(SF, n_parts=1).to_pandas()
         .sort_values(["x0"]).reset_index(drop=True))
    b = (q_bbox_union_area(SF, n_parts=5).to_pandas()
         .sort_values(["x0"]).reset_index(drop=True))
    assert a.equals(b)


def test_bbox_union_area_bounds(ray_session, con):
    """Union area is bounded below by the largest single rect and above by
    the sum of all rect areas (with strict inequality when rects overlap,
    which the dyadic offsets guarantee at this sf)."""
    from polylabel_rs_ray.pipelines.queries_ext29 import q_bbox_union_area
    from polylabel_rs_ray.pipelines.queries_ext import _sql_dyadic_bbox_cte

    union = q_bbox_union_area(SF).to_pandas()["area"].sum()
    rects = con.execute(
        f"WITH boxes AS ({_sql_dyadic_bbox_cte()}) "
        "SELECT (bx1-bx0)*(by1-by0) AS a FROM boxes"
    ).df()["a"]
    assert rects.max() <= union < rects.sum()


def test_bbox_union_area_bruteforce_rasterized(ray_session, con):
    """Exact replay on a fine grid: every dyadic fixture coordinate at this
    sf is a multiple of 2^-5 after integer translation, so a 1/32-unit
    rasterization of the rect set measures the union area exactly."""
    from polylabel_rs_ray.pipelines.queries_ext29 import q_bbox_union_area
    from polylabel_rs_ray.pipelines.queries_ext import _sql_dyadic_bbox_cte

    boxes = con.execute(
        f"WITH boxes AS ({_sql_dyadic_bbox_cte()}) SELECT * FROM boxes"
    ).df()
    S = 32
    q = lambda v: np.round(v * S).astype(np.int64)
    bx0, bx1 = q(boxes["bx0"]), q(boxes["bx1"])
    by0, by1 = q(boxes["by0"]), q(boxes["by1"])
    # coordinates must actually be on the 1/S grid for exact replay
    assert np.allclose(bx0 / S, boxes["bx0"]) and np.allclose(by1 / S, boxes["by1"])
    ox, oy = bx0.min(), by0.min()
    W, H = int(bx1.max() - ox), int(by1.max() - oy)
    grid = np.zeros((W, H), dtype=bool)
    for x0, x1, y0, y1 in zip(bx0 - ox, bx1 - ox, by0 - oy, by1 - oy):
        grid[x0:x1, y0:y1] = True
    want = grid.sum() / (S * S)
    got = q_bbox_union_area(SF).to_pandas()["area"].sum()
    assert got == want
