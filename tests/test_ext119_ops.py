"""Extension batch 119: exact second moments + lattice supercover."""

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


def test_moments_match_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext119 import (
        _sql_area_moment_stats, q_area_moment_stats,
    )

    d = q_area_moment_stats(SF).to_pandas()
    o = con.execute(_sql_area_moment_stats()).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_moments_consistent_with_area(ray_session):
    """Green's-theorem sanity: for the unit-ish fixtures, 12*Ixx and
    12*Iyy of a CCW-positive polygon are positive multiples of the area
    sign; degenerate (zero-area) fixtures give all-zero moments.  Also
    cross-check one fixture against a brute integral twin: for l_shape
    (axis-aligned rectilinear), Ixx decomposes over the two rectangles
    [0,4]x[0,1] and [0,1]x[1,4] via the b*h^3/3 strip formula about y=0."""
    from polylabel_rs_ray.pipelines.queries_ext119 import q_area_moment_stats
    from polylabel_rs_ray.sources.fixtures import FIXTURE_CYCLE

    d = q_area_moment_stats(SF).to_pandas()
    by_fix = {int(k): g for k, g in d.groupby("fixture_idx")}
    for fix, g in by_fix.items():
        # per-fixture constants (translation-exact normalization)
        assert g["ixx12"].nunique() == 1
        assert g["iyy12"].nunique() == 1
        assert g["ixy24"].nunique() == 1
    l_idx = FIXTURE_CYCLE.index("l_shape")
    # Ixx = int y^2 dA = 4*1^3/3 + 1*(4^3-1^3)/3 = (4 + 63)/3 → ixx12 = 4*67
    assert by_fix[l_idx]["ixx12"].iloc[0] == 12 * 67 // 3
    assert by_fix[l_idx]["iyy12"].iloc[0] == 12 * 67 // 3  # symmetric shape
    for name in ("degenerate_collinear", "degenerate_spike"):
        z = by_fix[FIXTURE_CYCLE.index(name)]
        assert (z[["ixx12", "iyy12", "ixy24"]] == 0).all().all()


def test_supercover_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext119 import (
        _sql_edge_supercover_stats, q_edge_supercover_stats,
    )

    d = q_edge_supercover_stats(SF).to_pandas()
    o = con.execute(_sql_edge_supercover_stats()).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_supercover_identity(ray_session):
    """Axis-aligned fixtures cross zero cell interiors (every edge runs
    on grid lines); the identity dx+dy-gcd is checked against a dense
    pixel-walk twin on a synthetic diagonal edge set."""
    from polylabel_rs_ray.pipelines.queries_ext119 import q_edge_supercover_stats
    from polylabel_rs_ray.sources.fixtures import FIXTURE_CYCLE

    d = q_edge_supercover_stats(SF).to_pandas()
    for name in ("l_shape", "square_with_hole", "degenerate_collinear"):
        g = d[d["fixture_idx"] == FIXTURE_CYCLE.index(name)]
        assert (g["cells_crossed"] == 0).all()

    # dense twin: count unit cells whose OPEN interior the segment
    # y = (dy/dx) x, x in [0,dx] meets (exact rational interval test)
    def brute(dx, dy):
        from fractions import Fraction as F
        n = 0
        for cx in range(dx):
            for cy in range(dy):
                lo = max(F(cx), F(cy * dx, dy))
                hi = min(F(cx + 1), F((cy + 1) * dx, dy))
                if lo < hi:
                    n += 1
        return n

    for dx, dy in [(2, 3), (4, 6), (5, 1), (7, 7), (1, 9)]:
        assert brute(dx, dy) == dx + dy - int(np.gcd(dx, dy))
