"""Extension batch 76: STR bulk-load packing + label clearance."""

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


def test_str_pack_matches_oracle(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext76 import (
        _sql_str_pack_audit, q_str_pack_audit,
    )

    d = q_str_pack_audit(SF)
    o = con.execute(_sql_str_pack_audit()).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_str_pack_structure(ray_session):
    """Every node holds <= capacity points, all points are packed, and
    bboxes are well-formed."""
    from polylabel_rs_ray.pipelines.queries_ext76 import (
        STR_NODE_CAP, q_str_pack_audit,
    )
    from polylabel_rs_ray.pipelines.queries import _dyadic_labeled

    d = q_str_pack_audit(SF)
    assert (d["n_points"] <= STR_NODE_CAP).all()
    assert int(d["n_points"].sum()) == _dyadic_labeled(SF).count()
    assert (d["x_min"] <= d["x_max"]).all()
    assert (d["y_min"] <= d["y_max"]).all()


def test_clearance_matches_oracle(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext76 import (
        _sql_label_clearance, q_label_clearance,
    )

    d = q_label_clearance(SF).to_pandas()
    o = con.execute(_sql_label_clearance()).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_clearance_engine_equals_twin_and_positive():
    """Engine scan == reversed-order twin on every dyadic fixture, and the
    pole of a non-degenerate polygon has strictly positive clearance."""
    from polylabel_rs_ray.geom.kernel import polylabel_one
    from polylabel_rs_ray.pipelines.queries_ext76 import (
        _clearance_sq, _twin_clearance,
    )
    from polylabel_rs_ray.sources.fixtures import DYADIC_FIXTURES, FIXTURES

    for name in DYADIC_FIXTURES:
        fx = FIXTURES[name]
        rings = [np.asarray(r, dtype=np.float64) for r in fx.rings]
        off = rings[0].min(axis=0)
        rings = [r - off for r in rings]
        if fx.kind == "sentinel":
            label = (0.0, 0.0)
        else:
            lx, ly, *_ = polylabel_one(rings, fx.tolerance)
            label = (lx, ly)
        a = _clearance_sq(rings, label)
        b = _twin_clearance(rings, label)
        assert a == b, name
        if fx.kind == "exact":
            assert a > 0.0, name


def test_seg_dist_formula():
    from polylabel_rs_ray.pipelines.queries_ext76 import _seg_dist_sq

    # perpendicular foot inside the segment
    assert _seg_dist_sq(0.0, 1.0, -1.0, 0.0, 1.0, 0.0) == 1.0
    # clamped to an endpoint
    assert _seg_dist_sq(3.0, 4.0, 0.0, 0.0, 1.0, 0.0) == 2.0 ** 2 + 4.0 ** 2
    # degenerate zero-length segment
    assert _seg_dist_sq(1.0, 1.0, 2.0, 2.0, 2.0, 2.0) == 2.0
