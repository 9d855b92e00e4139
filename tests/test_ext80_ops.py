"""Extension batch 80: star-shaped kernel audit + quota apportionment."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("customer", "documents"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_star_audit_matches_oracle(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext80 import (
        _sql_star_shaped_audit, q_star_shaped_audit,
    )

    d = q_star_shaped_audit(SF).to_pandas()
    o = con.execute(_sql_star_shaped_audit()).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_kernel_engine_equals_twin():
    from polylabel_rs_ray.geom.kernel import polylabel_one
    from polylabel_rs_ray.pipelines.queries_ext80 import (
        _kernel_violations, _twin_kernel_violations,
    )
    from polylabel_rs_ray.pipelines.queries_ext import _norm_exterior
    from polylabel_rs_ray.sources.fixtures import DYADIC_FIXTURES, FIXTURES

    for name in DYADIC_FIXTURES:
        fx = FIXTURES[name]
        rings = [np.asarray(r, dtype=np.float64) for r in fx.rings]
        ext = _norm_exterior(rings)
        if fx.kind == "sentinel":
            p = (0.0, 0.0)
        else:
            off = rings[0].min(axis=0)
            lx, ly, *_ = polylabel_one([r - off for r in rings],
                                       fx.tolerance)
            p = (lx, ly)
        assert _kernel_violations(ext, *p) == \
            _twin_kernel_violations(ext, *p), name


def test_kernel_known_geometry():
    """A convex square is star-shaped from its center; the L-shape is
    star-shaped from the inner-corner region but NOT from the far tip."""
    from polylabel_rs_ray.pipelines.queries_ext80 import _kernel_violations

    sq = np.array([(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0),
                   (0.0, 0.0)])
    assert _kernel_violations(sq, 1.0, 1.0) == 0
    lshape = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (1.0, 1.0),
                       (1.0, 4.0), (0.0, 4.0), (0.0, 0.0)])
    assert _kernel_violations(lshape, 0.5, 0.5) == 0  # sees both arms
    assert _kernel_violations(lshape, 3.5, 0.5) > 0   # can't see the top arm


def test_quota_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext80 import (
        SQL_NATION_QUOTA_ALLOCATION, q_nation_quota_allocation,
    )

    d = q_nation_quota_allocation(SF)
    o = con.execute(SQL_NATION_QUOTA_ALLOCATION).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_quota_apportionment_properties(ray_session):
    """Slots sum exactly to K; every quota is floor or floor+1 of the
    proportional share (the Hamilton-method quota property)."""
    from polylabel_rs_ray.pipelines.queries_ext80 import (
        QUOTA_SLOTS, q_nation_quota_allocation,
    )

    d = q_nation_quota_allocation(SF)
    assert int(d["quota"].sum()) == QUOTA_SLOTS
    total = int(d["n_customers"].sum())
    for _, r in d.iterrows():
        lo = (QUOTA_SLOTS * int(r["n_customers"])) // total
        assert lo <= int(r["quota"]) <= lo + 1
