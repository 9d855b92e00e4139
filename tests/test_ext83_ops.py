"""Extension batch 83: dictionary-encoding cost + mirror symmetry."""

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


def test_dict_estimate_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext83 import (
        _sql_dict_encoding_estimate, q_dict_encoding_estimate,
    )

    d = q_dict_encoding_estimate(SF)
    o = con.execute(_sql_dict_encoding_estimate()).df()
    assert len(d) == len(o) == 3
    assert _norm(d).equals(_norm(o))


def test_dict_estimate_compresses_low_cardinality(ray_session):
    """On these bounded-dictionary columns dict encoding beats raw."""
    from polylabel_rs_ray.pipelines.queries_ext83 import (
        q_dict_encoding_estimate,
    )

    d = q_dict_encoding_estimate(SF)
    assert (d["n_distinct"] <= d["n_rows"]).all()
    assert (d["dict_bytes"] < d["raw_bytes"]).all()


def test_mirror_matches_oracle(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext83 import (
        _sql_mirror_symmetry_audit, q_mirror_symmetry_audit,
    )

    d = q_mirror_symmetry_audit(SF).to_pandas()
    o = con.execute(_sql_mirror_symmetry_audit()).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_mirror_engine_equals_twin():
    from polylabel_rs_ray.pipelines.queries_ext83 import (
        _is_mirror, _twin_is_mirror,
    )
    from polylabel_rs_ray.pipelines.queries_ext import _norm_exterior
    from polylabel_rs_ray.sources.fixtures import DYADIC_FIXTURES, FIXTURES

    for name in DYADIC_FIXTURES:
        ext = _norm_exterior(
            [np.asarray(r, dtype=np.float64) for r in FIXTURES[name].rings])
        for axis in (0, 1):
            assert _is_mirror(ext, axis) == _twin_is_mirror(ext, axis), name


def test_mirror_known_shapes():
    from polylabel_rs_ray.pipelines.queries_ext83 import _is_mirror

    square = np.array([(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0),
                       (0.0, 0.0)])
    assert _is_mirror(square, 0) and _is_mirror(square, 1)
    lshape = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (1.0, 1.0),
                       (1.0, 4.0), (0.0, 4.0), (0.0, 0.0)])
    # the L is symmetric only under the diagonal, not axis mirrors
    assert not _is_mirror(lshape, 0) and not _is_mirror(lshape, 1)
    iso_triangle = np.array([(0.0, 0.0), (4.0, 0.0), (2.0, 3.0), (0.0, 0.0)])
    assert _is_mirror(iso_triangle, 0) and not _is_mirror(iso_triangle, 1)
