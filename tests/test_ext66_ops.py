"""Extension batch 66: geometry validity audit + PMI collocations."""

import duckdb
import math
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


def test_ring_audit_matches_oracle(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext66 import (
        _sql_ring_audit, q_ring_audit,
    )

    d = q_ring_audit(SF).to_pandas()
    o = con.execute(_sql_ring_audit()).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_ring_audit_engine_equals_twin():
    from polylabel_rs_ray.pipelines.queries_ext66 import (
        _ring_audit_one, _twin_ring_audit,
    )
    from polylabel_rs_ray.pipelines.queries_ext import _norm_exterior
    from polylabel_rs_ray.sources.fixtures import DYADIC_FIXTURES, FIXTURES

    for name in DYADIC_FIXTURES:
        ext = _norm_exterior(
            [np.asarray(r, dtype=np.float64) for r in FIXTURES[name].rings])
        assert _ring_audit_one(ext) == _twin_ring_audit(ext), name


def test_ring_audit_known_shapes():
    from polylabel_rs_ray.pipelines.queries_ext66 import _ring_audit_one

    ccw_square = np.array([(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0),
                           (0.0, 0.0)])
    o, c, z, ls = _ring_audit_one(ccw_square)
    assert (o, c, z) == (1, True, 0)
    assert ls == 16.0  # four edges of squared length 4

    cw_l = np.array([(0.0, 0.0), (0.0, 4.0), (1.0, 4.0), (1.0, 1.0),
                     (4.0, 1.0), (4.0, 0.0), (0.0, 0.0)])
    o2, c2, _, _ = _ring_audit_one(cw_l)
    assert o2 == -1 and c2 is False

    degenerate = np.array([(0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (0.0, 0.0)])
    o3, _, _, _ = _ring_audit_one(degenerate)
    assert o3 == 0


def test_pmi_matches_oracle(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext66 import (
        SQL_PMI_BIGRAMS, q_pmi_bigrams,
    )

    d = q_pmi_bigrams(SF).to_pandas()
    o = con.execute(SQL_PMI_BIGRAMS).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_pmi_rational_semantics(ray_session):
    """pmi_num/pmi_den reproduces the float PMI definition; counts are
    consistent (c_ab <= min(c_a, c_b))."""
    from polylabel_rs_ray.pipelines.queries_ext66 import (
        PMI_MIN_COUNT, q_pmi_bigrams,
    )

    d = q_pmi_bigrams(SF).to_pandas()
    assert (d["c_ab"] >= PMI_MIN_COUNT).all()
    assert (d["c_ab"] <= d[["c_a", "c_b"]].min(axis=1)).all()
    # spot-check the rational against the definition on one row
    row = d.sort_values("bigram").iloc[0]
    n_tok_sq = row["pmi_num"] // row["c_ab"]
    pmi = math.log(row["pmi_num"] / row["pmi_den"])
    direct = math.log(
        (row["c_ab"] * n_tok_sq) / (row["pmi_den"]))
    assert pmi == pytest.approx(direct)
