"""Extension batch 86: Pick's theorem audit + hapax legomena stats."""

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


def test_picks_matches_oracle(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext86 import (
        _sql_picks_theorem_audit, q_picks_theorem_audit,
    )

    d = q_picks_theorem_audit(SF).to_pandas()
    o = con.execute(_sql_picks_theorem_audit()).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))
    # Pick's identity holds on at least one non-degenerate fixture
    assert d["picks_holds"].any()


def test_picks_engine_equals_twin():
    from polylabel_rs_ray.pipelines.queries_ext86 import (
        _pick_counts, _twin_pick_counts,
    )
    from polylabel_rs_ray.pipelines.queries_ext import _norm_exterior
    from polylabel_rs_ray.sources.fixtures import DYADIC_FIXTURES, FIXTURES

    for name in DYADIC_FIXTURES:
        ext = _norm_exterior(
            [np.asarray(r, dtype=np.float64) for r in FIXTURES[name].rings])
        assert _pick_counts(ext) == _twin_pick_counts(ext), name


def test_picks_known_shapes():
    from polylabel_rs_ray.pipelines.queries_ext86 import _pick_counts

    # 3x3 square: A=9, B=12, I=4 -> 9 == 4 + 6 - 1
    sq = np.array([(0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (0.0, 3.0),
                   (0.0, 0.0)])
    a, i, b, h = _pick_counts(sq)
    assert (a, i, b, h) == (9.0, 4, 12, True)
    # right triangle legs 4,3: A=6, B = 4+3+gcd(4,3)=8, I = 6-4+1 = 3
    tri = np.array([(0.0, 0.0), (4.0, 0.0), (0.0, 3.0), (0.0, 0.0)])
    a, i, b, h = _pick_counts(tri)
    assert (a, b, h) == (6.0, 8, True)
    assert i == 3
    # L-shape fixture values: A=7, edges all axis-aligned
    lshape = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (1.0, 1.0),
                       (1.0, 4.0), (0.0, 4.0), (0.0, 0.0)])
    a, i, b, h = _pick_counts(lshape)
    assert a == 7.0 and h


def test_hapax_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext86 import (
        SQL_HAPAX_STATS, q_hapax_stats,
    )

    d = q_hapax_stats(SF)
    o = con.execute(SQL_HAPAX_STATS).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_hapax_invariants(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext86 import q_hapax_stats

    d = q_hapax_stats(SF)
    assert (d["n_hapax"] <= d["n_types"]).all()
    assert (d["n_types"] <= d["n_tokens"]).all()
