"""Extension batch 91: rank concordance + rectilinearity."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "customer", "documents"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_concordance_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext91 import (
        SQL_NATION_RANK_CONCORDANCE, q_nation_rank_concordance,
    )

    d = q_nation_rank_concordance(SF)
    o = con.execute(SQL_NATION_RANK_CONCORDANCE).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_concordance_identities(ray_session):
    """Concordant + discordant = C(n,2) (dense ranks, no rank ties);
    footrule is even and bounded by n^2/2."""
    from polylabel_rs_ray.pipelines.queries_ext91 import (
        q_nation_rank_concordance,
    )

    d = q_nation_rank_concordance(SF).iloc[0]
    n = int(d["n_nations"])
    assert d["n_concordant"] + d["n_discordant"] == n * (n - 1) // 2
    assert int(d["footrule"]) % 2 == 0  # permutation displacement parity
    assert 0 <= d["footrule"] <= n * n // 2


def test_rectilinearity_matches_oracle(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext91 import (
        _sql_rectilinearity_stats, q_rectilinearity_stats,
    )

    d = q_rectilinearity_stats(SF).to_pandas()
    o = con.execute(_sql_rectilinearity_stats()).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_rectilinearity_known_shapes():
    from polylabel_rs_ray.pipelines.queries_ext91 import (
        _rectilinearity, _twin_rectilinearity,
    )
    from polylabel_rs_ray.pipelines.queries_ext import _norm_exterior
    from polylabel_rs_ray.sources.fixtures import DYADIC_FIXTURES, FIXTURES

    # axis-aligned L-shape: rectilinearity exactly 1
    lshape = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (1.0, 1.0),
                       (1.0, 4.0), (0.0, 4.0), (0.0, 0.0)])
    num, den = _rectilinearity(lshape)
    assert num == den > 0
    # diamond: no axis-aligned edges at all
    diamond = np.array([(1.0, 0.0), (2.0, 1.0), (1.0, 2.0), (0.0, 1.0),
                        (1.0, 0.0)])
    num, den = _rectilinearity(diamond)
    assert num == 0.0 and den == 8.0
    # engine == twin across fixtures
    for name in DYADIC_FIXTURES:
        ext = _norm_exterior(
            [np.asarray(r, dtype=np.float64) for r in FIXTURES[name].rings])
        assert _rectilinearity(ext) == _twin_rectilinearity(ext), name
