"""Extension batch 121: PIP probe-grid audit + Elias code spectrum."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_pip_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext121 import (
        _sql_pip_grid_audit, q_pip_grid_audit,
    )

    d = q_pip_grid_audit(SF).to_pandas()
    o = con.execute(_sql_pip_grid_audit()).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_pip_known_shapes(ray_session):
    """Degenerate (zero-area) fixtures classify every probe outside;
    the convex square_with_hole exterior is a plain square so a probe
    is inside the EXTERIOR iff strictly within (0, W)x(0, H) — which
    all 8 probes are; mask popcount equals inside_n everywhere."""
    from polylabel_rs_ray.pipelines.queries_ext121 import q_pip_grid_audit
    from polylabel_rs_ray.sources.fixtures import FIXTURE_CYCLE

    d = q_pip_grid_audit(SF).to_pandas()
    assert (d["inside_n"] == d["inside_mask"].map(
        lambda m: bin(int(m)).count("1"))).all()
    for name in ("degenerate_collinear", "degenerate_spike"):
        g = d[d["fixture_idx"] == FIXTURE_CYCLE.index(name)]
        assert (g["inside_mask"] == 0).all()
    sq = d[d["fixture_idx"] == FIXTURE_CYCLE.index("square_with_hole")]
    assert (sq["inside_n"] == 8).all()
    # brute twin on l_shape: probe inside iff (x<=W/4 or y<=H/4 scaled
    # region arithmetic) — evaluate directly in exact integers
    l = d[d["fixture_idx"] == FIXTURE_CYCLE.index("l_shape")]
    # l_shape normalized: [0,4]x[0,1] U [0,1]x[1,4]; scale 16: W=64,H=64
    expect_mask = 0
    expect_n = 0
    for k in range(8):
        X = (2 * k + 1) * 64 // 16
        Y = ((5 * k + 3) % 16) * 64 // 16
        inside = (0 < X < 64 and 0 < Y < 16) or (0 < X < 16 and 0 < Y < 64)
        if inside:
            expect_mask |= 1 << k
            expect_n += 1
    assert (l["inside_mask"] == expect_mask).all()
    assert (l["inside_n"] == expect_n).all()


def test_elias_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext121 import (
        SQL_ELIAS_CODE_SPECTRUM, q_elias_code_spectrum,
    )

    d = q_elias_code_spectrum(SF).to_pandas()
    o = con.execute(SQL_ELIAS_CODE_SPECTRUM).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_elias_identities(ray_session, con):
    """Per-bucket code-length identities and the partition-invariance of
    the distributed delta machinery (n_parts=1 == n_parts=8)."""
    from polylabel_rs_ray.pipelines.queries_ext121 import (
        q_elias_code_spectrum,
    )

    d = q_elias_code_spectrum(SF).to_pandas().sort_values("bitlen")
    b = d["bitlen"].to_numpy()
    n = d["n_deltas"].to_numpy()
    assert (d["gamma_bits"].to_numpy() == (2 * b - 1) * n).all()
    blb = np.array([int(x).bit_length() for x in b])
    assert (d["delta_bits"].to_numpy() == (b - 1 + 2 * blb - 1) * n).all()
    # total deltas = events - users (one gapless head per user)
    tot = con.execute("""
        SELECT COUNT(*) - COUNT(DISTINCT user_id) FROM events
    """).fetchone()[0]
    assert int(n.sum()) == tot
    d1 = q_elias_code_spectrum(SF, n_parts=1).to_pandas().sort_values("bitlen")
    d8 = q_elias_code_spectrum(SF, n_parts=8).to_pandas().sort_values("bitlen")
    assert _norm(d1).equals(_norm(d8))
