"""Extension batch 198: continued fractions + Collatz profile."""

from fractions import Fraction

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders",):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_cf_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext198 import (
        SQL_CONTINUED_FRACTION_COEFFS, q_continued_fraction_coeffs,
    )

    d = q_continued_fraction_coeffs(SF).to_pandas()
    o = con.execute(SQL_CONTINUED_FRACTION_COEFFS).df()
    assert len(d) == len(o) > 1
    assert _norm(d).equals(_norm(o))


def test_cf_reconstructs_fraction(ray_session):
    """The convergents telescope back to exactly p_num/p_den, and every
    coefficient after a0 is >= 1 (canonical expansion)."""
    from polylabel_rs_ray.pipelines.queries_ext195 import (
        q_interarrival_geometric_mle,
    )
    from polylabel_rs_ray.pipelines.queries_ext198 import (
        q_continued_fraction_coeffs,
    )

    d = q_continued_fraction_coeffs(SF).to_pandas().sort_values("step")
    mle = q_interarrival_geometric_mle(SF).to_pandas().iloc[0]
    coeffs = d["coeff"].astype(int).tolist()
    assert all(c >= 1 for c in coeffs[1:])
    val = Fraction(coeffs[-1])
    for c in reversed(coeffs[:-1]):
        val = c + 1 / val
    assert val == Fraction(int(mle["p_num"]), int(mle["p_den"]))


def test_collatz_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext198 import (
        SQL_COLLATZ_RESIDUE_PROFILE, q_collatz_residue_profile,
    )

    d = q_collatz_residue_profile(SF).to_pandas()
    o = con.execute(SQL_COLLATZ_RESIDUE_PROFILE).df()
    assert len(d) == len(o) > 900
    assert _norm(d).equals(_norm(o))


def test_collatz_known_values(ray_session):
    """Textbook stopping times and peaks: 27 takes 111 steps with max
    9232; 1 takes 0; powers of two are pure halving chains."""
    from polylabel_rs_ray.pipelines.queries_ext198 import (
        q_collatz_residue_profile,
    )

    d = q_collatz_residue_profile(SF).to_pandas().set_index("start")
    if 27 in d.index:
        assert int(d.loc[27, "n_steps"]) == 111
        assert int(d.loc[27, "max_val"]) == 9232
    if 1 in d.index:
        assert int(d.loc[1, "n_steps"]) == 0
        assert int(d.loc[1, "max_val"]) == 1
    for p in (2, 4, 8, 16, 32, 64, 128, 256, 512):
        if p in d.index:
            assert int(d.loc[p, "n_steps"]) == int(np.log2(p))
            assert int(d.loc[p, "max_val"]) == p
    # scalar twin on a sample
    for start in list(d.index)[:25]:
        cur, steps, peak = int(start), 0, int(start)
        while cur != 1:
            cur = 3 * cur + 1 if cur % 2 else cur // 2
            steps += 1
            peak = max(peak, cur)
        assert int(d.loc[start, "n_steps"]) == steps
        assert int(d.loc[start, "max_val"]) == peak
