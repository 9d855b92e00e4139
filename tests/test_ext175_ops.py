"""Extension batch 175: SFE code lengths + rank-biased overlap."""

from fractions import Fraction

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "part"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_sfe_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext175 import (
        SQL_SFE_CODE_LENGTHS, q_sfe_code_lengths,
    )

    d = q_sfe_code_lengths(SF).to_pandas()
    o = con.execute(SQL_SFE_CODE_LENGTHS).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))
    assert d["code_len"].nunique() > 1  # frequencies actually differ


def test_sfe_kraft_and_definition(ray_session):
    """Exact big-int Kraft inequality Σ2^-L ≤ 1, the defining shift
    inequality c·2^(L-1) ≥ N > c·2^(L-2), and math.log2 spot agreement."""
    from math import ceil, log2

    from polylabel_rs_ray.pipelines.queries_ext175 import (
        q_sfe_code_lengths,
    )

    d = q_sfe_code_lengths(SF).to_pandas()
    N = int(d["freq"].sum())
    kraft = sum(Fraction(1, 2 ** int(L)) for L in d["code_len"])
    assert kraft <= 1
    for r in d.itertuples():
        c, L = int(r.freq), int(r.code_len)
        t = L - 1
        assert c * (1 << t) >= N
        if t > 0:
            assert c * (1 << (t - 1)) < N
        # definitional cross-check (floats fine as a spot check)
        assert L == ceil(log2(N / c)) + 1 or c == N
        assert int(r.cost_bits) == c * L


def test_rbo_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext175 import (
        SQL_RANK_BIASED_OVERLAP, q_rank_biased_overlap,
    )

    d = q_rank_biased_overlap(SF).to_pandas()
    o = con.execute(SQL_RANK_BIASED_OVERLAP).df()
    assert len(d) == len(o) == 20
    assert _norm(d).equals(_norm(o))


def test_rbo_properties(ray_session, con):
    """Overlap is monotone with |Δ| ≤ 1 per depth; terms replay from
    overlaps exactly; the descaled total is a valid RBO in [0, 1] and
    equals the Fraction recomputation from scratch rankings."""
    from polylabel_rs_ray.pipelines.queries_ext175 import (
        RBO_DEPTH, RBO_LCM, q_rank_biased_overlap,
    )

    d = q_rank_biased_overlap(SF).to_pandas().sort_values("d")
    ov = d["overlap_d"].to_numpy()
    assert (np.diff(ov) >= 0).all() and (np.diff(ov) <= 2).all()
    assert ov[0] in (0, 1)
    for r in d.itertuples():
        assert int(r.term_scaled) == (RBO_LCM // int(r.d)) * \
            (1 << (RBO_DEPTH - int(r.d))) * int(r.overlap_d)
    ra = [x[0] for x in con.execute("""
        SELECT p_partkey FROM part
        ORDER BY CAST(ROUND(p_retailprice*100) AS BIGINT) DESC, p_partkey
        LIMIT 20""").fetchall()]
    rb = [x[0] for x in con.execute("""
        SELECT p_partkey FROM part
        ORDER BY p_size DESC, p_partkey LIMIT 20""").fetchall()]
    rbo = sum(Fraction(len(set(ra[:k]) & set(rb[:k])), k * 2 ** k)
              for k in range(1, RBO_DEPTH + 1))
    scaled_total = int(d["term_scaled"].sum())
    assert Fraction(scaled_total, RBO_LCM * 2 ** RBO_DEPTH) == rbo
    assert 0 <= rbo <= 1
