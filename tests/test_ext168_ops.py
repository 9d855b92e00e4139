"""Extension batch 168: Hodges-Lehmann pair median + Wilcoxon signed rank."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_hl_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext168 import (
        SQL_HODGES_LEHMANN_REVENUE, q_hodges_lehmann_revenue,
    )

    d = q_hodges_lehmann_revenue(SF).to_pandas()
    o = con.execute(SQL_HODGES_LEHMANN_REVENUE).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_hl_vs_materialized_pairs(ray_session, con):
    """Brute-force: materialize every Walsh sum in numpy and take the
    doubled interpolated median directly."""
    from polylabel_rs_ray.pipelines.queries_ext168 import (
        q_hodges_lehmann_revenue,
    )

    d = q_hodges_lehmann_revenue(SF).to_pandas().iloc[0]
    daily = con.execute("""
        SELECT SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) cents
        FROM orders GROUP BY CAST(o_orderdate AS DATE)""").df()
    c = daily["cents"].to_numpy().astype(np.int64)
    D = len(c)
    sums = (c[:, None] + c[None, :])[np.triu_indices(D, k=0)]
    sums.sort()
    m = len(sums)
    assert int(d["n_days"]) == D
    assert int(d["n_pairs"]) == m == D * (D + 1) // 2
    want = int(sums[(m + 1) // 2 - 1]) + int(sums[m // 2])
    assert int(d["med2w"]) == want


def test_kth_pair_sum_selection_unit():
    """The implicit-selection helper against sorted materialized sums on
    deterministic small vectors, every k."""
    from polylabel_rs_ray.pipelines.queries_ext168 import _kth_pair_sum

    rng = np.random.default_rng(3)
    for trial in range(20):
        c = np.sort(rng.integers(-50, 50, size=rng.integers(1, 30)))
        D = len(c)
        sums = np.sort((c[:, None] + c[None, :])[np.triu_indices(D, k=0)])
        for k in range(1, len(sums) + 1):
            assert _kth_pair_sum(c, k) == int(sums[k - 1]), (trial, k)


def test_wilcoxon_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext168 import (
        SQL_WILCOXON_SIGNED_RANK_WEEKEND, q_wilcoxon_signed_rank_weekend,
    )

    d = q_wilcoxon_signed_rank_weekend(SF).to_pandas()
    o = con.execute(SQL_WILCOXON_SIGNED_RANK_WEEKEND).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))
    row = d.iloc[0]
    n = int(row["n_used"])
    assert n > 0
    # rank-mass identity: W+ + W- covers all doubled ranks
    assert int(row["w_plus2"]) + int(row["w_minus2"]) == n * (n + 1)


def test_wilcoxon_scalar_twin(ray_session, con):
    """Per-user recomputation from scratch: the contract's paired
    difference is the CROSS-MULTIPLIED d_u = se*nw - sw*ne (sign equals
    the mean difference's, checked here with Fractions; magnitudes are
    the scaled integers, which is what both engine and oracle rank)."""
    from fractions import Fraction

    from polylabel_rs_ray.pipelines.queries_ext168 import (
        WEEKEND_MODS, q_wilcoxon_signed_rank_weekend,
    )

    d = q_wilcoxon_signed_rank_weekend(SF).to_pandas().iloc[0]
    raw = con.execute("""
        SELECT user_id, epoch_us(ts) // 86400000000 AS day,
               CAST(ROUND(value*100) AS BIGINT) AS cents
        FROM events""").df()
    diffs = []
    for uid, grp in raw.groupby("user_id"):
        wk = grp["day"].to_numpy() % 7
        is_wk = np.isin(wk, WEEKEND_MODS)
        if is_wk.all() or (~is_wk).all():
            continue
        se, ne = int(grp["cents"][is_wk].sum()), int(is_wk.sum())
        sw, nw = int(grp["cents"][~is_wk].sum()), int((~is_wk).sum())
        du = se * nw - sw * ne
        if du != 0:
            # sign-of-mean-difference identity
            assert (du > 0) == (Fraction(se, ne) > Fraction(sw, nw))
            diffs.append(du)
    n = len(diffs)
    assert int(d["n_used"]) == n
    absd = sorted(abs(x) for x in diffs)
    wp = wm = 0
    for x in diffs:
        lo = absd.index(abs(x)) + 1
        hi = n - absd[::-1].index(abs(x))
        if x > 0:
            wp += lo + hi
        else:
            wm += lo + hi
    assert int(d["w_plus2"]) == wp
    assert int(d["w_minus2"]) == wm
