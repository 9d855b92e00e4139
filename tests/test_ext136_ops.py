"""Extension batch 136: day rank in month + Mood's median test."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "supplier", "customer"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_rank_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext136 import (
        SQL_DAY_RANK_IN_MONTH, q_day_rank_in_month,
    )

    d = q_day_rank_in_month(SF).to_pandas()
    o = con.execute(SQL_DAY_RANK_IN_MONTH).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_rank_properties(ray_session):
    """Per month: exactly one rank-1 group (the max), ranks within
    [1, month size], and the competition-rank identity rank(d) =
    1 + #strictly greater."""
    from polylabel_rs_ray.pipelines.queries_ext136 import (
        q_day_rank_in_month,
    )

    d = q_day_rank_in_month(SF).to_pandas()
    for m, g in d.groupby("month_idx"):
        r = g["rev_rank"].to_numpy()
        rev = g["rev_cents"].to_numpy()
        assert r.min() == 1
        assert (r <= len(g)).all()
        expect = 1 + (rev[None, :] > rev[:, None]).sum(axis=1)
        assert (np.sort(r) == np.sort(expect)).all()
        assert (g.loc[g["rev_rank"] == 1, "rev_cents"]
                == rev.max()).all()


def test_moods_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext136 import (
        SQL_MOODS_MEDIAN_TEST, q_moods_median_test,
    )

    d = q_moods_median_test(SF).to_pandas()
    o = con.execute(SQL_MOODS_MEDIAN_TEST).df()
    assert len(d) == len(o) == 2
    assert _norm(d).equals(_norm(o))


def test_moods_pooled_median_property(ray_session, con):
    """The pooled lower median splits the pooled population so that
    #(<= median) >= ceil(N/2) and #(> median) <= floor(N/2); totals
    reconcile with the base tables."""
    from polylabel_rs_ray.pipelines.queries_ext136 import (
        q_moods_median_test,
    )

    d = q_moods_median_test(SF).to_pandas()
    ns, nc = con.execute("""
        SELECT (SELECT COUNT(*) FROM supplier),
               (SELECT COUNT(*) FROM customer)
    """).fetchone()
    tot = d.set_index("population")
    assert tot.loc["supplier", "n_above"] \
        + tot.loc["supplier", "n_not_above"] == ns
    assert tot.loc["customer", "n_above"] \
        + tot.loc["customer", "n_not_above"] == nc
    N = ns + nc
    above = int(d["n_above"].sum())
    assert above <= N // 2
    assert N - above >= (N + 1) // 2
    assert d["pooled_median_cents"].nunique() == 1
