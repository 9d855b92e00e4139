"""Extension batch 123: Kruskal-Wallis rank sums + session bounce rates."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_kruskal_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext123 import (
        SQL_KRUSKAL_RANK_SUMS, q_kruskal_rank_sums,
    )

    d = q_kruskal_rank_sums(SF).to_pandas()
    o = con.execute(SQL_KRUSKAL_RANK_SUMS).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_kruskal_rank_identities(ray_session):
    """Σ ranks over all groups = N(N+1)/2 (so Σ ranksum2 = N(N+1)),
    and a scipy-free brute twin via numpy average ranks."""
    from polylabel_rs_ray.pipelines.queries_ext123 import q_kruskal_rank_sums

    d = q_kruskal_rank_sums(SF).to_pandas()
    N = int(d["n"].sum())
    assert int(d["ranksum2"].sum()) == N * (N + 1)

    import pandas as pd
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    cents = np.round(ev["value"].to_numpy() * 100.0).astype(np.int64)
    # average ranks via double argsort-free tie fold
    order = np.argsort(cents, kind="stable")
    sorted_c = cents[order]
    ranks2 = np.empty(len(cents), dtype=np.int64)
    i = 0
    while i < len(sorted_c):
        j = i
        while j < len(sorted_c) and sorted_c[j] == sorted_c[i]:
            j += 1
        ranks2[order[i:j]] = (i + 1) + j  # 2·avg of (i+1..j) 1-based
        i = j
    got = d.set_index("event_type")["ranksum2"]
    for et, grp in ev.groupby("event_type"):
        assert got[et] == int(ranks2[grp.index.to_numpy()].sum())


def test_bounce_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext123 import (
        SQL_SESSION_BOUNCE_RATE, q_session_bounce_rate,
    )

    d = q_session_bounce_rate(SF).to_pandas()
    o = con.execute(SQL_SESSION_BOUNCE_RATE).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_bounce_consistent_with_sessionize(ray_session):
    """Total sessions/events must reconcile with the sessionize operator
    (same 30-min gap rule), and bounces never exceed sessions."""
    from polylabel_rs_ray.pipelines.queries import q_sessionize
    from polylabel_rs_ray.pipelines.queries_ext123 import (
        q_session_bounce_rate,
    )

    d = q_session_bounce_rate(SF).to_pandas()
    s = q_sessionize(SF).to_pandas()
    assert int(d["n_sessions"].sum()) == len(s)
    assert int(d["n_events"].sum()) == int(s["n_events"].sum())
    assert (d["n_bounce"] <= d["n_sessions"]).all()
    assert int(d["n_bounce"].sum()) == int((s["n_events"] == 1).sum())
