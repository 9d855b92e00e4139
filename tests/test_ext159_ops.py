"""Extension batch 159: enclosed holes + activity selection."""

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


def test_enclosed_holes_match_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext159 import (
        _sql_tile_enclosed_holes, q_tile_enclosed_holes,
    )

    d = q_tile_enclosed_holes(SF).to_pandas()
    o = con.execute(_sql_tile_enclosed_holes()).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))
    # non-trivial on this corpus: at least one genuine hole
    assert int(d["enclosed"].sum()) >= 1


def test_enclosed_holes_invariants(ray_session):
    """Every enclosed cell's 4 neighbors are in-bounds and each is either
    occupied or itself enclosed (a hole's boundary cannot leak); boundary
    cells are never enclosed."""
    from polylabel_rs_ray.pipelines.queries_ext159 import (
        HOLE_RES, _lattice_res, q_tile_enclosed_holes,
    )

    d = q_tile_enclosed_holes(SF).to_pandas()
    lat = _lattice_res(SF, HOLE_RES)
    n = lat.shape[0]
    enc = {(int(r.ix), int(r.iy)) for r in d.itertuples() if r.enclosed}
    occ = {(x, y) for x, y in zip(*np.nonzero(lat > 0))}
    for x, y in enc:
        assert 0 < x < n - 1 and 0 < y < n - 1
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = (x + dx, y + dy)
            assert nb in occ or nb in enc, (x, y, nb)
    # empty rows are exactly the complement of occ
    assert len(d) + len(occ) == n * n


def test_activity_selection_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext159 import (
        SQL_ACTIVITY_SELECTION, q_activity_selection,
    )

    d = q_activity_selection(SF).to_pandas()
    o = con.execute(SQL_ACTIVITY_SELECTION).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_activity_selection_vs_dp_optimum(ray_session, con):
    """The greedy count must equal the true optimum from an independent
    predecessor DP (classic interval scheduling), per user."""
    from polylabel_rs_ray.pipelines.queries_ext159 import (
        DUR_US, q_activity_selection,
    )

    d = q_activity_selection(SF).to_pandas().set_index("user_id")
    raw = con.execute(
        "SELECT user_id, epoch_us(ts) AS s, event_id FROM events").df()
    for uid, grp in raw.groupby("user_id"):
        s = grp["s"].to_numpy().astype(np.int64)
        e = s + DUR_US * (1 + grp["event_id"].to_numpy().astype(np.int64) % 10)
        order = np.argsort(e, kind="stable")
        s, e = s[order], e[order]
        m = len(s)
        # dp[i] = best using intervals 0..i-1 (sorted by end)
        dp = np.zeros(m + 1, dtype=np.int64)
        for i in range(1, m + 1):
            # predecessor: last j with e[j-1] <= s[i-1]
            j = int(np.searchsorted(e, s[i - 1], side="right"))
            dp[i] = max(dp[i - 1], 1 + dp[min(j, i - 1)])
        assert d.loc[uid, "max_nonoverlap"] == dp[m], uid
        assert d.loc[uid, "n_events"] == m
