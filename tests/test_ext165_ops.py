"""Extension batch 165: tile connected components + v-optimal histogram DP."""

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


def test_components_match_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext165 import (
        _sql_tile_components, q_tile_components,
    )

    d = q_tile_components(SF).to_pandas()
    o = con.execute(_sql_tile_components()).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))
    assert d["comp_id"].nunique() >= 2  # non-trivial partition


def test_components_bfs_twin(ray_session):
    """Independent BFS labeling over the same lattice must agree on the
    component PARTITION, canonical ids, and sizes."""
    from collections import deque

    from polylabel_rs_ray.pipelines.queries_ext159 import _lattice_res
    from polylabel_rs_ray.pipelines.queries_ext165 import (
        COMP_RES, q_tile_components,
    )

    d = q_tile_components(SF).to_pandas()
    lat = _lattice_res(SF, COMP_RES)
    occ = lat > 0
    n = lat.shape[0]
    comp = -np.ones(lat.shape, dtype=np.int64)
    for sx in range(n):
        for sy in range(n):
            if occ[sx, sy] and comp[sx, sy] < 0:
                members = [(sx, sy)]
                comp[sx, sy] = 0
                dq = deque([(sx, sy)])
                while dq:
                    a, b = dq.popleft()
                    for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        u, v = a + dx, b + dy
                        if 0 <= u < n and 0 <= v < n and occ[u, v] \
                                and comp[u, v] < 0:
                            comp[u, v] = 0
                            members.append((u, v))
                            dq.append((u, v))
                cid = min(x * n + y for x, y in members)
                for x, y in members:
                    comp[x, y] = cid
    got = {(int(r.ix), int(r.iy)): (int(r.comp_id), int(r.comp_size))
           for r in d.itertuples()}
    sizes = {}
    for x, y in zip(*np.nonzero(occ)):
        sizes[int(comp[x, y])] = sizes.get(int(comp[x, y]), 0) + 1
    want = {(int(x), int(y)): (int(comp[x, y]), sizes[int(comp[x, y])])
            for x, y in zip(*np.nonzero(occ))}
    assert got == want


def test_vopt_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext165 import (
        _sql_vopt_histogram_dp, q_vopt_histogram_dp,
    )

    d = q_vopt_histogram_dp(SF).to_pandas()
    o = con.execute(_sql_vopt_histogram_dp()).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_vopt_dp_properties(ray_session, con):
    """dp is non-increasing in b at fixed j; dp[1][j] equals the direct
    one-segment cost; the optimum beats 30 deterministic random valid
    partitions of the full range (upper-bound spot checks)."""
    from polylabel_rs_ray.pipelines.queries_ext165 import (
        VOPT_BUCKETS, VOPT_PREBINS, q_vopt_histogram_dp,
    )

    d = q_vopt_histogram_dp(SF).to_pandas()
    dp = {(int(r.b), int(r.j)): int(r.dp_cost) for r in d.itertuples()}
    cents = con.execute(
        "SELECT CAST(ROUND(value*100) AS BIGINT) c FROM events"
    ).df()["c"].to_numpy()
    lo, hi = int(cents.min()), int(cents.max())
    span = hi - lo + 1
    bins = (cents - lo) * VOPT_PREBINS // span

    def seg_cost(i, j):
        sel = cents[(bins >= i) & (bins <= j)]
        n, s1, s2 = len(sel), int(sel.sum()), int((sel * sel).sum())
        return n * s2 - s1 * s1

    for j in range(VOPT_PREBINS):
        assert dp[(1, j)] == seg_cost(0, j)
        for b in range(2, VOPT_BUCKETS + 1):
            if (b, j) in dp and (b - 1, j) in dp:
                assert dp[(b, j)] <= dp[(b - 1, j)]

    rng = np.random.default_rng(11)
    best = dp[(VOPT_BUCKETS, VOPT_PREBINS - 1)]
    for _ in range(30):
        cuts = np.sort(rng.choice(
            np.arange(1, VOPT_PREBINS), size=VOPT_BUCKETS - 1,
            replace=False))
        bounds = np.r_[0, cuts, VOPT_PREBINS]
        total = sum(seg_cost(int(bounds[k]), int(bounds[k + 1] - 1))
                    for k in range(VOPT_BUCKETS))
        assert best <= total
