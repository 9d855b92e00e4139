"""Extension batch 172: geodesic Voronoi + greedy bigram decode."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents",):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_voronoi_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext172 import (
        _sql_tile_geodesic_voronoi, q_tile_geodesic_voronoi,
    )

    d = q_tile_geodesic_voronoi(SF).to_pandas()
    o = con.execute(_sql_tile_geodesic_voronoi()).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))
    assert d["vor_src"].nunique() >= 3  # a real partition (plus -1 maybe)


def test_voronoi_properties(ray_session):
    """Each source is its own site at distance 0; every assigned cell's
    distance equals its BFS distance to the claimed source and no other
    source is strictly closer (ties only to larger ranks)."""
    from collections import deque

    from polylabel_rs_ray.pipelines.queries_ext159 import _lattice_res
    from polylabel_rs_ray.pipelines.queries_ext172 import (
        N_SOURCES, VOR_RES, q_tile_geodesic_voronoi,
    )

    d = q_tile_geodesic_voronoi(SF).to_pandas()
    lat = _lattice_res(SF, VOR_RES)
    occ = lat > 0
    n = lat.shape[0]
    ox, oy = np.nonzero(occ)
    cnt = lat[ox, oy]
    order = np.lexsort((oy, ox, -cnt))
    srcs = [(int(ox[order[k]]), int(oy[order[k]]))
            for k in range(N_SOURCES)]

    def bfs(s):
        dist = {s: 0}
        dq = deque([s])
        while dq:
            x, y = dq.popleft()
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                u, v = x + dx, y + dy
                if 0 <= u < n and 0 <= v < n and occ[u, v] \
                        and (u, v) not in dist:
                    dist[(u, v)] = dist[(x, y)] + 1
                    dq.append((u, v))
        return dist

    fields = [bfs(s) for s in srcs]
    for r in d.itertuples():
        cell = (int(r.ix), int(r.iy))
        ds = [f.get(cell) for f in fields]
        if all(x is None for x in ds):
            assert (r.vor_src, r.vor_dist) == (-1, -1)
            continue
        best = min((x, k) for k, x in enumerate(ds) if x is not None)
        assert (int(r.vor_src), int(r.vor_dist)) == (best[1], best[0])
    for k, s in enumerate(srcs):
        row = d[(d["ix"] == s[0]) & (d["iy"] == s[1])].iloc[0]
        assert int(row["vor_dist"]) == 0


def test_decode_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext172 import (
        _sql_greedy_bigram_decode, q_greedy_bigram_decode,
    )

    d = q_greedy_bigram_decode(SF).to_pandas()
    o = con.execute(_sql_greedy_bigram_decode()).df()
    assert len(d) == len(o) > 1
    assert _norm(d).equals(_norm(o))


def test_decode_scalar_twin(ray_session, con):
    """Pure-Python bigram model + greedy walk; chain continuity and the
    argmax property per step."""
    from collections import Counter

    from polylabel_rs_ray.pipelines.queries_ext172 import (
        BOS, DECODE_CAP, EOS, q_greedy_bigram_decode,
    )

    d = q_greedy_bigram_decode(SF).to_pandas().sort_values("step")
    texts = con.execute("SELECT text FROM documents").df()["text"]
    bg = Counter()
    for t in texts:
        ws = t.split(" ")
        bg[(BOS, ws[0])] += 1
        for a, b in zip(ws, ws[1:]):
            bg[(a, b)] += 1
        bg[(ws[-1], EOS)] += 1
    cur = BOS
    want = []
    for step in range(1, DECODE_CAP + 1):
        if cur == EOS:
            break
        cands = [(w, c) for (s, w), c in bg.items() if s == cur]
        if not cands:
            break
        w, c = sorted(cands, key=lambda kv: (-kv[1], kv[0]))[0]
        want.append((step, cur, w, c))
        cur = w
    got = [(int(r.step), r.src_w, r.dst_w, int(r.n))
           for r in d.itertuples()]
    assert got == want
    # chain continuity
    for a, b in zip(got, got[1:]):
        assert a[2] == b[1]
    assert got[0][1] == BOS
