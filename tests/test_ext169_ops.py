"""Extension batch 169: geodesic tile distance + KWIC context matrix."""

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


def test_geodesic_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext169 import (
        _sql_tile_geodesic_dist, q_tile_geodesic_dist,
    )

    d = q_tile_geodesic_dist(SF).to_pandas()
    o = con.execute(_sql_tile_geodesic_dist()).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))
    assert (d["geo_dist"] == -1).any()      # other components exercised
    assert int(d["geo_dist"].max()) >= 5    # non-trivial depths (maxd 7)


def test_geodesic_dijkstra_twin(ray_session):
    """Independent heap-based Dijkstra (unit weights) over the same
    lattice, plus consistency with the component partition (reachable
    iff same component as the source) and the 1-Lipschitz property
    along occupied adjacency."""
    import heapq

    from polylabel_rs_ray.pipelines.queries_ext159 import _lattice_res
    from polylabel_rs_ray.pipelines.queries_ext169 import (
        GEO_RES, q_tile_geodesic_dist,
    )

    d = q_tile_geodesic_dist(SF).to_pandas()
    lat = _lattice_res(SF, GEO_RES)
    occ = lat > 0
    n = lat.shape[0]
    ox, oy = np.nonzero(occ)
    cnt = lat[ox, oy]
    order = np.lexsort((oy, ox, -cnt))
    sx, sy = int(ox[order[0]]), int(oy[order[0]])
    dist = {}
    pq = [(0, sx, sy)]
    while pq:
        dd, x, y = heapq.heappop(pq)
        if (x, y) in dist:
            continue
        dist[(x, y)] = dd
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            u, v = x + dx, y + dy
            if 0 <= u < n and 0 <= v < n and occ[u, v] \
                    and (u, v) not in dist:
                heapq.heappush(pq, (dd + 1, u, v))
    got = {(int(r.ix), int(r.iy)): int(r.geo_dist) for r in d.itertuples()}
    for (x, y), g in got.items():
        assert g == dist.get((x, y), -1), (x, y)
    # Lipschitz along occupied adjacency among reachable cells
    for (x, y), g in got.items():
        if g < 0:
            continue
        for dx, dy in ((1, 0), (0, 1)):
            nb = (x + dx, y + dy)
            if nb in got and got[nb] >= 0:
                assert abs(got[nb] - g) <= 1


def test_kwic_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext169 import (
        SQL_KWIC_CONTEXT_MATRIX, q_kwic_context_matrix,
    )

    d = q_kwic_context_matrix(SF).to_pandas()
    o = con.execute(SQL_KWIC_CONTEXT_MATRIX).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_kwic_scalar_twin(ray_session, con):
    """Pure-Python concordance over the raw texts: same target choice,
    same context counts, and total mass == target occurrences."""
    from collections import Counter

    from polylabel_rs_ray.pipelines.queries_ext169 import (
        BOS, EOS, q_kwic_context_matrix,
    )

    d = q_kwic_context_matrix(SF).to_pandas()
    texts = con.execute("SELECT text FROM documents").df()["text"]
    freq = Counter()
    for t in texts:
        freq.update(t.split(" "))
    target = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    assert set(d["target"]) == {target}
    want = Counter()
    occurrences = 0
    for t in texts:
        ws = t.split(" ")
        for i, w in enumerate(ws):
            if w == target:
                occurrences += 1
                p = ws[i - 1] if i > 0 else BOS
                nx = ws[i + 1] if i < len(ws) - 1 else EOS
                want[(p, nx)] += 1
    got = {(r.prev_word, r.next_word): int(r.n) for r in d.itertuples()}
    assert got == dict(want)
    assert int(d["n"].sum()) == occurrences == freq[target]
