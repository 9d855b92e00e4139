"""Extension batch 158: tile visibility + reciprocal rank fusion."""

import duckdb
import numpy as np
import pytest
from fractions import Fraction

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "lineitem"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_visibility_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext158 import (
        _sql_tile_visibility, q_tile_visibility,
    )

    d = q_tile_visibility(SF).to_pandas()
    o = con.execute(_sql_tile_visibility()).df()
    assert len(d) == len(o) == 1024
    assert _norm(d).equals(_norm(o))


def test_visibility_invariants(ray_session):
    """Source sees itself and its 8 neighbors; a scalar shapely-free
    segment/box recheck over a random sample of targets agrees."""
    from polylabel_rs_ray.pipelines.queries_ext156 import _lattice
    from polylabel_rs_ray.pipelines.queries_ext158 import q_tile_visibility

    d = q_tile_visibility(SF).to_pandas()
    lat = _lattice(SF)
    n = lat.shape[0]
    ox, oy = np.nonzero(lat > 0)
    cnt = lat[ox, oy]
    order = np.lexsort((oy, ox, -cnt))
    sx, sy = int(ox[order[0]]), int(oy[order[0]])
    vis = np.zeros((n, n), dtype=np.int64)
    vis[d["ix"].to_numpy(), d["iy"].to_numpy()] = d["visible"].to_numpy()
    assert vis[sx, sy] == 1
    # the 4 side-adjacent neighbors are always visible (no square can
    # overlap the open unit segment between side-adjacent centers);
    # DIAGONAL neighbors may legitimately be blocked by a corner touch
    # of an adjacent occupied square (closed-square semantics).
    for ax, ay in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        x, y = sx + ax, sy + ay
        if 0 <= x < n and 0 <= y < n:
            assert vis[x, y] == 1
    # scalar recheck on a deterministic sample
    occ = {(int(a), int(b)) for a, b in zip(ox, oy)}

    def seg_box_hit(S, T, B):
        (sx2, sy2), (tx2, ty2), (bx2, by2) = S, T, B
        lox, hix = min(sx2, tx2), max(sx2, tx2)
        loy, hiy = min(sy2, ty2), max(sy2, ty2)
        if max(lox, bx2 - 1) > min(hix, bx2 + 1):
            return False
        if max(loy, by2 - 1) > min(hiy, by2 + 1):
            return False
        dx, dy = tx2 - sx2, ty2 - sy2
        fs = [dx * (by2 + eps_y - sy2) - dy * (bx2 + eps_x - sx2)
              for eps_x in (-1, 1) for eps_y in (-1, 1)]
        return min(fs) <= 0 <= max(fs)

    rng = np.random.default_rng(158)
    for tx, ty in rng.integers(0, n, size=(200, 2)):
        S, T = (2 * sx, 2 * sy), (2 * int(tx), 2 * int(ty))
        blocked = any(
            seg_box_hit(S, T, (2 * bx, 2 * by))
            for bx, by in occ
            if (bx, by) != (sx, sy) and (bx, by) != (int(tx), int(ty)))
        assert vis[tx, ty] == (0 if blocked else 1), (tx, ty)


def test_rrf_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext158 import (
        _sql_rrf_fusion, q_rrf_fusion,
    )

    d = q_rrf_fusion(SF).to_pandas()
    o = con.execute(_sql_rrf_fusion()).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_rrf_exact_fraction_ordering(ray_session, con):
    """The emitted top-N really is the top-N under exact Fraction order,
    and num/den reproduce 1/(60+r1)+1/(60+r2)."""
    from polylabel_rs_ray.pipelines.queries_ext158 import (
        RRF_K, RRF_TOPN, q_rrf_fusion,
    )

    d = q_rrf_fusion(SF).to_pandas()
    full = con.execute("""
        SELECT l_partkey AS p,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS rev,
               SUM(CAST(l_quantity AS BIGINT)) AS qty
        FROM lineitem GROUP BY 1
    """).df()
    p = full["p"].to_numpy().astype(np.int64)
    rev = full["rev"].to_numpy().astype(np.int64)
    qty = full["qty"].to_numpy().astype(np.int64)
    r_rev = np.empty(len(p), dtype=np.int64)
    r_rev[np.lexsort((p, -rev))] = np.arange(1, len(p) + 1)
    r_qty = np.empty(len(p), dtype=np.int64)
    r_qty[np.lexsort((p, -qty))] = np.arange(1, len(p) + 1)
    fr = [Fraction(1, RRF_K + int(a)) + Fraction(1, RRF_K + int(b))
          for a, b in zip(r_rev, r_qty)]
    order = sorted(range(len(p)), key=lambda i: (-fr[i], int(p[i])))
    expect = [int(p[i]) for i in order[:RRF_TOPN]]
    assert list(d["p_partkey"]) == sorted(
        list(d["p_partkey"]),
        key=lambda v: expect.index(v)) or set(d["p_partkey"]) == set(expect)
    assert set(d["p_partkey"]) == set(expect)
    for row in d.itertuples():
        i = int(np.nonzero(p == row.p_partkey)[0][0])
        assert Fraction(int(row.rrf_num), int(row.rrf_den)) == fr[i]
