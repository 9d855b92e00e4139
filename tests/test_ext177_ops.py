"""Extension batch 177: lattice Euler characteristic + bitonic length."""

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


def test_euler_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext177 import (
        _sql_lattice_euler_char, q_lattice_euler_char,
    )

    d = q_lattice_euler_char(SF).to_pandas()
    o = con.execute(_sql_lattice_euler_char()).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_euler_equals_components_minus_holes(ray_session):
    """χ = #components − #holes, both recomputed by independent BFS:
    components under 8-connectivity (closed squares touching at a
    corner share a vertex, so the complex is connected there) and
    holes under 4-connectivity of the open complement (a diagonal gap
    does NOT leak)."""
    from collections import deque

    from polylabel_rs_ray.pipelines.queries_ext159 import _lattice_res
    from polylabel_rs_ray.pipelines.queries_ext177 import (
        EULER_RES, q_lattice_euler_char,
    )

    d = q_lattice_euler_char(SF).to_pandas().iloc[0]
    lat = _lattice_res(SF, EULER_RES)
    n = lat.shape[0]
    occ = lat > 0

    def components(cells, conn8=False):
        dirs = [(1, 0), (-1, 0), (0, 1), (0, -1)]
        if conn8:
            dirs += [(1, 1), (1, -1), (-1, 1), (-1, -1)]
        seen, k = set(), 0
        for c in cells:
            if c in seen:
                continue
            k += 1
            dq = deque([c])
            seen.add(c)
            while dq:
                x, y = dq.popleft()
                for dx, dy in dirs:
                    t = (x + dx, y + dy)
                    if t in cells and t not in seen:
                        seen.add(t)
                        dq.append(t)
        return k

    on = {(int(x), int(y)) for x, y in zip(*np.nonzero(occ))}
    ncomp = components(on, conn8=True)
    # enclosed holes: empty cells not reachable from the border
    empty = {(x, y) for x in range(n) for y in range(n)
             if (x, y) not in on}
    border = {c for c in empty if c[0] in (0, n - 1) or c[1] in (0, n - 1)}
    reach = set(border)
    dq = deque(border)
    while dq:
        x, y = dq.popleft()
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            t = (x + dx, y + dy)
            if t in empty and t not in reach:
                reach.add(t)
                dq.append(t)
    holes = components(empty - reach)
    assert int(d["euler"]) == ncomp - holes
    assert int(d["n_cells"]) == len(on)
    # single-cell sanity is implied by the formula: V-E+F = 4-4+1


def test_bitonic_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext177 import (
        SQL_USER_BITONIC_LEN, q_user_bitonic_len,
    )

    d = q_user_bitonic_len(SF).to_pandas()
    o = con.execute(SQL_USER_BITONIC_LEN).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_bitonic_vs_quadratic_dp(ray_session, con):
    """O(n²) DP twin: rise[i]/fall[i] by direct maximization; also
    bitonic ≥ both the plain LIS and plain LDS."""
    from polylabel_rs_ray.pipelines.queries_ext177 import (
        q_user_bitonic_len,
    )

    d = q_user_bitonic_len(SF).to_pandas().set_index("user_id")
    raw = con.execute("""
        SELECT user_id, CAST(ROUND(value*100) AS BIGINT) v
        FROM events ORDER BY user_id, ts, event_id""").df()
    for uid, grp in raw.groupby("user_id"):
        v = grp["v"].to_numpy().astype(np.int64)
        m = len(v)
        rise = np.ones(m, dtype=np.int64)
        fall = np.ones(m, dtype=np.int64)
        for i in range(m):
            mask = v[:i] < v[i]
            if mask.any():
                rise[i] = 1 + rise[:i][mask].max()
        for i in range(m - 1, -1, -1):
            mask = v[i + 1:] < v[i]
            if mask.any():
                fall[i] = 1 + fall[i + 1:][mask].max()
        want = int((rise + fall - 1).max())
        row = d.loc[uid]
        assert int(row["bitonic_len"]) == want, uid
        assert want >= int(rise.max()) and want >= int(fall.max())
        assert int(row["n_events"]) == m
