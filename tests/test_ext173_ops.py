"""Extension batch 173: Zhang-Suen skeleton + Luhn check digits."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "orders"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_skeleton_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext173 import (
        _sql_tile_skeleton, q_tile_skeleton,
    )

    d = q_tile_skeleton(SF).to_pandas()
    o = con.execute(_sql_tile_skeleton()).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))
    kept = int(d["skel"].sum())
    assert 0 < kept < len(d)  # real thinning


def test_skeleton_scalar_twin_and_properties(ray_session):
    """Per-pixel scalar Zhang-Suen (dict-based, no arrays) must agree;
    the skeleton preserves the component count of the input."""
    from collections import deque

    from polylabel_rs_ray.pipelines.queries_ext159 import _lattice_res
    from polylabel_rs_ray.pipelines.queries_ext173 import (
        SKEL_RES, q_tile_skeleton,
    )

    d = q_tile_skeleton(SF).to_pandas()
    lat = _lattice_res(SF, SKEL_RES)
    n = lat.shape[0]
    on = {(int(x), int(y)) for x, y in zip(*np.nonzero(lat > 0))}

    def nb(s, x, y):
        # p2..p9 clockwise from north
        offs = [(0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1),
                (-1, 0), (-1, 1)]
        return [int((x + dx, y + dy) in s) for dx, dy in offs]

    cur = set(on)
    while True:
        changed = False
        for sub in (1, 2):
            rem = set()
            for (x, y) in cur:
                p = nb(cur, x, y)
                B = sum(p)
                ring = p + [p[0]]
                A = sum(1 for i in range(8)
                        if ring[i] == 0 and ring[i + 1] == 1)
                if not (2 <= B <= 6 and A == 1):
                    continue
                p2, _, p4, _, p6, _, p8, _ = p
                if sub == 1:
                    ok = p2 * p4 * p6 == 0 and p4 * p6 * p8 == 0
                else:
                    ok = p2 * p4 * p8 == 0 and p2 * p6 * p8 == 0
                if ok:
                    rem.add((x, y))
            if rem:
                cur -= rem
                changed = True
        if not changed:
            break
    got = {(int(r.ix), int(r.iy)): int(r.skel) for r in d.itertuples()}
    assert got == {c: int(c in cur) for c in on}

    def ncomp(cells):
        seen, k = set(), 0
        for c in cells:
            if c in seen:
                continue
            k += 1
            dq = deque([c])
            seen.add(c)
            while dq:
                x, y = dq.popleft()
                for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1),
                               (1, 1), (1, -1), (-1, 1), (-1, -1)):
                    t = (x + dx, y + dy)
                    if t in cells and t not in seen:
                        seen.add(t)
                        dq.append(t)
        return k

    # Zhang-Suen preserves 8-connectivity of components
    assert ncomp(cur) == ncomp(on)


def test_luhn_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext173 import (
        _sql_luhn_check_digits, q_luhn_check_digits,
    )

    d = q_luhn_check_digits(SF).to_pandas()
    o = con.execute(_sql_luhn_check_digits()).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))
    assert d["check_digit"].nunique() == 10  # all digits populated


def test_luhn_known_vectors(ray_session):
    """Published Luhn vectors: payload 7992739871 -> check digit 3, and
    appending the digit makes the full number Luhn-valid."""
    from polylabel_rs_ray.pipelines.queries_ext173 import LUHN_DIGITS

    def check_digit(payload: int) -> int:
        total = 0
        for i in range(LUHN_DIGITS):
            dd = (payload // 10 ** i) % 10
            if i % 2 == 0:
                dd *= 2
                if dd > 9:
                    dd -= 9
            total += dd
        return (10 - total % 10) % 10

    assert check_digit(7992739871) == 3

    def luhn_valid(number: int) -> bool:
        total, i = 0, 0
        while number or i < 2:
            dd = number % 10
            if i % 2 == 1:
                dd *= 2
                if dd > 9:
                    dd -= 9
            total += dd
            number //= 10
            i += 1
        return total % 10 == 0

    for payload in (7992739871, 123456789012 % 10 ** LUHN_DIGITS, 1, 0):
        full = payload * 10 + check_digit(payload)
        assert luhn_valid(full), payload
