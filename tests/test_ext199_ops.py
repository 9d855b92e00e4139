"""Extension batch 199: perimeter census + digital roots."""

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


def test_perimeter_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext199 import (
        _sql_tile_perimeter_census, q_tile_perimeter_census,
    )

    d = q_tile_perimeter_census(SF).to_pandas()
    o = con.execute(_sql_tile_perimeter_census()).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_perimeter_handshake_identity(ray_session):
    """perimeter = 4·cells − 2·internal_adjacencies, border+interior =
    occupied, and a scalar per-cell recount agrees."""
    from polylabel_rs_ray.pipelines.queries_ext159 import _lattice_res
    from polylabel_rs_ray.pipelines.queries_ext199 import (
        PER_RES, q_tile_perimeter_census,
    )

    d = q_tile_perimeter_census(SF).to_pandas().iloc[0]
    lat = _lattice_res(SF, PER_RES)
    n = lat.shape[0]
    occ = {(int(x), int(y)) for x, y in zip(*np.nonzero(lat > 0))}
    adj = sum(1 for (x, y) in occ
              for t in ((x + 1, y), (x, y + 1)) if t in occ)
    cells = len(occ)
    assert int(d["perimeter_edges"]) == 4 * cells - 2 * adj
    assert int(d["n_border"]) + int(d["n_interior"]) == cells
    border = sum(1 for (x, y) in occ
                 if any((x + dx, y + dy) not in occ
                        or not (0 <= x + dx < n and 0 <= y + dy < n)
                        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))))
    assert int(d["n_border"]) == border


def test_droot_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext199 import (
        _sql_orderkey_digital_root, q_orderkey_digital_root,
    )

    d = q_orderkey_digital_root(SF).to_pandas()
    o = con.execute(_sql_orderkey_digital_root()).df()
    assert len(d) == len(o) == 10  # 0 plus 1..9 (key 0 exists)
    assert _norm(d).equals(_norm(o))


def test_droot_definition_and_uniformity(ray_session, con):
    """Iterated digit-sum scalar twin, closed-form identity, and
    near-uniform masses over the dense key range."""
    from polylabel_rs_ray.pipelines.queries_ext199 import (
        q_orderkey_digital_root,
    )

    d = q_orderkey_digital_root(SF).to_pandas().set_index("droot")
    keys = [int(r[0]) for r in con.execute(
        "SELECT o_orderkey FROM orders").fetchall()]

    def droot(k):
        while k >= 10:
            k = sum(int(c) for c in str(k))
        return k

    want = {}
    for k in keys:
        want[droot(k)] = want.get(droot(k), 0) + 1
    assert {int(i): int(v) for i, v in d["n_keys"].items()} == want
    for k in keys[:200]:
        assert droot(k) == (0 if k == 0 else 1 + (k - 1) % 9)
    n = len(keys)
    for cls in range(1, 10):
        assert abs(int(d["n_keys"].get(cls, 0)) - n // 9) <= n // 90 + 2
