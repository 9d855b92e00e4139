"""Extension batch 145: 2-D Haar tile energy + first-vs-modal matrix."""

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


def test_haar_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext145 import (
        _sql_tile_haar_energy, q_tile_haar_energy,
    )

    d = q_tile_haar_energy(SF).to_pandas()
    o = con.execute(_sql_tile_haar_energy()).df()
    assert len(d) == len(o) == 5
    assert _norm(d).equals(_norm(o))


def test_haar_parseval(ray_session):
    """2-D Haar Parseval (unnormalized): N²·Σc² == Σ_k 4^(L... verify
    the recursive identity level by level against a dense twin:
    4·Σ(coarse²_k) == Σ(coarse²_{k-1})·4 - ... — simplest exact check:
    rebuild the transform densely from tile_counts and compare."""
    from polylabel_rs_ray.config import DEFAULT_TILE_RES
    from polylabel_rs_ray.pipelines.queries import q_tile_counts
    from polylabel_rs_ray.pipelines.queries_ext145 import (
        q_tile_haar_energy,
    )
    from polylabel_rs_ray.stages.cells import decode_cells

    d = q_tile_haar_energy(SF).to_pandas().set_index("level")
    tc = q_tile_counts(SF).to_pandas()
    n = 1 << DEFAULT_TILE_RES
    lat = np.zeros((n, n), dtype=np.int64)
    ix, iy, _ = decode_cells(tc["tile_id"].to_numpy().astype(np.int64))
    lat[ix, iy] = tc["n_points"].to_numpy().astype(np.int64)
    cur = lat
    for level in range(1, 6):
        a, b = cur[0::2, 0::2], cur[1::2, 0::2]
        c, dd = cur[0::2, 1::2], cur[1::2, 1::2]
        row = d.loc[level]
        assert row["energy_h"] == int(((a + c - b - dd) ** 2).sum())
        assert row["energy_v"] == int(((a + b - c - dd) ** 2).sum())
        assert row["energy_g"] == int(((a + dd - b - c) ** 2).sum())
        # per-block Parseval: 4·Σprev² == h²+v²+g²+s² summed
        s = a + b + c + dd
        assert 4 * int((cur * cur).sum()) == (
            int(((a + c - b - dd) ** 2).sum())
            + int(((a + b - c - dd) ** 2).sum())
            + int(((a + dd - b - c) ** 2).sum())
            + int((s * s).sum()))
        cur = s


def test_matrix_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext145 import (
        SQL_FIRST_VS_MODAL_MATRIX, q_first_vs_modal_matrix,
    )

    d = q_first_vs_modal_matrix(SF).to_pandas()
    o = con.execute(SQL_FIRST_VS_MODAL_MATRIX).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_matrix_totals(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext145 import (
        q_first_vs_modal_matrix,
    )

    d = q_first_vs_modal_matrix(SF).to_pandas()
    n_users = con.execute(
        "SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    assert int(d["n_users"].sum()) == n_users
    assert (d["n_users"] > 0).all()
