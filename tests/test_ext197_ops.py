"""Extension batch 197: max-sum submatrix + Josephus survivor."""

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


def test_submatrix_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext197 import (
        _sql_max_sum_submatrix, q_max_sum_submatrix,
    )

    d = q_max_sum_submatrix(SF).to_pandas()
    o = con.execute(_sql_max_sum_submatrix()).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_submatrix_brute_force(ray_session):
    """Exhaustive O(n^4) numpy rectangle scan with the same tie rule;
    the optimum is a strict subrectangle (the zero-sum transform makes
    the full grid sum to zero) and beats the global zero."""
    from polylabel_rs_ray.pipelines.queries_ext159 import _lattice_res
    from polylabel_rs_ray.pipelines.queries_ext197 import (
        KAD_RES, q_max_sum_submatrix,
    )

    d = q_max_sum_submatrix(SF).to_pandas().iloc[0]
    lat = _lattice_res(SF, KAD_RES).astype(np.int64)
    n = lat.shape[0]
    v = lat * (n * n) - int(lat.sum())
    sat = np.zeros((n + 1, n + 1), dtype=np.int64)
    sat[1:, 1:] = np.cumsum(np.cumsum(v, axis=0), axis=1)
    best = None
    for x0 in range(n):
        for x1 in range(x0, n):
            for y0 in range(n):
                for y1 in range(y0, n):
                    s = int(sat[x1 + 1, y1 + 1] - sat[x0, y1 + 1]
                            - sat[x1 + 1, y0] + sat[x0, y0])
                    cand = (-s, x0, y0, x1, y1)
                    if best is None or cand < best:
                        best = cand
    assert (int(d["best_sum"]), int(d["x0"]), int(d["y0"]),
            int(d["x1"]), int(d["y1"])) == (-best[0], *best[1:])
    assert int(d["best_sum"]) > 0  # zero-sum transform: full grid = 0
    assert (int(d["x1"]) - int(d["x0"]) + 1) * \
        (int(d["y1"]) - int(d["y0"]) + 1) < n * n


def test_josephus_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext197 import (
        SQL_JOSEPHUS_SURVIVOR, q_josephus_survivor,
    )

    d = q_josephus_survivor(SF).to_pandas()
    o = con.execute(SQL_JOSEPHUS_SURVIVOR).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_josephus_simulation(ray_session, con):
    """Direct circle-elimination simulation with a list, plus the known
    textbook instance J(7, k=3) = position 3 (0-based)."""
    from polylabel_rs_ray.pipelines.queries_ext197 import (
        JOSEPHUS_K, q_josephus_survivor,
    )

    def simulate(n, k):
        people = list(range(n))
        idx = 0
        while len(people) > 1:
            idx = (idx + k - 1) % len(people)
            people.pop(idx)
        return people[0]

    assert simulate(7, 3) == 3  # classic textbook value

    d = q_josephus_survivor(SF).to_pandas().iloc[0]
    n = int(d["n_users"])
    assert int(d["survivor_pos"]) == simulate(n, JOSEPHUS_K)
    roster = sorted(r[0] for r in con.execute(
        "SELECT DISTINCT user_id FROM events").fetchall())
    assert int(d["survivor_user_id"]) == roster[int(d["survivor_pos"])]
