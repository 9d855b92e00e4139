"""Extension batch 179: optimal BST table + hourly transport plan."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events",):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_bst_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext179 import (
        _sql_optimal_bst_table, q_optimal_bst_table,
    )

    d = q_optimal_bst_table(SF).to_pandas()
    o = con.execute(_sql_optimal_bst_table()).df()
    assert len(d) == len(o) == 15
    assert _norm(d).equals(_norm(o))


def test_bst_exhaustive_trees(ray_session, con):
    """Enumerate ALL BSTs over each interval (Catalan(5)=42 shapes for
    the full range) and check the DP cost is the true minimum."""
    from polylabel_rs_ray.pipelines.queries_ext179 import (
        BST_TYPES, q_optimal_bst_table,
    )

    d = q_optimal_bst_table(SF).to_pandas()
    cnt = con.execute(
        "SELECT event_type, COUNT(*) n FROM events GROUP BY 1"
    ).df().set_index("event_type")["n"]
    w = [int(cnt.get(t, 0)) for t in BST_TYPES]

    def best_cost(i, j):
        if i > j:
            return 0
        total = sum(w[i:j + 1])
        return total + min(best_cost(i, r - 1) + best_cost(r + 1, j)
                           for r in range(i, j + 1))

    def all_costs(i, j):
        # weighted path length over every tree shape, minimum taken
        if i > j:
            return [0]
        out = []
        total = sum(w[i:j + 1])
        for r in range(i, j + 1):
            for lc in all_costs(i, r - 1):
                for rc in all_costs(r + 1, j):
                    out.append(total + lc + rc)
        return out

    got = {(int(r.i), int(r.j)): int(r.cost) for r in d.itertuples()}
    for i in range(5):
        for j in range(i, 5):
            assert got[(i, j)] == best_cost(i, j)
            assert got[(i, j)] == min(all_costs(i, j))


def test_transport_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext179 import (
        SQL_HOURLY_TRANSPORT_PLAN, q_hourly_transport_plan,
    )

    d = q_hourly_transport_plan(SF).to_pandas()
    o = con.execute(SQL_HOURLY_TRANSPORT_PLAN).df()
    assert len(d) == len(o) >= 24
    assert _norm(d).equals(_norm(o))


def test_transport_is_a_valid_monotone_coupling(ray_session, con):
    """Marginals reproduce the cross-scaled histograms exactly; the
    support is a monotone staircase (no two cells strictly reversed)."""
    from polylabel_rs_ray.pipelines.queries_ext179 import (
        WEEKEND_MODS, q_hourly_transport_plan,
    )

    d = q_hourly_transport_plan(SF).to_pandas()
    ev = con.execute("""
        SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
               (epoch_us(ts) // 86400000000) % 7 AS dow
        FROM events""").df()
    wk = ev["dow"].isin(WEEKEND_MODS)
    wd = np.bincount(ev["hour"][~wk], minlength=24).astype(np.int64)
    we = np.bincount(ev["hour"][wk], minlength=24).astype(np.int64)
    a = wd * int(we.sum())
    b = we * int(wd.sum())
    src_marg = np.zeros(24, dtype=np.int64)
    dst_marg = np.zeros(24, dtype=np.int64)
    for r in d.itertuples():
        src_marg[int(r.src_hour)] += int(r.mass)
        dst_marg[int(r.dst_hour)] += int(r.mass)
        assert r.mass > 0
    assert np.array_equal(src_marg, a)
    assert np.array_equal(dst_marg, b)
    cells = sorted((int(r.src_hour), int(r.dst_hour))
                   for r in d.itertuples())
    for (s1, t1), (s2, t2) in zip(cells, cells[1:]):
        if s1 < s2:
            assert t1 <= t2  # monotone staircase
