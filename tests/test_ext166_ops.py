"""Extension batch 166: daily-revenue Cartesian tree + label octant stats."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "documents"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_cartesian_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext166 import (
        SQL_DAILY_REVENUE_CARTESIAN, q_daily_revenue_cartesian,
    )

    d = q_daily_revenue_cartesian(SF).to_pandas()
    o = con.execute(SQL_DAILY_REVENUE_CARTESIAN).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_cartesian_is_a_valid_treap(ray_session):
    """Structural recheck: exactly one root (the max-priority day);
    every non-root's parent has strictly greater priority; the parent
    is an adjacent dominator — every day strictly between child and
    parent has smaller priority than the child (the defining
    range-max/heap property of a Cartesian tree); and parent links
    form a tree (n-1 edges, acyclic by priorities)."""
    from polylabel_rs_ray.pipelines.queries_ext166 import (
        q_daily_revenue_cartesian,
    )

    d = q_daily_revenue_cartesian(SF).to_pandas().sort_values(
        "day").reset_index(drop=True)
    prio = {int(r.day): (int(r.cents), -int(r.day))
            for r in d.itertuples()}
    roots = d[d["side"] == "root"]
    assert len(roots) == 1
    assert prio[int(roots["day"].iloc[0])] == max(prio.values())
    days = d["day"].to_numpy()
    for r in d.itertuples():
        if r.side == "root":
            assert r.parent_day == -1
            continue
        p = int(r.parent_day)
        v = int(r.day)
        assert prio[p] > prio[v]
        assert (r.side == "L") == (p < v)
        lo, hi = min(p, v), max(p, v)
        between = days[(days > lo) & (days < hi)]
        for w in between:
            assert prio[int(w)] < prio[v], (v, p, w)


def test_octants_match_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext166 import (
        _sql_label_octant_stats, q_label_octant_stats,
    )

    d = q_label_octant_stats(SF).to_pandas()
    o = con.execute(_sql_label_octant_stats()).df()
    assert len(d) == len(o) == 8  # all octants populated
    assert _norm(d).equals(_norm(o))


def test_octants_direct_recount(ray_session):
    """Recount from the label stage output with an independent octant
    classifier (angle-free sign/compare logic) and exact r² fold."""
    from polylabel_rs_ray.pipelines.queries import _dyadic_labeled
    from polylabel_rs_ray.pipelines.queries_ext166 import (
        OCT_CENTER, OCT_SCALE, q_label_octant_stats,
    )

    d = q_label_octant_stats(SF).to_pandas().set_index("octant")
    lab = _dyadic_labeled(SF).to_pandas()
    sx = np.round((lab["label_x"].to_numpy() - OCT_CENTER)
                  * OCT_SCALE).astype(np.int64)
    sy = np.round((lab["label_y"].to_numpy() - OCT_CENTER)
                  * OCT_SCALE).astype(np.int64)
    # independent classifier: dict-based lookup over the 3 predicates
    want_n = {}
    want_r2 = {}
    for x, y in zip(sx.tolist(), sy.tolist()):
        o = (4 if y < 0 else 0) + (2 if x < 0 else 0) + \
            (1 if abs(x) < abs(y) else 0)
        want_n[o] = want_n.get(o, 0) + 1
        want_r2[o] = want_r2.get(o, 0) + x * x + y * y
    assert {int(k): int(v) for k, v in d["n"].items()} == want_n
    assert {int(k): int(v)
            for k, v in d["sum_r2_scaled"].items()} == want_r2
    # exactness guard: the scaled coordinates really are integers
    fx = (lab["label_x"].to_numpy() - OCT_CENTER) * OCT_SCALE
    assert np.all(fx == np.round(fx))
