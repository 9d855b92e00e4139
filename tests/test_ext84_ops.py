"""Extension batch 84: monotone-stack histogram rectangle + Qn scale."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .reset_index(drop=True)
              .astype(str))


def test_rectangle_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext84 import (
        SQL_MAX_HISTOGRAM_RECTANGLE, q_max_histogram_rectangle,
    )

    d = q_max_histogram_rectangle(SF)
    o = con.execute(SQL_MAX_HISTOGRAM_RECTANGLE).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))
    row = d.iloc[0]
    assert row["area"] == row["height"] * row["width_weeks"] > 0


def test_rectangle_stack_vs_brute_force_units():
    """The monotone stack agrees with the O(n^2) definition on adversarial
    shapes (plateaus, valleys, staircases, ties)."""
    from polylabel_rs_ray.pipelines.queries_ext84 import (
        q_max_histogram_rectangle,  # noqa: F401 (import check)
    )

    def stack_best(x):
        n = len(x)
        ext = np.concatenate([x, [0]])
        stack, best = [], (-1, 0, 0, 0)
        for i in range(n + 1):
            while stack and ext[stack[-1]] >= ext[i]:
                j = stack.pop()
                h = int(ext[j])
                left = stack[-1] + 1 if stack else 0
                width = i - left
                cand = (h * width, left, width, h)
                if (cand[0] > best[0]
                        or (cand[0] == best[0]
                            and (cand[1] < best[1]
                                 or (cand[1] == best[1]
                                     and cand[2] < best[2])))):
                    best = cand
            stack.append(i)
        return best

    def brute_best(x):
        n = len(x)
        best = (-1, 0, 0, 0)
        for a in range(n):
            for b in range(a, n):
                h = int(min(x[a:b + 1]))
                cand = (h * (b - a + 1), a, b - a + 1, h)
                if (cand[0] > best[0]
                        or (cand[0] == best[0]
                            and (cand[1] < best[1]
                                 or (cand[1] == best[1]
                                     and cand[2] < best[2])))):
                    best = cand
        return best

    cases = [
        np.array([2, 1, 4, 5, 1, 3, 3]),
        np.array([5, 5, 5]),
        np.array([1, 2, 3, 4, 5]),
        np.array([5, 4, 3, 2, 1]),
        np.array([3, 0, 3, 0, 3]),
        np.array([6, 2, 5, 4, 5, 1, 6]),
        np.array([1]),
    ]
    for x in cases:
        assert stack_best(x) == brute_best(x), x


def test_qn_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext84 import (
        SQL_QN_SCALE_ESTIMATOR, q_qn_scale_estimator,
    )

    d = q_qn_scale_estimator(SF)
    o = con.execute(SQL_QN_SCALE_ESTIMATOR).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_qn_properties(ray_session):
    """k is the C(h,2) order statistic; Qn is a realized |difference|."""
    from polylabel_rs_ray.pipelines.queries_ext84 import q_qn_scale_estimator

    d = q_qn_scale_estimator(SF).iloc[0]
    n, k = int(d["n_weeks"]), int(d["k"])
    h = n // 2 + 1
    assert k == h * (h - 1) // 2
    assert int(d["n_pairs"]) == n * (n - 1) // 2
    assert d["qn"] >= 0
