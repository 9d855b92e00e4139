"""Extension batch 113: SCD Type-2 intervals + Theil-Sen part slope."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "lineitem"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_scd2_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext113 import (
        SQL_SCD2_INTERVALS, q_scd2_intervals,
    )

    d = q_scd2_intervals(SF).to_pandas()
    o = con.execute(SQL_SCD2_INTERVALS).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_scd2_interval_invariants(ray_session):
    """Closed SCD2 rows chain: within a user, sorted by valid_from, each
    row's valid_to equals the next row's valid_from; exactly one open
    (−1) row per user; run_events sums to the user's event count."""
    from polylabel_rs_ray.pipelines.queries_ext113 import q_scd2_intervals

    d = q_scd2_intervals(SF).to_pandas().sort_values(
        ["user_id", "valid_from_us"]).reset_index(drop=True)
    for uid, sub in d.groupby("user_id"):
        to = sub["valid_to_us"].to_numpy()
        frm = sub["valid_from_us"].to_numpy()
        assert (to[:-1] == frm[1:]).all()
        assert to[-1] == -1
        assert (to[:-1] >= frm[:-1]).all()
    import duckdb as dd

    c = dd.connect()
    n_events = c.execute(
        f"SELECT COUNT(*) FROM '{SF}/events.parquet'").fetchone()[0]
    assert int(d["run_events"].sum()) == n_events


def test_scd2_partition_invariance(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext113 import q_scd2_intervals

    a = _norm(q_scd2_intervals(SF, n_parts=2).to_pandas())
    b = _norm(q_scd2_intervals(SF, n_parts=11).to_pandas())
    assert a.equals(b)


def test_theilsen_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext113 import (
        SQL_THEILSEN_PART_SLOPE, q_theilsen_part_slope,
    )

    d = q_theilsen_part_slope(SF).to_pandas()
    o = con.execute(SQL_THEILSEN_PART_SLOPE).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_theilsen_vs_bruteforce(ray_session):
    """Recompute one part's Theil-Sen slope with a plain double loop and
    the textbook definition; the slope must be a member of the pairwise
    slope set and bounded by its extremes."""
    import pyarrow.parquet as pq

    from polylabel_rs_ray.pipelines.queries_ext113 import (
        q_theilsen_part_slope,
    )

    d = q_theilsen_part_slope(SF).to_pandas()
    pick = d.sort_values("n_pairs", ascending=False).iloc[0]
    pk = int(pick["l_partkey"])
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_orderkey", "l_linenumber",
                 "l_quantity", "l_extendedprice"]).to_pandas()
    li = li[li["l_partkey"] == pk].copy()
    li["q"] = li["l_quantity"].astype(np.int64)
    li["c"] = np.round(li["l_extendedprice"].to_numpy() * 100.0).astype(
        np.int64)
    li = li.sort_values(["l_orderkey", "l_linenumber", "q", "c"])
    q = li["q"].to_numpy()
    c = li["c"].to_numpy()
    slopes = []
    for i in range(len(q)):
        for j in range(i + 1, len(q)):
            if q[j] != q[i]:
                slopes.append(float(c[j] - c[i]) / float(q[j] - q[i]))
    slopes.sort()
    assert len(slopes) == int(pick["n_pairs"])
    assert pick["ts_slope"] == slopes[(len(slopes) - 1) // 2]
    assert slopes[0] <= pick["ts_slope"] <= slopes[-1]


def test_theilsen_partition_invariance(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext113 import (
        q_theilsen_part_slope,
    )

    a = _norm(q_theilsen_part_slope(SF, n_parts=3).to_pandas())
    b = _norm(q_theilsen_part_slope(SF, n_parts=17).to_pandas())
    assert a.equals(b)
