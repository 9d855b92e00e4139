"""Extension operators batch 5 (queries_ext4, relational/analytic widening):
bit-equal to their DuckDB oracles at sf0.001 plus semantic invariants."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _compare(q, sql, con):
    res = q(SF)
    d = res.to_pandas() if hasattr(res, "to_pandas") else res
    if isinstance(d, pa.Table):
        d = d.to_pandas()
    o = con.execute(sql).df()
    cols = sorted(d.columns)
    a = d[cols].sort_values(cols).reset_index(drop=True)
    b = o[cols].astype(a.dtypes.to_dict()).sort_values(cols).reset_index(drop=True)
    assert len(a) > 0 and a.equals(b), sql
    return a


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["events", "part", "customer", "supplier"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def test_skyline_matches_duckdb_and_is_pareto(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext4 import (
        SQL_SKYLINE_PARTS,
        q_skyline_parts,
    )

    s = _compare(q_skyline_parts, SQL_SKYLINE_PARTS, con)
    # skyline invariant: sorted by price asc, sizes strictly increase
    # (except exact duplicate points, which all survive)
    t = s.sort_values(["price_cents", "p_size"]).reset_index(drop=True)
    p = t["price_cents"].to_numpy()
    z = t["p_size"].to_numpy()
    dup = (np.diff(p) == 0) & (np.diff(z) == 0)
    assert np.all((np.diff(z) > 0) | dup)
    # no skyline member dominated by ANY part
    allp = con.execute(
        "SELECT CAST(ROUND(p_retailprice*100) AS BIGINT) pc, CAST(p_size AS BIGINT) sz FROM part"
    ).df()
    for _, r in t.head(5).iterrows():
        dom = allp[
            (allp["pc"] <= r["price_cents"])
            & (allp["sz"] >= r["p_size"])
            & ((allp["pc"] < r["price_cents"]) | (allp["sz"] > r["p_size"]))
        ]
        assert len(dom) == 0


def test_skyline_local_phase_keeps_global_skyline():
    # skyline(union) subset-of union(local skylines): split rows in two
    # arbitrary halves, local-skyline each, re-skyline the union -> equals
    # the one-shot skyline
    from polylabel_rs_ray.pipelines.queries_ext4 import _local_skyline

    rng = np.random.default_rng(7)
    n = 400
    tbl = pa.table({
        "p_partkey": pa.array(np.arange(n), type=pa.int64()),
        "p_size": pa.array(rng.integers(1, 50, n), type=pa.int64()),
        "price_cents": pa.array(rng.integers(100, 5000, n), type=pa.int64()),
    })
    whole = _local_skyline(tbl).to_pandas().sort_values("p_partkey")
    a, b = tbl.slice(0, n // 2), tbl.slice(n // 2)
    merged = pa.concat_tables([_local_skyline(a), _local_skyline(b)])
    two_phase = _local_skyline(merged).to_pandas().sort_values("p_partkey")
    assert whole.reset_index(drop=True).equals(two_phase.reset_index(drop=True))


def test_mode_event_type_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext4 import (
        SQL_MODE_EVENT_TYPE,
        q_mode_event_type,
    )

    m = _compare(q_mode_event_type, SQL_MODE_EVENT_TYPE, con)
    assert m["user_id"].is_unique
    # the mode count is each user's max per-type count
    mx = con.execute(
        "SELECT user_id, MAX(n) AS n FROM (SELECT user_id, event_type, "
        "COUNT(*) n FROM events GROUP BY 1,2) GROUP BY 1"
    ).df()
    j = m.merge(mx, on="user_id", suffixes=("", "_max"))
    assert (j["n"] == j["n_max"]).all()


def test_percent_rank_values_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext4 import (
        SQL_PERCENT_RANK_VALUES,
        q_percent_rank_values,
    )

    p = _compare(q_percent_rank_values, SQL_PERCENT_RANK_VALUES, con)
    p = p.sort_values("value_cents")
    assert p["pct_rank"].iloc[0] == 0.0
    assert p["pct_rank"].is_monotonic_increasing
    assert p["pct_rank"].iloc[-1] <= 1.0
    total = con.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    assert p["n"].sum() == total


def test_sliding_windows_match_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext4 import (
        SQL_SLIDING_WINDOW_COUNTS,
        q_sliding_window_counts,
    )

    w = _compare(q_sliding_window_counts, SQL_SLIDING_WINDOW_COUNTS, con)
    total = con.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    # every event lands in exactly width/hop = 4 windows
    assert w["n_events"].sum() == 4 * total
    assert (w["ws_us"] % 900_000_000 == 0).all()


def test_cohort_retention_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext4 import (
        SQL_COHORT_RETENTION,
        q_cohort_retention,
    )

    r = _compare(q_cohort_retention, SQL_COHORT_RETENTION, con)
    assert (r["day_offset"] >= 0).all()
    # offset-0 cell of each cohort holds the full cohort (first-seen day
    # is by definition an active day)
    n_users = con.execute("SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    assert r[r["day_offset"] == 0]["n_users"].sum() == n_users


def test_nation_balance_full_outer(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext4 import (
        SQL_NATION_BALANCE,
        q_nation_balance,
    )

    b = _compare(q_nation_balance, SQL_NATION_BALANCE, con)
    nc = con.execute("SELECT COUNT(*) FROM customer").fetchone()[0]
    ns = con.execute("SELECT COUNT(*) FROM supplier").fetchone()[0]
    assert b["n_customers"].sum() == nc
    assert b["n_suppliers"].sum() == ns
    # full-outer semantics: zero-filled sides are possible and rows cover
    # the union of both key sets
    keys = con.execute(
        "SELECT DISTINCT c_nationkey FROM customer UNION "
        "SELECT DISTINCT s_nationkey FROM supplier"
    ).df()
    assert set(b["nationkey"]) == set(keys.iloc[:, 0])
