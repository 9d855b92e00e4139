"""Extension batch 75: type dwell times + nation revenue share."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "orders", "customer", "nation", "region"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_dwell_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext75 import (
        SQL_TYPE_DWELL_TIMES, q_type_dwell_times,
    )

    d = q_type_dwell_times(SF).to_pandas()
    o = con.execute(SQL_TYPE_DWELL_TIMES).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_dwell_conservation(ray_session, con):
    """Total holds = events - users (each user's last event holds nothing);
    total dwell = sum of per-user spans."""
    from polylabel_rs_ray.pipelines.queries_ext75 import q_type_dwell_times

    d = q_type_dwell_times(SF).to_pandas()
    n_events = con.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    n_users = con.execute(
        "SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    span = con.execute("""SELECT SUM(sp) FROM (
        SELECT MAX(CAST(epoch_us(ts) AS BIGINT))
               - MIN(CAST(epoch_us(ts) AS BIGINT)) AS sp
        FROM events GROUP BY user_id)""").fetchone()[0]
    assert int(d["n_holds"].sum()) == n_events - n_users
    assert int(d["total_dwell_us"].sum()) == int(span)


def test_dwell_partition_invariance(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext75 import q_type_dwell_times

    a = _norm(q_type_dwell_times(SF, n_parts=1).to_pandas())
    b = _norm(q_type_dwell_times(SF, n_parts=9).to_pandas())
    assert a.equals(b)


def test_share_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext75 import (
        SQL_NATION_REVENUE_SHARE, q_nation_revenue_share,
    )

    d = q_nation_revenue_share(SF)
    o = con.execute(SQL_NATION_REVENUE_SHARE).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_share_parent_consistency(ray_session):
    """Nations of one region share the same parent total, which equals the
    sum of their revenues; shares sum to 1 per region."""
    from polylabel_rs_ray.pipelines.queries_ext75 import q_nation_revenue_share

    d = q_nation_revenue_share(SF)
    for region, g in d.groupby("r_name"):
        assert g["region_revenue_cents"].nunique() == 1
        assert int(g["revenue_cents"].sum()) == \
            int(g["region_revenue_cents"].iloc[0])
