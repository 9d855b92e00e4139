"""Extension operators batch 4 (queries_ext3, event-stream analytics):
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
    c.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return c


def test_type_streaks_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext3 import (
        SQL_TYPE_STREAKS,
        q_type_streaks,
    )

    s = _compare(q_type_streaks, SQL_TYPE_STREAKS, con)
    assert (s["max_streak"] >= 1).all() and (s["n_streaks"] >= 1).all()
    # per (user, type): streaks x max_streak bounds the type's event count
    per_type = con.execute(
        "SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2"
    ).df()
    m = s.merge(per_type, on=["user_id", "event_type"])
    assert len(m) == len(s)
    assert (m["max_streak"] <= m["n"]).all()
    assert (m["n_streaks"] * m["max_streak"] >= m["n"]).all()


def test_compress_stream_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext3 import (
        SQL_COMPRESS_STREAM,
        SQL_TYPE_STREAKS,
        q_compress_stream,
    )

    c = _compare(q_compress_stream, SQL_COMPRESS_STREAM, con)
    assert c["event_id"].is_unique
    # survivors == total islands (streak starts) == sum of n_streaks
    n_islands = con.execute(
        f"SELECT SUM(n_streaks) FROM ({SQL_TYPE_STREAKS})"
    ).fetchone()[0]
    assert len(c) == n_islands


def test_adoption_curve_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext3 import (
        SQL_ADOPTION_CURVE,
        q_adoption_curve,
    )

    a = _compare(q_adoption_curve, SQL_ADOPTION_CURVE, con)
    a = a.sort_values("hr").reset_index(drop=True)
    assert len(a) > 1  # a real curve, not a single point
    np.testing.assert_array_equal(
        a["cum_users"].to_numpy(), a["new_users"].cumsum().to_numpy()
    )
    n_users = con.execute("SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    assert a["cum_users"].iloc[-1] == n_users


def test_user_event_unpivot_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries import PIVOT_TYPES
    from polylabel_rs_ray.pipelines.queries_ext3 import (
        _sql_user_event_unpivot,
        q_user_event_unpivot,
    )

    u = _compare(q_user_event_unpivot, _sql_user_event_unpivot(), con)
    # long form: every user carries exactly one row per pivot type
    g = u.groupby("user_id")["event_type"].agg(["count", "nunique"])
    assert (g["count"] == len(PIVOT_TYPES)).all()
    assert (g["nunique"] == len(PIVOT_TYPES)).all()
    # melt preserves totals (zeros included)
    n_counted = con.execute(
        "SELECT COUNT(*) FROM events WHERE event_type IN "
        + "(" + ",".join(f"'{t}'" for t in PIVOT_TYPES) + ")"
    ).fetchone()[0]
    assert u["n"].sum() == n_counted
