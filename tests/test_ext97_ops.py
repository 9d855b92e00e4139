"""Extension batch 97: FD violation audit + weekday seasonality stats."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "orders"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_fd_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext97 import (
        _sql_fd_violation_audit, q_fd_violation_audit,
    )

    d = q_fd_violation_audit(SF)
    o = con.execute(_sql_fd_violation_audit()).df()
    assert len(d) == len(o) == 3
    assert _norm(d).equals(_norm(o))


def test_fd_semantics(ray_session, con):
    """Zero multi-groups implies zero violations; violations < rows; the
    lang->source FD is violated on this corpus (langs are independent of
    sources)."""
    from polylabel_rs_ray.pipelines.queries_ext97 import q_fd_violation_audit

    d = q_fd_violation_audit(SF).set_index("fd")
    for _, r in d.iterrows():
        if r["n_multi_groups"] == 0:
            assert r["n_violations"] == 0
        assert 0 <= r["n_violations"] < r["n_rows"]
    assert d.loc["lang->source", "n_violations"] > 0


def test_dow_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext97 import (
        SQL_DOW_SEASONALITY_STATS, q_dow_seasonality_stats,
    )

    d = q_dow_seasonality_stats(SF)
    o = con.execute(SQL_DOW_SEASONALITY_STATS).df()
    assert len(d) == len(o) == 7
    assert _norm(d).equals(_norm(o))


def test_dow_conservation(ray_session, con):
    """Day and order masses are conserved across the 7 buckets."""
    from polylabel_rs_ray.pipelines.queries_ext97 import q_dow_seasonality_stats

    d = q_dow_seasonality_stats(SF)
    total_orders = con.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    assert int(d["sum_orders"].sum()) == total_orders
    span = con.execute("""
        SELECT MAX(d) - MIN(d) + 1 FROM (
          SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS d
          FROM orders)""").fetchone()[0]
    assert int(d["n_days"].sum()) == span
