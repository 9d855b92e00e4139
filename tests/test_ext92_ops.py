"""Extension batch 92: order reconciliation + rate-limit audit."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "lineitem", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_reconciliation_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext92 import (
        SQL_ORDER_RECONCILIATION, q_order_reconciliation,
    )

    d = q_order_reconciliation(SF).to_pandas()
    o = con.execute(SQL_ORDER_RECONCILIATION).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_reconciliation_partition(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext92 import (
        q_order_reconciliation,
    )

    d = q_order_reconciliation(SF).to_pandas().iloc[0]
    assert d["n_exact"] + d["n_mismatch"] == d["n_orders"]
    # this synthetic schema does not reconcile header vs lines; the audit
    # must REPORT that, not hide it
    assert d["n_mismatch"] > 0 and d["abs_diff_cents"] > 0


def test_rate_limit_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext92 import (
        SQL_RATE_LIMIT_AUDIT, q_rate_limit_audit,
    )

    d = q_rate_limit_audit(SF).to_pandas()
    o = con.execute(SQL_RATE_LIMIT_AUDIT).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_rate_limit_partition_invariance(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext92 import q_rate_limit_audit

    a = _norm(q_rate_limit_audit(SF, n_parts=1).to_pandas())
    b = _norm(q_rate_limit_audit(SF, n_parts=6).to_pandas())
    assert a.equals(b)


def test_rate_limit_brute_force_one_user(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext92 import (
        RATE_WINDOW_US, q_rate_limit_audit,
    )

    d = q_rate_limit_audit(SF).to_pandas()
    uid = int(d["user_id"].iloc[0])
    ts = con.execute(
        f"SELECT CAST(epoch_us(ts) AS BIGINT) AS t FROM events "
        f"WHERE user_id = {uid} ORDER BY t").df()["t"].tolist()
    best = max(sum(1 for t2 in ts if t1 <= t2 < t1 + RATE_WINDOW_US)
               for t1 in ts)
    assert int(d[d["user_id"] == uid]["max_events_1h"].iloc[0]) == best
