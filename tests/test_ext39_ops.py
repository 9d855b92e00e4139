"""Extension batch 39: streaming watermark / late-event audit."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return c


def _sorted(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_late_event_audit_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext39 import (
        SQL_LATE_EVENT_AUDIT, q_late_event_audit,
    )

    d = _sorted(q_late_event_audit(SF).to_pandas())
    o = con.execute(SQL_LATE_EVENT_AUDIT).df()
    o = _sorted(o.astype(d.dtypes.to_dict()))
    assert len(d) == len(o) > 0
    assert d.equals(o)
    # the jittered arrival really produces BOTH late and on-time events
    assert d["n_late"].sum() > 0
    assert d["n_late"].sum() < d["n_total"].sum()


def test_late_event_audit_brute_force(ray_session, con):
    """Single-process replay: sort by arrival key, running strict-prefix
    max, 1 h lateness — equals the distributed prefix-partitioned result."""
    from polylabel_rs_ray.pipelines.queries_ext39 import (
        LATE_US, _akey_batch, q_late_event_audit,
    )

    e = con.execute(
        "SELECT event_id, epoch_us(ts) AS tu, event_type FROM events"
    ).df()
    ak = _akey_batch(e["event_id"].to_numpy(), e["tu"].to_numpy())
    order = np.lexsort((e["event_id"].to_numpy(), ak))
    tu = e["tu"].to_numpy()[order]
    et = e["event_type"].to_numpy()[order]
    cm = np.maximum.accumulate(tu)
    wm = np.concatenate([[np.int64(-2**62)], cm[:-1]])
    late = tu < wm - LATE_US
    import pandas as pd

    ref = (
        pd.DataFrame({"event_type": et, "late": late.astype(int)})
        .groupby("event_type")
        .agg(n_late=("late", "sum"), n_total=("late", "size"))
        .reset_index()
    )
    got = q_late_event_audit(SF).to_pandas()
    m = got.merge(ref, on="event_type", suffixes=("", "_ref"))
    assert len(m) == len(got) == len(ref)
    assert (m["n_late"] == m["n_late_ref"]).all()
    assert (m["n_total"] == m["n_total_ref"]).all()


def test_late_event_audit_partition_invariant(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext39 import q_late_event_audit

    a = _sorted(q_late_event_audit(SF, n_parts=1).to_pandas())
    b = _sorted(q_late_event_audit(SF, n_parts=7).to_pandas())
    assert a.equals(b)
