"""Extension batch 43: snapshot diff / change-data-feed generation."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    return c


def _sorted(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_snapshot_diff_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext43 import (
        _sql_snapshot_diff, q_snapshot_diff,
    )

    d = _sorted(q_snapshot_diff(SF).to_pandas())
    o = con.execute(_sql_snapshot_diff()).df()
    o = _sorted(o.astype(d.dtypes.to_dict()))
    assert len(d) == len(o) > 0
    assert d.equals(o)


def test_diff_closure_with_merge(ray_session, con):
    """diff(base, merge(base, delta)) recovers EXACTLY the delta ext31
    planted: the I/U/D key classes and payloads round-trip."""
    from polylabel_rs_ray.pipelines.queries_ext31 import INSERT_OFFSET
    from polylabel_rs_ray.pipelines.queries_ext43 import q_snapshot_diff

    d = q_snapshot_diff(SF).to_pandas()
    base = con.execute(
        "SELECT o_orderkey AS k, CAST(ROUND(o_totalprice*100) AS BIGINT) AS pc"
        " FROM orders"
    ).df().set_index("k")
    keys = base.index.to_numpy()

    exp_del = {int(k) for k in keys if k % 13 == 3}
    exp_upd = {int(k) for k in keys if k % 7 == 0 and k % 13 != 3}
    exp_ins = {int(k) + INSERT_OFFSET for k in keys if k % 11 == 5}

    got_del = set(d[d["change"] == "D"]["o_orderkey"])
    got_upd = set(d[d["change"] == "U"]["o_orderkey"])
    got_ins = set(d[d["change"] == "I"]["o_orderkey"])
    assert got_del == exp_del
    assert got_upd == exp_upd
    assert got_ins == exp_ins

    ups = d[d["change"] == "U"].set_index("o_orderkey")
    for k in list(exp_upd)[:20]:
        assert ups.loc[k, "new_price_cents"] == base.loc[k, "pc"] + 500
        assert ups.loc[k, "new_status"] == "U"
    ins = d[d["change"] == "I"].set_index("o_orderkey")
    for k in list(exp_ins)[:20]:
        assert ins.loc[k, "new_price_cents"] == k - INSERT_OFFSET
        assert ins.loc[k, "new_status"] == "N"


def test_snapshot_diff_partition_invariant(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext43 import q_snapshot_diff

    a = _sorted(q_snapshot_diff(SF, n_parts=1).to_pandas())
    b = _sorted(q_snapshot_diff(SF, n_parts=7).to_pandas())
    assert a.equals(b)
