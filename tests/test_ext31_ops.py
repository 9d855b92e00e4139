"""Extension batch 31: MERGE INTO / CDC upsert (latest-wins snapshot)."""

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


def test_merge_upsert_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext31 import (
        SQL_MERGE_UPSERT_ORDERS, q_merge_upsert_orders,
    )

    d = _sorted(q_merge_upsert_orders(SF).to_pandas())
    o = con.execute(SQL_MERGE_UPSERT_ORDERS).df()
    o = _sorted(o.astype(d.dtypes.to_dict()))
    assert len(d) == len(o) > 0
    assert d.equals(o)


def test_merge_upsert_semantics(ray_session, con):
    """DELETE keys vanish, UPDATE keys carry the bumped price at version 1,
    INSERT keys appear offset with status 'N', untouched keys keep their
    base row byte-for-byte."""
    from polylabel_rs_ray.pipelines.queries_ext31 import (
        INSERT_OFFSET, q_merge_upsert_orders,
    )

    merged = q_merge_upsert_orders(SF).to_pandas().set_index("o_orderkey")
    base = con.execute(
        "SELECT o_orderkey AS k, o_orderstatus AS st, "
        "CAST(ROUND(o_totalprice*100) AS BIGINT) AS pcents FROM orders"
    ).df().set_index("k")

    for k, row in base.iterrows():
        if k % 13 == 3:
            assert k not in merged.index
        elif k % 7 == 0:
            m = merged.loc[k]
            assert m["o_orderstatus"] == "U"
            assert m["price_cents"] == row["pcents"] + 500
            assert m["src_version"] == 1
        else:
            m = merged.loc[k]
            assert m["o_orderstatus"] == row["st"]
            assert m["price_cents"] == row["pcents"]
            assert m["src_version"] == 0
        if k % 11 == 5:
            ins = merged.loc[k + INSERT_OFFSET]
            assert ins["o_orderstatus"] == "N"
            assert ins["price_cents"] == k
            assert ins["src_version"] == 1

    # row-count identity: base - deletes + inserts
    n_del = int((base.index % 13 == 3).sum())
    n_ins = int((base.index % 11 == 5).sum())
    assert len(merged) == len(base) - n_del + n_ins


def test_merge_upsert_partition_invariant(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext31 import q_merge_upsert_orders

    a = _sorted(q_merge_upsert_orders(SF, n_parts=1).to_pandas())
    b = _sorted(q_merge_upsert_orders(SF, n_parts=7).to_pandas())
    assert a.equals(b)
