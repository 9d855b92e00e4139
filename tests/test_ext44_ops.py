"""Extension batch 44: association-rule lift over co-purchase baskets."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")
    return c


def _sorted(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_part_pair_lift_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext44 import (
        SQL_PART_PAIR_LIFT, q_part_pair_lift,
    )

    d = _sorted(q_part_pair_lift(SF).to_pandas())
    o = con.execute(SQL_PART_PAIR_LIFT).df()
    o = _sorted(o.astype(d.dtypes.to_dict()))
    assert len(d) == len(o) > 0
    assert d.equals(o)


def test_part_pair_lift_semantics(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext44 import (
        TOP_PAIRS, q_part_pair_lift,
    )

    df = q_part_pair_lift(SF).to_pandas()
    assert len(df) == TOP_PAIRS
    assert (df["part_a"] < df["part_b"]).all()
    # lift/confidence definitions hold exactly
    n = con.execute(
        "SELECT COUNT(DISTINCT l_orderkey) FROM lineitem"
    ).fetchone()[0]
    lift = n * df["pair_orders"].to_numpy(np.float64) / (
        df["orders_a"].to_numpy(np.float64) * df["orders_b"].to_numpy(np.float64)
    )
    assert np.array_equal(lift, df["lift"].to_numpy())
    assert (df["confidence"] <= 1.0).all() and (df["confidence"] > 0).all()
    assert (df["pair_orders"] <= df[["orders_a", "orders_b"]].min(axis=1)).all()
    # support spot-check against SQL for the strongest pair
    a, b = int(df.iloc[0]["part_a"]), int(df.iloc[0]["part_b"])
    cab = con.execute(
        "WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) "
        "SELECT COUNT(*) FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey = ? AND b.l_partkey = ?", [a, b],
    ).fetchone()[0]
    assert cab == df.iloc[0]["pair_orders"]


def test_part_pair_lift_partition_invariant(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext44 import q_part_pair_lift

    a = _sorted(q_part_pair_lift(SF, n_parts=1).to_pandas())
    b = _sorted(q_part_pair_lift(SF, n_parts=5).to_pandas())
    assert a.equals(b)
