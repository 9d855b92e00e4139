"""Extension batch 82: consistent-hash ring audit + varint size estimate."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_chash_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext82 import (
        _sql_consistent_hash_audit, q_consistent_hash_audit,
    )

    d = q_consistent_hash_audit(SF).to_pandas()
    o = con.execute(_sql_consistent_hash_audit()).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_chash_minimal_movement(ray_session, con):
    """Consistent hashing's guarantee: keys moved <= keys total, and the
    union of moves equals exactly the keys now owned by the new shard."""
    from polylabel_rs_ray.pipelines.queries_ext82 import (
        MASK63, NEW_SHARD, RING_SHARDS, _owner_of, _ring_points,
        q_consistent_hash_audit,
    )
    import hashlib

    d = q_consistent_hash_audit(SF).to_pandas()
    total = int(d["n_keys"].sum())
    moved = int(d["n_moved"].sum())
    assert 0 <= moved < total
    users = con.execute(
        "SELECT DISTINCT user_id FROM events").df()["user_id"].to_numpy()
    kh = np.array([int.from_bytes(
        hashlib.md5(f"user:{u}".encode()).digest()[8:], "little") & MASK63
        for u in users], dtype=np.int64)
    new_pos, new_own = _ring_points(
        [f"shard_{i}" for i in range(RING_SHARDS)] + [NEW_SHARD])
    owners_new = _owner_of(kh, new_pos, new_own)
    assert moved == int((owners_new == NEW_SHARD).sum())


def test_ring_wrap_unit():
    """A key hashing past the last vnode wraps to the ring's first vnode."""
    from polylabel_rs_ray.pipelines.queries_ext82 import (
        RING_SHARDS, _owner_of, _ring_points,
    )

    pos, own = _ring_points([f"shard_{i}" for i in range(RING_SHARDS)])
    beyond = np.array([int(pos[-1]) + 1], dtype=np.int64)
    assert _owner_of(beyond, pos, own)[0] == own[0]


def test_varint_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext82 import (
        SQL_VARINT_SIZE_ESTIMATE, q_varint_size_estimate,
    )

    d = q_varint_size_estimate(SF).to_pandas()
    o = con.execute(SQL_VARINT_SIZE_ESTIMATE).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_varint_bounds(ray_session):
    """Each delta costs 1..10 bytes; totals add the 8-byte user anchors."""
    from polylabel_rs_ray.pipelines.queries_ext82 import q_varint_size_estimate

    d = q_varint_size_estimate(SF).to_pandas().iloc[0]
    assert d["n_deltas"] <= d["delta_bytes"] <= 10 * d["n_deltas"]
    assert d["total_bytes"] == d["delta_bytes"] + 8 * d["n_users"]


def test_varint_partition_invariance(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext82 import q_varint_size_estimate

    a = _norm(q_varint_size_estimate(SF, n_parts=1).to_pandas())
    b = _norm(q_varint_size_estimate(SF, n_parts=6).to_pandas())
    assert a.equals(b)
