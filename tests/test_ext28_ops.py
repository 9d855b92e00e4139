"""Extension batch 28: triangle counting (compact-forward)."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")
    return c


def test_triangle_parts_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext28 import (
        SQL_TRIANGLE_PARTS, q_triangle_parts,
    )

    d = q_triangle_parts(SF).to_pandas()
    o = con.execute(SQL_TRIANGLE_PARTS).df()
    cols = sorted(d.columns)
    a = d[cols].sort_values(cols).reset_index(drop=True)
    b = o[cols].astype(a.dtypes.to_dict()).sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert a.equals(b)
    # corner-count identity: the per-part counts sum to 3x the triangle total
    assert a["n_tri"].sum() % 3 == 0


def test_triangle_parts_partition_invariant(ray_session):
    """Wedge partitioning is a pure re-bucketing: results must not depend
    on the partition count."""
    from polylabel_rs_ray.pipelines.queries_ext28 import q_triangle_parts

    a = (q_triangle_parts(SF, n_parts=1).to_pandas()
         .sort_values("part_key").reset_index(drop=True))
    b = (q_triangle_parts(SF, n_parts=7).to_pandas()
         .sort_values("part_key").reset_index(drop=True))
    assert a.equals(b)


def test_triangle_bruteforce_small(ray_session, con):
    """Total triangles equal a brute-force adjacency-matrix trace count."""
    from polylabel_rs_ray.pipelines.queries_ext28 import q_triangle_parts

    pairs = con.execute(
        "SELECT a.l_partkey pa, b.l_partkey pb FROM lineitem a JOIN lineitem b"
        " ON a.l_orderkey=b.l_orderkey AND a.l_partkey < b.l_partkey GROUP BY 1,2"
    ).fetchnumpy()
    ea, eb = pairs["pa"].astype(np.int64), pairs["pb"].astype(np.int64)
    nodes, inv = np.unique(np.concatenate([ea, eb]), return_inverse=True)
    n = len(nodes)
    A = np.zeros((n, n), dtype=np.int64)
    A[inv[: len(ea)], inv[len(ea):]] = 1
    A = A + A.T
    total = int(np.trace(A @ A @ A)) // 6
    got = q_triangle_parts(SF).to_pandas()["n_tri"].sum() // 3
    assert got == total
