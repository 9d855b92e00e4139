"""Extension batch 187: Z-function + RMQ sparse table."""

import duckdb
import numpy as np
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


def test_z_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext187 import (
        SQL_DOC_Z_FUNCTION, q_doc_z_function,
    )

    d = q_doc_z_function(SF).to_pandas()
    o = con.execute(SQL_DOC_Z_FUNCTION).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))
    assert (d["z"] > 0).any()


def test_z_definition(ray_session, con):
    """Naive per-position LCP recheck."""
    from polylabel_rs_ray.pipelines.queries_ext187 import q_doc_z_function

    d = q_doc_z_function(SF).to_pandas().sort_values("pos")
    s = con.execute("""
        SELECT text FROM documents
        WHERE doc_id = (SELECT MIN(doc_id) FROM documents)""").fetchone()[0]
    L = len(s)
    for i in range(L):
        if i == 0:
            want = 0
        else:
            want = 0
            while i + want < L and s[want] == s[i + want]:
                want += 1
        assert int(d["z"].iloc[i]) == want, i


def test_rmq_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext187 import (
        _sql_rmq_sparse_table, q_rmq_sparse_table,
    )

    d = q_rmq_sparse_table(SF).to_pandas()
    o = con.execute(_sql_rmq_sparse_table()).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_rmq_query_identity(ray_session, con):
    """O(1) RMQ: for deterministic probe ranges, min(st[k][l],
    st[k][r-2^k]) with k = floor(log2(len)) equals the direct min."""
    from polylabel_rs_ray.pipelines.queries_ext187 import (
        q_rmq_sparse_table,
    )

    d = q_rmq_sparse_table(SF).to_pandas()
    st = {(int(r.k), int(r.idx)): int(r.node_min) for r in d.itertuples()}
    daily = con.execute("""
        SELECT SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS cents
        FROM orders GROUP BY CAST(o_orderdate AS DATE)
        ORDER BY CAST(o_orderdate AS DATE)""").df()
    c = daily["cents"].to_numpy().astype(np.int64)
    D = len(c)
    # level-0 equals the series
    for i in range(D):
        assert st[(0, i)] == int(c[i])
    probes = [(0, D), (1, D // 2), (D // 3, D - 1), (5, 6), (7, 100)]
    for lo, hi in probes:
        if hi <= lo:
            continue
        ln = hi - lo
        k = ln.bit_length() - 1
        got = min(st[(k, lo)], st[(k, hi - (1 << k))])
        assert got == int(c[lo:hi].min()), (lo, hi)
