"""Extension batch 106: part-graph BFS hops + exact Spearman correlation."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem",):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_bfs_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext106 import (
        SQL_PART_BFS_HOPS, q_part_bfs_hops,
    )

    d = q_part_bfs_hops(SF).to_pandas()
    o = con.execute(SQL_PART_BFS_HOPS).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_bfs_layer_structure(ray_session):
    """Source at hop 0; hop k>0 nodes must each have a hop k-1 neighbor
    (BFS layer invariant, checked on the materialized edge set)."""
    from polylabel_rs_ray.pipelines.queries_ext106 import q_part_bfs_hops
    from polylabel_rs_ray.pipelines.queries import q_part_pair_counts

    d = q_part_bfs_hops(SF).to_pandas()
    assert (d["hops"] == 0).sum() == 1
    src = int(d.loc[d["hops"] == 0, "part_node"].iloc[0])
    assert src == d["part_node"].min()
    e = q_part_pair_counts(SF).to_pandas()
    nbrs = {}
    for a, b in zip(e["part_a"], e["part_b"]):
        nbrs.setdefault(int(a), set()).add(int(b))
        nbrs.setdefault(int(b), set()).add(int(a))
    dist = dict(zip(d["part_node"].astype(int), d["hops"].astype(int)))
    for node, h in dist.items():
        if h > 0:
            assert min(dist[n] for n in nbrs[node] if n in dist) == h - 1


def test_bfs_partition_invariance(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext106 import q_part_bfs_hops

    a = _norm(q_part_bfs_hops(SF, n_parts=2).to_pandas())
    b = _norm(q_part_bfs_hops(SF, n_parts=13).to_pandas())
    assert a.equals(b)


def test_spearman_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext106 import (
        SQL_QTY_DISCOUNT_SPEARMAN, q_qty_discount_spearman,
    )

    d = q_qty_discount_spearman(SF).to_pandas()
    o = con.execute(SQL_QTY_DISCOUNT_SPEARMAN).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_spearman_vs_scipy_formula(ray_session):
    """Pin the tie-corrected math against a brute-force average-rank
    Pearson computed row-by-row in pure Python floats."""
    import numpy as np
    import pyarrow.parquet as pq

    from polylabel_rs_ray.pipelines.queries_ext106 import (
        q_qty_discount_spearman,
    )

    t = pq.read_table(f"{SF}/lineitem.parquet",
                      columns=["l_quantity", "l_discount"])
    q = np.round(t.column("l_quantity").to_numpy()).astype(np.int64)
    dd = np.round(t.column("l_discount").to_numpy() * 100).astype(np.int64)

    def avg_ranks(v):
        order = np.argsort(v, kind="stable")
        r = np.empty(len(v), dtype=np.float64)
        sv = v[order]
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            r[order[i:j]] = (i + j + 1) / 2.0
            i = j
        return r

    rx, ry = avg_ranks(q), avg_ranks(dd)
    brute = np.corrcoef(rx, ry)[0, 1]
    d = q_qty_discount_spearman(SF).to_pandas()
    assert abs(float(d["rho"].iloc[0]) - brute) < 1e-9
    assert -1.0 <= float(d["rho"].iloc[0]) <= 1.0
