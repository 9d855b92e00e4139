"""Extension operators batch 10 (queries_ext9): grouped vector math —
centroids and VQ assignment bit-equal to DuckDB at sf0.001."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _compare(q, sql, con):
    res = q(SF)
    d = res.to_pandas() if hasattr(res, "to_pandas") else res
    if isinstance(d, pa.Table):
        d = d.to_pandas()
    o = con.execute(sql).df()
    cols = sorted(d.columns)
    a = d[cols].sort_values(cols).reset_index(drop=True)
    b = o[cols].astype(a.dtypes.to_dict()).sort_values(cols).reset_index(drop=True)
    assert len(a) > 0 and a.equals(b), sql
    return a


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    return c


def test_label_centroids_match_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext9 import (
        SQL_LABEL_CENTROIDS,
        q_label_centroids,
    )

    c = _compare(q_label_centroids, SQL_LABEL_CENTROIDS, con)
    n_labels = con.execute("SELECT COUNT(DISTINCT label) FROM embeddings").fetchone()[0]
    assert len(c) == n_labels * 64
    # n_vecs is constant across dims of a label and sums to the corpus
    per_label = c.groupby("label")["n_vecs"].nunique()
    assert (per_label == 1).all()
    total = con.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    assert c[c["dim"] == 1]["n_vecs"].sum() == total


def test_vq_assign_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext9 import SQL_VQ_ASSIGN, q_vq_assign

    a = _compare(q_vq_assign, SQL_VQ_ASSIGN, con)
    assert a["vec_id"].is_unique
    assert (a["dist_sq_micro"] >= 0).all()


def test_vq_assignment_beats_other_centroids(ray_session):
    # the assigned centroid's distance is minimal over ALL centroids
    from polylabel_rs_ray.pipelines.queries_ext9 import (
        centroid_matrix,
        q_vq_assign,
    )
    import pyarrow.parquet as pq

    labels, C = centroid_matrix(SF)
    a = q_vq_assign(SF).to_pandas().set_index("vec_id")
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = t.column("vec_id").to_numpy()
    emb = np.asarray(t.column("embedding").combine_chunks().values.to_numpy()).reshape(
        len(vid), -1
    )
    q = np.rint(emb.astype(np.float64) * 1e6).astype(np.int64)
    for i in range(0, len(vid), 97):
        d = ((q[i][None, :] - C) ** 2).sum(axis=1)
        row = a.loc[vid[i]]
        assert row["dist_sq_micro"] == d.min()
        assert row["nearest_label"] == labels[np.argmin(d)]
