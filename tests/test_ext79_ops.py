"""Extension batch 79: KMV distinct sketch + Hilbert cell index."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "documents"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_kmv_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext79 import (
        SQL_KMV_DISTINCT_SKETCH, q_kmv_distinct_sketch,
    )

    d = q_kmv_distinct_sketch(SF)
    o = con.execute(SQL_KMV_DISTINCT_SKETCH).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_kmv_estimate_quality(ray_session):
    """(k-1) * 2^63 / kth is a sane estimate of the exact distinct count
    (within 3x here — k=16 has ~25% relative error at one sigma)."""
    from polylabel_rs_ray.pipelines.queries_ext79 import q_kmv_distinct_sketch

    d = q_kmv_distinct_sketch(SF).iloc[0]
    k, kth, exact = int(d["k"]), int(d["kth_min_hash"]), int(d["n_exact"])
    assert k >= 2 and kth > 0 and exact >= k
    est = (k - 1) * (1 << 63) / kth
    assert exact / 3 <= est <= exact * 3


def test_hilbert_matches_oracle(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext79 import (
        _sql_hilbert_cells, q_hilbert_cells,
    )

    d = q_hilbert_cells(SF).to_pandas()
    o = con.execute(_sql_hilbert_cells()).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))
    from polylabel_rs_ray.pipelines.queries import _dyadic_labeled

    assert int(d["n_points"].sum()) == _dyadic_labeled(SF).count()


def test_hilbert_is_bijective_on_grid():
    from polylabel_rs_ray.pipelines.queries_ext79 import (
        HILBERT_N, hilbert_xy2d,
    )

    xs, ys = np.meshgrid(np.arange(HILBERT_N), np.arange(HILBERT_N))
    d = hilbert_xy2d(xs.ravel(), ys.ravel())
    assert sorted(d.tolist()) == list(range(HILBERT_N * HILBERT_N))


def test_hilbert_locality():
    """Consecutive curve positions are grid neighbors (Manhattan dist 1) —
    the property that makes Hilbert ordering better than z-order."""
    from polylabel_rs_ray.pipelines.queries_ext79 import (
        HILBERT_N, hilbert_xy2d,
    )

    xs, ys = np.meshgrid(np.arange(HILBERT_N), np.arange(HILBERT_N))
    xs, ys = xs.ravel(), ys.ravel()
    d = hilbert_xy2d(xs, ys)
    order = np.argsort(d)
    dx = np.abs(np.diff(xs[order]))
    dy = np.abs(np.diff(ys[order]))
    assert ((dx + dy) == 1).all()
