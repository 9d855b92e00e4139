"""Extension batch 180: rectangle union area + region adjacency graph."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents",):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_union_area_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext180 import (
        _sql_rect_union_area, q_rect_union_area,
    )

    d = q_rect_union_area(SF).to_pandas()
    o = con.execute(_sql_rect_union_area()).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))
    row = d.iloc[0]
    # overlap exists AND union is nondegenerate
    assert 0 < int(row["area_union"]) <= int(row["area_sum"])


def test_union_area_pixel_twin(ray_session, con):
    """Brute-force pixel rasterization of the union (1000+4 grid)."""
    from polylabel_rs_ray.pipelines.queries_ext180 import (
        RECT_FIXTURE_IDX, RECT_W, q_rect_union_area,
    )
    from polylabel_rs_ray.sources import docs as docs_mod

    d = q_rect_union_area(SF).to_pandas().iloc[0]
    ids = con.execute("SELECT doc_id FROM documents").df()["doc_id"] \
        .to_numpy().astype(np.int64)
    ids = ids[ids % docs_mod.N_FIXTURES == RECT_FIXTURE_IDX]
    dx = (ids * docs_mod.OFF_X_MULT) % docs_mod.OFF_MOD
    dy = (ids * docs_mod.OFF_Y_MULT) % docs_mod.OFF_MOD
    rects = set(zip(dx.tolist(), dy.tolist()))
    grid = np.zeros((docs_mod.OFF_MOD + RECT_W,
                     docs_mod.OFF_MOD + RECT_W), dtype=bool)
    for x, y in rects:
        grid[x:x + RECT_W, y:y + RECT_W] = True
    assert int(d["n_rects"]) == len(rects)
    assert int(d["area_union"]) == int(grid.sum())
    assert int(d["area_sum"]) == len(rects) * RECT_W * RECT_W


def test_rag_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext180 import (
        _sql_region_adjacency_graph, q_region_adjacency_graph,
    )

    d = q_region_adjacency_graph(SF).to_pandas()
    o = con.execute(_sql_region_adjacency_graph()).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_rag_properties(ray_session):
    """Complete pair set over the ext165 components; distances ≥ 2
    (cells at Chebyshev 1 would be 8-adjacent, but components are
    4-connected so Chebyshev-1 pairs across components CAN exist —
    assert only ≥ 1); symmetric-free canonical ordering; triangle
    inequality spot check."""
    from polylabel_rs_ray.pipelines.queries_ext165 import (
        q_tile_components,
    )
    from polylabel_rs_ray.pipelines.queries_ext180 import (
        q_region_adjacency_graph,
    )

    d = q_region_adjacency_graph(SF).to_pandas()
    comp = q_tile_components(SF).to_pandas()
    ids = sorted(comp["comp_id"].unique())
    k = len(ids)
    assert len(d) == k * (k - 1) // 2
    assert (d["comp_a"] < d["comp_b"]).all()
    assert (d["min_cheb"] >= 1).all()
    dist = {(int(r.comp_a), int(r.comp_b)): int(r.min_cheb)
            for r in d.itertuples()}

    def dd(a, b):
        if a == b:
            return 0
        return dist[(min(a, b), max(a, b))]

    # min-distance "almost" triangle inequality with diameter slack:
    # d(a,c) <= d(a,b) + diam(b) + d(b,c); use lattice size as slack
    n = 1 << 7
    for a in ids[:5]:
        for b in ids[:5]:
            for c in ids[:5]:
                assert dd(a, c) <= dd(a, b) + dd(b, c) + n
