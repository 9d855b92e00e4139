"""Extension batch 70: bitmask containment join + raster local maxima."""

import duckdb
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


def test_containment_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext70 import (
        SQL_TYPESET_CONTAINMENT_PAIRS, q_typeset_containment_pairs,
    )

    d = q_typeset_containment_pairs(SF)
    o = con.execute(SQL_TYPESET_CONTAINMENT_PAIRS).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_containment_is_strict_subset(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext70 import (
        q_typeset_containment_pairs,
    )

    d = q_typeset_containment_pairs(SF)
    for _, r in d.iterrows():
        a, b = int(r["mask_a"]), int(r["mask_b"])
        assert a != b and (a & b) == a
        assert r["n_pairs"] >= 1


def test_containment_transitivity(ray_session):
    """If (a ⊂ b) and (b ⊂ c) appear, (a ⊂ c) must appear too."""
    from polylabel_rs_ray.pipelines.queries_ext70 import (
        q_typeset_containment_pairs,
    )

    d = q_typeset_containment_pairs(SF)
    pairs = set(zip(d["mask_a"].astype(int), d["mask_b"].astype(int)))
    for a, b in pairs:
        for b2, c in pairs:
            if b2 == b:
                assert (a, c) in pairs


def test_local_maxima_matches_oracle(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext70 import (
        _sql_tile_local_maxima, q_tile_local_maxima,
    )

    d = q_tile_local_maxima(SF)
    o = con.execute(_sql_tile_local_maxima()).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_local_maxima_are_strict(ray_session, con):
    """Re-verify peaks against the full cell histogram in SQL: every
    returned peak strictly dominates its 8-neighborhood."""
    from polylabel_rs_ray.pipelines.queries_ext70 import (
        TILE_SIDE, q_tile_local_maxima,
    )
    from polylabel_rs_ray.pipelines.queries import _sql_dyadic_labels_cte

    d = q_tile_local_maxima(SF)
    hist = con.execute(f"""
        WITH labels AS ({_sql_dyadic_labels_cte()})
        SELECT CAST(FLOOR(label_x / {TILE_SIDE!r}) AS BIGINT) AS cx,
               CAST(FLOOR(label_y / {TILE_SIDE!r}) AS BIGINT) AS cy,
               COUNT(*) AS n
        FROM labels GROUP BY 1, 2""").df()
    n_of = {(int(r.cx), int(r.cy)): int(r.n) for r in hist.itertuples()}
    assert len(d) >= 1
    for _, r in d.iterrows():
        cx, cy, n = int(r["cx"]), int(r["cy"]), int(r["n_points"])
        assert n_of[(cx, cy)] == n
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) != (0, 0):
                    assert n > n_of.get((cx + dx, cy + dy), 0)
