"""Extension batch 107: geohash interchange + lang histogram intersection."""

import duckdb
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


def test_geohash_matches_duckdb(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext107 import (
        _sql_geohash_cells, q_geohash_cells,
    )

    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    d = q_geohash_cells(SF).to_pandas()
    o = c.execute(_sql_geohash_cells()).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_geohash_bijective_and_consistent(ray_session):
    """At res=5 the 10 bits are exactly 2 chars: geohashes are distinct per
    tile, drawn from the base32 alphabet, parents are prefixes, and counts
    match tile_counts exactly."""
    from polylabel_rs_ray.pipelines.queries_ext107 import (
        GEOHASH32, q_geohash_cells,
    )
    from polylabel_rs_ray.pipelines.queries import q_tile_counts

    d = q_geohash_cells(SF).to_pandas()
    assert d["geohash"].is_unique
    assert d["geohash"].str.len().eq(2).all()
    assert all(ch in GEOHASH32 for s in d["geohash"] for ch in s)
    assert (d["geohash"].str[:1] == d["geohash_parent"]).all()
    t = q_tile_counts(SF).to_pandas()
    assert sorted(d["n_points"]) == sorted(t["n_points"])


def test_lang_intersection_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext107 import (
        SQL_LANG_HISTOGRAM_INTERSECTION, q_lang_histogram_intersection,
    )

    d = q_lang_histogram_intersection(SF).to_pandas()
    o = con.execute(SQL_LANG_HISTOGRAM_INTERSECTION).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_lang_intersection_bounds_and_symmetry(ray_session):
    """Histogram intersection lies in [0, 1]; num <= den exactly; every
    unordered lang pair appears exactly once with lang_a < lang_b."""
    from polylabel_rs_ray.pipelines.queries_ext107 import (
        q_lang_histogram_intersection,
    )

    d = q_lang_histogram_intersection(SF).to_pandas()
    assert (d["lang_a"] < d["lang_b"]).all()
    assert (d["num"] >= 0).all() and (d["num"] <= d["den"]).all()
    assert d.set_index(["lang_a", "lang_b"]).index.is_unique
    # the shared synthetic vocabulary makes every pair overlap heavily
    assert (d["overlap"] > 0.5).all()
