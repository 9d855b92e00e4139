"""Extension batch 157: squared-Euclidean DT + phrase screening."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_sedt_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext157 import (
        _sql_tile_sedt, q_tile_sedt,
    )

    d = q_tile_sedt(SF).to_pandas()
    o = con.execute(_sql_tile_sedt()).df()
    assert len(d) == len(o) == 1024
    assert _norm(d).equals(_norm(o))


def test_sedt_bruteforce_and_metric_sandwich(ray_session):
    """Third implementation (dense min over occupied) plus the metric
    sandwich vs the Chebyshev transform: dt_inf^2 <= sedt <= 2*dt_inf^2."""
    from polylabel_rs_ray.pipelines.queries_ext156 import (
        _lattice, q_tile_chebyshev_dt,
    )
    from polylabel_rs_ray.pipelines.queries_ext157 import q_tile_sedt

    d = q_tile_sedt(SF).to_pandas()
    lat = _lattice(SF)
    n = lat.shape[0]
    ox, oy = np.nonzero(lat > 0)
    got = np.zeros((n, n), dtype=np.int64)
    got[d["ix"].to_numpy(), d["iy"].to_numpy()] = d["sedt"].to_numpy()
    for x in range(n):
        for y in range(n):
            assert got[x, y] == ((ox - x) ** 2 + (oy - y) ** 2).min()
    assert np.array_equal(got == 0, lat > 0)
    cd = q_tile_chebyshev_dt(SF).to_pandas()
    dt = np.zeros((n, n), dtype=np.int64)
    dt[cd["ix"].to_numpy(), cd["iy"].to_numpy()] = cd["dt"].to_numpy()
    assert np.all(dt * dt <= got)
    assert np.all(got <= 2 * dt * dt)


def test_phrase_screen_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext157 import (
        SCREEN_PATTERNS, _sql_phrase_screen_counts, q_phrase_screen_counts,
    )

    d = q_phrase_screen_counts(SF).to_pandas()
    o = con.execute(_sql_phrase_screen_counts()).df()
    assert len(d) == len(o) == len(SCREEN_PATTERNS)
    assert _norm(d).equals(_norm(o))
    # the sub-word fragment patterns must actually fire on this corpus
    hits = dict(zip(d["pattern"], d["total_hits"]))
    assert hits["ow"] > hits["slow"] > 0  # 'ow' also hits row/window
    assert hits["key"] > 0 and hits["art"] > 0


def test_phrase_patterns_are_border_free():
    """The no-overlap precondition: no pattern has a proper border, so
    pyarrow count_substring and the SQL REPLACE count provably agree."""
    from polylabel_rs_ray.pipelines.queries_ext157 import SCREEN_PATTERNS

    for p in SCREEN_PATTERNS:
        for k in range(1, len(p)):
            assert p[:k] != p[-k:], (p, k)


def test_phrase_screen_python_recount(ray_session):
    """Independent scalar recount with str.count on the raw table."""
    import pyarrow.parquet as pq

    from polylabel_rs_ray.pipelines.queries_ext157 import (
        SCREEN_PATTERNS, q_phrase_screen_counts,
    )

    d = q_phrase_screen_counts(SF).to_pandas().set_index("pattern")
    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    for p in SCREEN_PATTERNS:
        per = [t.count(p) for t in texts]
        assert d.loc[p, "total_hits"] == sum(per)
        assert d.loc[p, "n_docs"] == sum(1 for c in per if c > 0)
