"""Extension batch 78: distributed RLE stats + edge orientation spectrum."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "documents"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_rle_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext78 import (
        SQL_RETURNFLAG_RLE_STATS, q_returnflag_rle_stats,
    )

    d = q_returnflag_rle_stats(SF)
    o = con.execute(SQL_RETURNFLAG_RLE_STATS).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_rle_partition_invariance_exercises_stitching(ray_session):
    """1, 3, and 32 partitions must agree — boundary runs merge exactly."""
    from polylabel_rs_ray.pipelines.queries_ext78 import q_returnflag_rle_stats

    a = _norm(q_returnflag_rle_stats(SF, n_parts=1))
    b = _norm(q_returnflag_rle_stats(SF, n_parts=3))
    c = _norm(q_returnflag_rle_stats(SF, n_parts=32))
    assert a.equals(b) and b.equals(c)


def test_rle_bounds(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext78 import q_returnflag_rle_stats

    d = q_returnflag_rle_stats(SF).iloc[0]
    n_vals = con.execute(
        "SELECT COUNT(DISTINCT l_returnflag) FROM lineitem").fetchone()[0]
    assert n_vals <= d["n_runs"] <= d["n_rows"]
    assert 1 <= d["max_run"] <= d["n_rows"]


def test_spectrum_matches_oracle(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext78 import (
        _sql_edge_orientation_spectrum, q_edge_orientation_spectrum,
    )

    d = q_edge_orientation_spectrum(SF).to_pandas()
    o = con.execute(_sql_edge_orientation_spectrum()).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_spectrum_engine_equals_twin_and_edges_conserved():
    from polylabel_rs_ray.pipelines.queries_ext78 import (
        _spectrum, _twin_spectrum,
    )
    from polylabel_rs_ray.pipelines.queries_ext import _norm_exterior
    from polylabel_rs_ray.sources.fixtures import DYADIC_FIXTURES, FIXTURES

    for name in DYADIC_FIXTURES:
        ext = _norm_exterior(
            [np.asarray(r, dtype=np.float64) for r in FIXTURES[name].rings])
        a, b = _spectrum(ext), _twin_spectrum(ext)
        assert a == b, name
        pts = ext[:-1] if np.array_equal(ext[0], ext[-1]) else ext
        # every non-degenerate edge lands in exactly one sector
        nz = sum(
            1 for i in range(len(pts))
            if not np.array_equal(pts[i], pts[(i + 1) % len(pts)])
        )
        assert sum(a) == nz, name


def test_spectrum_rectilinear_square():
    """An axis-aligned CCW square has one edge in each axis direction."""
    from polylabel_rs_ray.pipelines.queries_ext78 import _spectrum

    sq = np.array([(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0),
                   (0.0, 0.0)])
    assert _spectrum(sq) == [1, 0, 1, 0, 1, 0, 1, 0]
