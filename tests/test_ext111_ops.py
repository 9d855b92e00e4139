"""Extension batch 111: label dispersion + source trigram overlap matrix."""

import duckdb
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


def test_dispersion_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext111 import (
        _sql_label_dispersion, q_label_dispersion,
    )

    d = q_label_dispersion(SF).to_pandas()
    o = con.execute(_sql_label_dispersion()).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_dispersion_vs_brute_force(ray_session):
    """Pin the histogram prefix identity against the all-pairs loop."""
    from polylabel_rs_ray.pipelines.queries import q_label_dyadic
    from polylabel_rs_ray.pipelines.queries_ext111 import q_label_dispersion

    pts = q_label_dyadic(SF).to_pandas()
    d = q_label_dispersion(SF).to_pandas().set_index("fixture_idx")
    for fx, sub in pts.groupby("fixture_idx"):
        xs = sub["label_x"].to_numpy()
        ys = sub["label_y"].to_numpy()
        brute = 0
        for i in range(len(xs)):
            brute += int(sum(abs(xs[i] - xs[i + 1:]) + abs(ys[i] - ys[i + 1:])))
        assert int(d.loc[fx, "sum_manhattan"]) == brute
        assert int(d.loc[fx, "n_points"]) == len(xs)


def test_dispersion_sentinel_zero(ray_session):
    """The sentinel fixture collapses every label to (0,0): zero
    dispersion with many points."""
    from polylabel_rs_ray.pipelines.queries_ext111 import q_label_dispersion
    from polylabel_rs_ray.sources.fixtures import FIXTURE_CYCLE, FIXTURES

    d = q_label_dispersion(SF).to_pandas()
    sentinel_idx = [i for i, n in enumerate(FIXTURE_CYCLE)
                    if FIXTURES[n].kind == "sentinel"]
    hit = d[d["fixture_idx"].isin(sentinel_idx)]
    if len(hit):
        assert (hit["sum_manhattan"] == 0).all()
        assert (hit["mean_manhattan"] == 0.0).all()
    # non-sentinel fixtures must actually disperse
    rest = d[~d["fixture_idx"].isin(sentinel_idx)]
    assert (rest["sum_manhattan"] > 0).all()


def test_overlap_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext111 import (
        SQL_SOURCE_OVERLAP_MATRIX, q_source_overlap_matrix,
    )

    d = q_source_overlap_matrix(SF).to_pandas()
    o = con.execute(SQL_SOURCE_OVERLAP_MATRIX).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_overlap_partition_invariance(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext111 import (
        q_source_overlap_matrix,
    )

    a = _norm(q_source_overlap_matrix(SF, n_parts=2).to_pandas())
    b = _norm(q_source_overlap_matrix(SF, n_parts=13).to_pandas())
    assert a.equals(b)


def test_overlap_matrix_shape(ray_session):
    """All C(20,2) source pairs share something on this corpus (common
    vocabulary), pairs are ordered, counts positive."""
    from polylabel_rs_ray.pipelines.queries_ext111 import (
        q_source_overlap_matrix,
    )

    d = q_source_overlap_matrix(SF).to_pandas()
    assert len(d) == 190
    assert (d["source_a"] < d["source_b"]).all()
    assert (d["shared"] > 0).all()
