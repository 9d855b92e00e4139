"""Extension batch 94: spatial centers + Benford first-digit audit."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "documents"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_center_matches_oracle(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext94 import (
        _sql_spatial_center_stats, q_spatial_center_stats,
    )

    d = q_spatial_center_stats(SF)
    o = con.execute(_sql_spatial_center_stats()).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_center_median_within_range(ray_session):
    """Medians are realized coordinates; the mean center lies inside the
    point cloud's bbox."""
    from polylabel_rs_ray.pipelines.queries import _dyadic_labeled
    from polylabel_rs_ray.pipelines.queries_ext94 import (
        q_spatial_center_stats,
    )

    d = q_spatial_center_stats(SF).iloc[0]
    pts = _dyadic_labeled(SF).to_pandas()
    assert d["median_x"] in set(pts["label_x"])
    assert d["median_y"] in set(pts["label_y"])
    mx = d["sum_x"] / d["n_points"]
    my = d["sum_y"] / d["n_points"]
    assert pts["label_x"].min() <= mx <= pts["label_x"].max()
    assert pts["label_y"].min() <= my <= pts["label_y"].max()


def test_benford_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext94 import (
        SQL_BENFORD_AUDIT, q_benford_audit,
    )

    d = q_benford_audit(SF).to_pandas()
    o = con.execute(SQL_BENFORD_AUDIT).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_benford_structure(ray_session, con):
    """Digits 1-9 only; masses sum to the nonzero-total order count."""
    from polylabel_rs_ray.pipelines.queries_ext94 import q_benford_audit

    d = q_benford_audit(SF).to_pandas()
    assert d["digit"].between(1, 9).all()
    total = con.execute(
        "SELECT COUNT(*) FROM orders "
        "WHERE CAST(ROUND(o_totalprice*100) AS BIGINT) <> 0").fetchone()[0]
    assert int(d["n_orders"].sum()) == total
