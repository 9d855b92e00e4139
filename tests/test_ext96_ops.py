"""Extension batch 96: graph assortativity + inter-arrival CV^2."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_assortativity_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext96 import (
        SQL_PART_GRAPH_ASSORTATIVITY, q_part_graph_assortativity,
    )

    d = q_part_graph_assortativity(SF).to_pandas()
    o = con.execute(SQL_PART_GRAPH_ASSORTATIVITY).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_assortativity_coefficient_in_range(ray_session):
    """The Pearson coefficient assembled from the moments is in [-1, 1]."""
    from polylabel_rs_ray.pipelines.queries_ext96 import (
        q_part_graph_assortativity,
    )

    d = q_part_graph_assortativity(SF).to_pandas().iloc[0]
    m, s_uv, s_sum, s_sq = (int(d["m"]), int(d["s_uv"]), int(d["s_sum"]),
                            int(d["s_sq"]))
    assert m > 0
    # r = (s_uv/m - (s_sum/2m)^2) / (s_sq/2m - (s_sum/2m)^2)
    mean_sq = (s_sum / (2 * m)) ** 2
    num = s_uv / m - mean_sq
    den = s_sq / (2 * m) - mean_sq
    assert den >= 0
    if den > 0:
        assert -1.0 - 1e-9 <= num / den <= 1.0 + 1e-9


def test_cv2_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext96 import (
        SQL_INTERARRIVAL_CV2, q_interarrival_cv2,
    )

    d = q_interarrival_cv2(SF)
    o = con.execute(SQL_INTERARRIVAL_CV2).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_cv2_partition_invariance_exercises_stitching(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext96 import q_interarrival_cv2

    a = _norm(q_interarrival_cv2(SF, n_parts=1))
    b = _norm(q_interarrival_cv2(SF, n_parts=5))
    c = _norm(q_interarrival_cv2(SF, n_parts=16))
    assert a.equals(b) and b.equals(c)


def test_cv2_gap_accounting(ray_session, con):
    """n_gaps = n_events - 1 per type; sums are nonnegative."""
    from polylabel_rs_ray.pipelines.queries_ext96 import q_interarrival_cv2

    d = q_interarrival_cv2(SF).set_index("event_type")
    counts = con.execute(
        "SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1"
    ).df().set_index("event_type")
    for typ, row in d.iterrows():
        assert int(row["n_gaps"]) == int(counts.loc[typ, "n"]) - 1
        assert row["s1_ms"] >= 0 and row["s2_ms2"] >= 0
