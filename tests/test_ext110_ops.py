"""Extension batch 110: trigram novelty + exact two-sample KS test."""

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


def test_novelty_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext110 import (
        SQL_TRIGRAM_NOVELTY, q_trigram_novelty,
    )

    d = q_trigram_novelty(SF).to_pandas()
    o = con.execute(SQL_TRIGRAM_NOVELTY).df()
    assert len(d) == len(o) >= 1
    assert _norm(d).equals(_norm(o))


def test_novelty_partition_invariance(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext110 import q_trigram_novelty

    a = _norm(q_trigram_novelty(SF, n_parts=2).to_pandas())
    b = _norm(q_trigram_novelty(SF, n_parts=13).to_pandas())
    assert a.equals(b)


def test_novelty_bounds_and_fires(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext110 import q_trigram_novelty

    d = q_trigram_novelty(SF).to_pandas()
    assert (d["n_unique"] <= d["n_shingles"]).all()
    assert (d["novelty"] >= 0).all() and (d["novelty"] <= 1).all()
    # the signal is non-degenerate on this corpus: unique shingles exist
    assert int(d["n_unique"].sum()) > 0


def test_ks_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext110 import (
        SQL_DOCLEN_KS_TEST, q_doclen_ks_test,
    )

    d = q_doclen_ks_test(SF).to_pandas()
    o = con.execute(SQL_DOCLEN_KS_TEST).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_ks_vs_brute_force(ray_session, con):
    """Pin against the classic two-pointer KS over the raw samples."""
    from polylabel_rs_ray.pipelines.queries_ext110 import q_doclen_ks_test

    a = sorted(con.execute(
        "SELECT n_chars FROM documents WHERE lang='en'").df().iloc[:, 0])
    b = sorted(con.execute(
        "SELECT n_chars FROM documents WHERE lang='de'").df().iloc[:, 0])
    na, nb = len(a), len(b)
    grid = sorted(set(a) | set(b))
    best = 0
    import bisect
    for v in grid:
        ca = bisect.bisect_right(a, v)
        cb = bisect.bisect_right(b, v)
        best = max(best, abs(ca * nb - cb * na))
    d = q_doclen_ks_test(SF).to_pandas()
    assert int(d["d_num"].iloc[0]) == best
    assert int(d["d_den"].iloc[0]) == na * nb
    assert 0.0 <= float(d["ks_d"].iloc[0]) <= 1.0
