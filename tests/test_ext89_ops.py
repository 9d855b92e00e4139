"""Extension batch 89: FK orphan audit + Pareto concentration point."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "supplier", "part",
              "nation", "region"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_fk_audit_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext89 import (
        _sql_fk_orphan_audit, q_fk_orphan_audit,
    )

    d = q_fk_orphan_audit(SF)
    o = con.execute(_sql_fk_orphan_audit()).df()
    assert len(d) == len(o) == 6
    assert _norm(d).equals(_norm(o))


def test_fk_audit_clean_schema(ray_session):
    """The synthetic star schema is referentially intact."""
    from polylabel_rs_ray.pipelines.queries_ext89 import q_fk_orphan_audit

    d = q_fk_orphan_audit(SF)
    assert (d["n_orphans"] == 0).all()
    assert (d["n_rows"] > 0).all()


def test_fk_audit_detects_planted_orphans():
    """The orphan test itself works: a child key missing from the parent
    array is flagged."""
    import numpy as np

    pk = np.array([1, 2, 5, 9], dtype=np.int64)
    child = np.array([1, 3, 5, 10, 9, 0], dtype=np.int64)
    pos = np.clip(np.searchsorted(pk, child), 0, len(pk) - 1)
    orphan = pk[pos] != child
    assert orphan.tolist() == [False, True, False, True, False, True]


def test_pareto_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext89 import (
        SQL_PARETO_POINT, q_pareto_point,
    )

    d = q_pareto_point(SF)
    o = con.execute(SQL_PARETO_POINT).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_pareto_threshold_semantics(ray_session):
    """k is minimal: coverage at k >= 4/5, coverage at k-1 < 4/5."""
    from polylabel_rs_ray.pipelines.queries_ext89 import (
        PARETO_DEN, PARETO_NUM, q_pareto_point,
    )

    d = q_pareto_point(SF).iloc[0]
    assert d["covered_micro"] * PARETO_DEN >= d["total_micro"] * PARETO_NUM
    assert 1 <= d["k_top"] <= d["n_parts"]
