"""Extension batch 101: missing-hours audit + supplier HHI."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "lineitem"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_missing_hours_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext101 import (
        SQL_MISSING_HOURS_AUDIT, q_missing_hours_audit,
    )

    d = q_missing_hours_audit(SF)
    o = con.execute(SQL_MISSING_HOURS_AUDIT).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_missing_hours_invariants(ray_session):
    """The longest streak is bounded by the empty count; end hours are
    occupied by construction (grid bounds come from the data)."""
    from polylabel_rs_ray.pipelines.queries_ext101 import (
        q_missing_hours_audit,
    )

    d = q_missing_hours_audit(SF).iloc[0]
    assert 0 <= d["longest_empty_streak"] <= d["n_hours_empty"]
    assert d["n_hours_empty"] < d["n_hours_total"]


def test_hhi_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext101 import (
        SQL_SUPPLIER_HHI, q_supplier_hhi,
    )

    d = q_supplier_hhi(SF)
    o = con.execute(SQL_SUPPLIER_HHI).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_hhi_bounds(ray_session):
    """1/n <= HHI <= 1 (Cauchy-Schwarz lower bound, monopoly upper)."""
    from polylabel_rs_ray.pipelines.queries_ext101 import q_supplier_hhi

    d = q_supplier_hhi(SF).iloc[0]
    hhi = d["hhi_num"] / d["hhi_den"]
    n = int(d["n_suppliers"])
    assert 1.0 / n - 1e-12 <= hhi <= 1.0
