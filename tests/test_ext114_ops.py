"""Extension batch 114: Gorilla delta-of-delta cost + candidate keys."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "orders"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_dod_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext114 import (
        SQL_DOD_ENCODING_COST, q_dod_encoding_cost,
    )

    d = q_dod_encoding_cost(SF).to_pandas()
    o = con.execute(SQL_DOD_ENCODING_COST).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_dod_bit_accounting(ray_session):
    """total_bits decomposes exactly: 64 per header row (min(n,2)) plus
    the bucket-count dot product with the Gorilla widths."""
    from polylabel_rs_ray.pipelines.queries_ext114 import q_dod_encoding_cost

    d = q_dod_encoding_cost(SF).to_pandas()
    hdr = np.minimum(d["n_events"], 2) * 64
    body = (d["n_dod0"] * 1 + d["n_dod9"] * 9 + d["n_dod12"] * 12 +
            d["n_dod16"] * 16 + d["n_dod36"] * 36)
    assert (d["total_bits"] == hdr + body).all()
    ndod = (d["n_dod0"] + d["n_dod9"] + d["n_dod12"] + d["n_dod16"] +
            d["n_dod36"])
    assert (ndod == np.maximum(d["n_events"] - 2, 0)).all()


def test_dod_partition_invariance(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext114 import q_dod_encoding_cost

    a = _norm(q_dod_encoding_cost(SF, n_parts=2).to_pandas())
    b = _norm(q_dod_encoding_cost(SF, n_parts=13).to_pandas())
    assert a.equals(b)


def test_candidate_keys_match_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext114 import (
        _sql_candidate_key_audit, q_candidate_key_audit,
    )

    d = q_candidate_key_audit(SF).to_pandas()
    o = con.execute(_sql_candidate_key_audit()).df()
    assert len(d) == len(o) == 6
    assert _norm(d).equals(_norm(o))


def test_candidate_keys_semantics(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext114 import (
        q_candidate_key_audit,
    )

    d = q_candidate_key_audit(SF).to_pandas().set_index("combo")
    assert d.loc["orderkey", "is_key"] == 1
    assert d.loc["orderkey", "max_mult"] == 1
    assert d.loc["status", "is_key"] == 0
    # every combo sees the same row count; distinct <= rows; key <=> equal
    assert d["n_rows"].nunique() == 1
    assert (d["n_distinct"] <= d["n_rows"]).all()
    assert ((d["n_distinct"] == d["n_rows"]) == (d["is_key"] == 1)).all()
