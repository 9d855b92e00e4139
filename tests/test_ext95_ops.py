"""Extension batch 95: duplicate-shipment audit + vocab front coding."""

import duckdb
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


def test_dup_shipments_match_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext95 import (
        SQL_DUPLICATE_SHIPMENT_AUDIT, q_duplicate_shipment_audit,
    )

    d = q_duplicate_shipment_audit(SF).to_pandas()
    o = con.execute(SQL_DUPLICATE_SHIPMENT_AUDIT).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))
    assert int(d["n_pairs"].iloc[0]) > 0  # the audit fires on this data


def test_dup_shipments_partition_invariance(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext95 import (
        q_duplicate_shipment_audit,
    )

    a = _norm(q_duplicate_shipment_audit(SF, n_parts=1).to_pandas())
    b = _norm(q_duplicate_shipment_audit(SF, n_parts=7).to_pandas())
    assert a.equals(b)


def test_dup_shipments_bounds(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext95 import (
        q_duplicate_shipment_audit,
    )

    d = q_duplicate_shipment_audit(SF).to_pandas().iloc[0]
    # every pair involves 2 lineitems; involvement can overlap
    assert d["n_lineitems"] <= 2 * d["n_pairs"]
    assert d["n_parts_affected"] <= d["n_pairs"]


def test_front_coding_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext95 import (
        _sql_vocab_front_coding, q_vocab_front_coding,
    )

    d = q_vocab_front_coding(SF)
    o = con.execute(_sql_vocab_front_coding()).df()
    assert len(d) == len(o) == 1
    assert _norm(d).equals(_norm(o))


def test_front_coding_invariants(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext95 import q_vocab_front_coding

    d = q_vocab_front_coding(SF).iloc[0]
    assert 0 <= d["total_lcp"] < d["total_chars"]
    assert d["coded_chars"] == d["total_chars"] - d["total_lcp"]


def test_lcp_ladder_unit():
    """The prefix-equality ladder equals the direct LCP on tricky pairs."""
    cases = [("abc", "abd", 2), ("abc", "abc", 3), ("a", "b", 0),
             ("scan", "scanner", 4), ("", "x", 0), ("join", "joint", 4)]
    for a, b, want in cases:
        k = 0
        while k < min(len(a), len(b)) and a[k] == b[k]:
            k += 1
        assert k == want
        ladder = sum(
            1 for j in range(1, 17)
            if len(a) >= j and len(b) >= j and a[:j] == b[:j]
        )
        assert ladder == want
