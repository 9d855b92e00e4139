"""Extension batch 24: cross-document duplicated n-gram fraction."""

import duckdb
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


def test_cross_doc_ngram_dup_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext24 import (
        SQL_CROSS_DOC_NGRAM_DUP,
        q_cross_doc_ngram_dup,
    )

    res = q_cross_doc_ngram_dup(SF)
    d = res.to_pandas() if hasattr(res, "to_pandas") else res
    if isinstance(d, pa.Table):
        d = d.to_pandas()
    o = con.execute(SQL_CROSS_DOC_NGRAM_DUP).df()
    cols = sorted(d.columns)
    a = d[cols].sort_values(cols).reset_index(drop=True)
    b = o[cols].astype(a.dtypes.to_dict()).sort_values(cols).reset_index(drop=True)
    assert len(a) > 0 and a.equals(b)
    # invariants: dup count bounded by total; fraction is the exact ratio
    assert (a["n_dup"] <= a["n_tri"]).all()
    assert (a["dup_frac"] == a["n_dup"] / a["n_tri"]).all()


def test_cross_doc_ngram_dup_partition_invariant(ray_session):
    """Result must not depend on the trigram partition count (the exchange
    is a pure re-bucketing; df is computed per whole trigram)."""
    from polylabel_rs_ray.pipelines.queries_ext24 import q_cross_doc_ngram_dup

    a = (q_cross_doc_ngram_dup(SF, n_parts=1).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (q_cross_doc_ngram_dup(SF, n_parts=7).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)
