"""Extension batch 40: Count-Min sketch with exact oracle."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


def _sorted(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_cmsketch_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext40 import (
        SQL_CMSKETCH_WORD_COUNTS, q_cmsketch_word_counts,
    )

    d = _sorted(q_cmsketch_word_counts(SF).to_pandas())
    o = con.execute(SQL_CMSKETCH_WORD_COUNTS).df()
    o = _sorted(o.astype(d.dtypes.to_dict()))
    assert len(d) == len(o) > 0
    assert d.equals(o)


def test_cmsketch_guarantees(ray_session, con):
    """CM never underestimates, and the d x w error bound e*N/w holds with
    huge margin on this vocabulary."""
    from polylabel_rs_ray.pipelines.queries_ext40 import (
        CM_W, TOP_K, q_cmsketch_word_counts,
    )

    df = q_cmsketch_word_counts(SF).to_pandas()
    vocab = con.execute(
        "WITH toks AS (SELECT unnest(list_filter(regexp_split_to_array("
        "lower(text), '\\s+'), w -> w <> '')) AS tok FROM documents) "
        "SELECT COUNT(DISTINCT tok) FROM toks"
    ).fetchone()[0]
    assert len(df) == min(TOP_K, vocab)
    assert (df["cm_est"] >= df["exact_cnt"]).all()
    n_tokens = con.execute(
        "SELECT SUM(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),"
        " w -> w <> ''))) FROM documents"
    ).fetchone()[0]
    # standard bound: overestimate <= e * N / w with prob 1 - e^-d; here
    # deterministic hashes — assert the bound actually held
    bound = np.e * float(n_tokens) / CM_W
    assert ((df["cm_est"] - df["exact_cnt"]) <= bound).all()
    # the top words really are the corpus top-K by exact count
    top_ref = con.execute(
        "WITH toks AS (SELECT unnest(list_filter(regexp_split_to_array("
        "lower(text), '\\s+'), w -> w <> '')) AS tok FROM documents) "
        "SELECT tok FROM toks GROUP BY tok "
        f"ORDER BY COUNT(*) DESC, tok LIMIT {TOP_K}"
    ).df()["tok"]
    assert set(df["word"]) == set(top_ref)
