"""Extension batch 55: BM25 document retrieval for a fixed query."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


def test_bm25_search_matches_duckdb(ray_session, con):
    """Bit-exact including the float scores (rational idf, verbatim op
    order on both sides)."""
    from polylabel_rs_ray.pipelines.queries_ext55 import (
        _sql_bm25_search, q_bm25_search,
    )

    d = q_bm25_search(SF).to_pandas().sort_values("rank").reset_index(drop=True)
    o = con.execute(_sql_bm25_search()).df().sort_values("rank").reset_index(drop=True)
    assert len(d) == len(o) == 10
    cols = sorted(d.columns)
    assert d[cols].equals(o[cols].astype(d[cols].dtypes.to_dict()))


def test_bm25_search_ranking_properties(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext55 import (
        QUERY_TERMS, q_bm25_search,
    )

    df = q_bm25_search(SF).to_pandas().sort_values("rank")
    # scores descend, ranks are 1..10, every hit matches >= 1 query term
    s = df["score"].to_numpy()
    assert (np.diff(s) <= 0).all()
    assert list(df["rank"]) == list(range(1, 11))
    assert (df[["tf_data", "tf_query", "tf_table"]].sum(axis=1) > 0).all()
    # the top doc's score recomputes from its own moments
    row = df.iloc[0]
    n = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    stats = con.execute(
        "WITH w AS (SELECT list_filter(regexp_split_to_array(lower(text),"
        " '\\s+'), x -> x <> '') AS ws FROM documents) "
        "SELECT SUM(len(ws)), "
        + ", ".join(
            f"SUM(CASE WHEN len(list_filter(ws, w -> w = '{t}')) > 0"
            " THEN 1 ELSE 0 END)" for t in QUERY_TERMS
        )
        + " FROM w"
    ).fetchone()
    sdl, dfs = stats[0], stats[1:]
    avgdl = sdl / n
    expect = 0.0
    for tf, dfk in zip(
        (row["tf_data"], row["tf_query"], row["tf_table"]), dfs
    ):
        idf = (float(n - dfk) + 0.5) / (float(dfk) + 0.5)
        denom = float(tf) + 1.2 * ((1.0 - 0.75) + 0.75 * (float(row["dl"]) / avgdl))
        expect = expect + idf * ((float(tf) * (1.2 + 1.0)) / denom)
    assert row["score"] == expect
