"""Extension batch 181: Aho-Corasick links + Fenwick nodes."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "orders"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_ac_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext181 import (
        SQL_AHO_CORASICK_LINKS, q_aho_corasick_links,
    )

    d = q_aho_corasick_links(SF).to_pandas()
    o = con.execute(SQL_AHO_CORASICK_LINKS).df()
    assert len(d) == len(o) > 50
    assert _norm(d).equals(_norm(o))
    assert (d["fail_prefix"] != "").any()  # non-trivial links exist


def test_ac_definitional_properties(ray_session):
    """fail(u) is a node (or root), a PROPER suffix of u, and maximal:
    no longer proper suffix of u is a node.  Depth decreases along the
    chain and words are flagged exactly."""
    from polylabel_rs_ray.pipelines.queries_ext181 import (
        q_aho_corasick_links,
    )

    d = q_aho_corasick_links(SF).to_pandas()
    nodes = set(d["prefix"])
    words = set(d[d["is_word"] == 1]["prefix"])
    for r in d.itertuples():
        u, f = r.prefix, r.fail_prefix
        assert len(r.prefix) == int(r.depth)
        if f:
            assert f in nodes
            assert len(f) < len(u) and u.endswith(f)
        # maximality: every longer proper suffix is NOT a node
        for ln in range(len(f) + 1, len(u)):
            assert u[len(u) - ln:] not in nodes, (u, ln)
    # word flags: exactly the vocabulary
    for w in words:
        assert any(w == p for p in nodes)


def test_fenwick_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext181 import (
        SQL_FENWICK_NODES, q_fenwick_nodes,
    )

    d = q_fenwick_nodes(SF).to_pandas()
    o = con.execute(SQL_FENWICK_NODES).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_fenwick_query_path(ray_session, con):
    """Prefix sums via the parent chain (i -= lowbit) must equal the
    direct cumulative counts for EVERY rank."""
    from polylabel_rs_ray.pipelines.queries_ext181 import q_fenwick_nodes

    d = q_fenwick_nodes(SF).to_pandas().sort_values("idx")
    fen = np.r_[0, d["node_sum"].to_numpy().astype(np.int64)]
    daily = con.execute("""
        SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""").df()
    pref = np.r_[0, daily["n"].to_numpy().astype(np.int64).cumsum()]
    D = len(daily)
    for i in range(1, D + 1):
        s, j = 0, i
        while j > 0:
            s += int(fen[j])
            j -= j & (-j)
        assert s == int(pref[i]), i
