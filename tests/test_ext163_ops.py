"""Extension batch 163: k-core bucket decomposition + autocomplete top-k."""

import duckdb
import numpy as np
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


@pytest.fixture(scope="module")
def edge_list(con):
    df = con.execute("""
        SELECT a.l_partkey pa, b.l_partkey pb
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2""").df()
    return (df["pa"].to_numpy().astype(np.int64),
            df["pb"].to_numpy().astype(np.int64))


def test_core_buckets_match_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext163 import (
        _sql_part_core_buckets, q_part_core_buckets,
    )

    d = q_part_core_buckets(SF).to_pandas()
    o = con.execute(_sql_part_core_buckets()).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))
    assert d["core_bucket"].nunique() >= 2  # non-trivial ladder


def test_core_defining_property(ray_session, edge_list):
    """Each rung's bucket-≥K set IS the K-core: induced min-degree ≥ K
    (coreness) and no strict superset of it within the graph has
    induced min-degree ≥ K when grown greedily (maximality via
    independent from-scratch peeling with a set-based loop)."""
    from polylabel_rs_ray.pipelines.queries_ext163 import (
        CORE_LADDER, q_part_core_buckets,
    )

    d = q_part_core_buckets(SF).to_pandas()
    bucket = dict(zip(d["part_key"], d["core_bucket"]))
    a, b = edge_list
    for k in CORE_LADDER:
        members = {v for v, bk in bucket.items() if bk >= k}
        if members:
            deg = {}
            for x, y in zip(a, b):
                if x in members and y in members:
                    deg[x] = deg.get(x, 0) + 1
                    deg[y] = deg.get(y, 0) + 1
            assert min(deg.get(v, 0) for v in members) >= k
        # independent peel from scratch (no warm start, set loop)
        rem = set(d["part_key"].tolist())
        while True:
            deg = {}
            for x, y in zip(a, b):
                if x in rem and y in rem:
                    deg[x] = deg.get(x, 0) + 1
                    deg[y] = deg.get(y, 0) + 1
            nxt = {v for v in rem if deg.get(v, 0) >= k}
            if nxt == rem:
                break
            rem = nxt
        assert rem == members, k


def test_autocomplete_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext163 import (
        SQL_AUTOCOMPLETE_TOPK, q_autocomplete_topk,
    )

    d = q_autocomplete_topk(SF).to_pandas()
    o = con.execute(SQL_AUTOCOMPLETE_TOPK).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_autocomplete_invariants(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext163 import (
        AUTOCOMPLETE_TOPK, q_autocomplete_topk,
    )

    d = q_autocomplete_topk(SF).to_pandas()
    assert (d.apply(lambda r: r["word"].startswith(r["prefix"]),
                    axis=1)).all()
    freq = con.execute("""
        SELECT w, COUNT(*) n FROM
        (SELECT UNNEST(string_split(text, ' ')) w FROM documents)
        GROUP BY 1""").df().set_index("w")["n"]
    for prefix, grp in d.groupby("prefix"):
        grp = grp.sort_values("rank")
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert len(grp) <= AUTOCOMPLETE_TOPK
        fs = grp["freq"].to_numpy()
        assert (np.diff(fs) <= 0).all()
        for row in grp.itertuples():
            assert int(freq[row.word]) == int(row.freq)
        # completeness: every vocab word with this prefix that beats the
        # last kept row (freq, then lex) is present
        last = grp.iloc[-1]
        if len(grp) == AUTOCOMPLETE_TOPK:
            better = [w for w in freq.index
                      if w.startswith(prefix) and w not in set(grp["word"])
                      and (int(freq[w]), ) > (int(last["freq"]), )]
            assert not better
