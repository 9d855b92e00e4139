"""Extension batch 141: common-neighbor scores + range partition audit."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_cn_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext141 import (
        SQL_COMMON_NEIGHBOR_SCORES, q_common_neighbor_scores,
    )

    d = q_common_neighbor_scores(SF).to_pandas()
    o = con.execute(SQL_COMMON_NEIGHBOR_SCORES).df()
    assert len(d) == len(o) == 20
    assert _norm(d).equals(_norm(o))


def test_cn_brute(ray_session, con):
    """networkx-free set twin over the full pair table."""
    from polylabel_rs_ray.pipelines.queries_ext141 import (
        q_common_neighbor_scores,
    )

    d = q_common_neighbor_scores(SF).to_pandas()
    pairs = con.execute("""
        SELECT a.l_partkey pa, b.l_partkey pb
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    """).df()
    nbrs: dict = {}
    for r in pairs.itertuples():
        nbrs.setdefault(r.pa, set()).add(r.pb)
        nbrs.setdefault(r.pb, set()).add(r.pa)
    for r in d.itertuples():
        cn = len((nbrs[r.part_a] - {r.part_b})
                 & (nbrs[r.part_b] - {r.part_a}))
        assert r.common_neighbors == cn
        # endpoints of a top pair are adjacent by construction
        assert r.part_b in nbrs[r.part_a]
    # top pairs are ordered by the deterministic contract
    n = d["n_pairs"].to_numpy()
    assert (np.diff(n) <= 0).all()


def test_range_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext141 import (
        SQL_RANGE_PARTITION_AUDIT, q_range_partition_audit,
    )

    d = q_range_partition_audit(SF).to_pandas()
    o = con.execute(SQL_RANGE_PARTITION_AUDIT).df()
    assert len(d) == len(o) == 16
    assert _norm(d).equals(_norm(o))


def test_range_partition_properties(ray_session, con):
    """Counts total to the table size; min/max columns are constant and
    correct; every range is non-empty on this uniform stream."""
    from polylabel_rs_ray.pipelines.queries_ext141 import (
        q_range_partition_audit,
    )

    d = q_range_partition_audit(SF).to_pandas()
    total = con.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    assert int(d["n_rows"].sum()) == total
    assert d["min_rows"].nunique() == 1
    assert d["max_rows"].nunique() == 1
    assert d["min_rows"].iloc[0] == d["n_rows"].min()
    assert d["max_rows"].iloc[0] == d["n_rows"].max()
    assert (d["n_rows"] > 0).all()
