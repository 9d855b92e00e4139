"""Extension batch 38: k-anonymity audit."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return c


def _sorted(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_k_anonymity_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext38 import (
        SQL_K_ANONYMITY_AUDIT, q_k_anonymity_audit,
    )

    d = _sorted(q_k_anonymity_audit(SF).to_pandas())
    o = con.execute(SQL_K_ANONYMITY_AUDIT).df()
    o = _sorted(o.astype(d.dtypes.to_dict()))
    assert len(d) == len(o) > 0
    assert d.equals(o)


def test_k_anonymity_semantics(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext38 import (
        K_ANON, q_k_anonymity_audit,
    )

    df = q_k_anonymity_audit(SF).to_pandas()
    # one row per user
    n_users = con.execute("SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    assert len(df) == n_users == df["user_id"].nunique()
    # class_n really is the equivalence-class size, flag is consistent
    sizes = df.groupby(["top_type", "abucket"]).size()
    for (tt, ab), g in df.groupby(["top_type", "abucket"]):
        assert (g["class_n"] == sizes.loc[(tt, ab)]).all()
    assert ((df["class_n"] >= K_ANON) == (df["meets_k"] == 1)).all()
    # dominant type is really the user's modal type (spot check)
    some = df.sample(5, random_state=3)
    for _, row in some.iterrows():
        top = con.execute(
            "SELECT event_type FROM events WHERE user_id = ? "
            "GROUP BY event_type ORDER BY COUNT(*) DESC, event_type LIMIT 1",
            [int(row["user_id"])],
        ).fetchone()[0]
        assert top == row["top_type"]


def test_k_anonymity_partition_invariant(ray_session):
    from polylabel_rs_ray.pipelines.queries_ext38 import q_k_anonymity_audit

    a = _sorted(q_k_anonymity_audit(SF, n_parts=1).to_pandas())
    b = _sorted(q_k_anonymity_audit(SF, n_parts=6).to_pandas())
    assert a.equals(b)
