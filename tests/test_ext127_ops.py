"""Extension batch 127: taxicab diameters + lang-centroid affinity."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_taxicab_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext127 import (
        _sql_taxicab_diameter_stats, q_taxicab_diameter_stats,
    )

    d = q_taxicab_diameter_stats(SF).to_pandas()
    o = con.execute(_sql_taxicab_diameter_stats()).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_taxicab_rotation_identity(ray_session):
    """The range identity equals the brute all-pairs L1/L∞ max, and the
    metric sandwich L∞ <= L1 <= 2·L∞ holds."""
    from polylabel_rs_ray.pipelines.queries_ext127 import (
        q_taxicab_diameter_stats,
    )
    from polylabel_rs_ray.sources.fixtures import DYADIC_FIXTURES, \
        FIXTURE_CYCLE, FIXTURES

    d = q_taxicab_diameter_stats(SF).to_pandas()
    assert (d["linf_diam"] <= d["l1_diam"]).all()
    assert (d["l1_diam"] <= 2 * d["linf_diam"]).all()
    by_fix = {int(k): g for k, g in d.groupby("fixture_idx")}
    for name in DYADIC_FIXTURES:
        fix = FIXTURE_CYCLE.index(name)
        ext = np.asarray(FIXTURES[name].rings[0], dtype=np.float64)
        l1 = max(abs(a[0] - b[0]) + abs(a[1] - b[1])
                 for a in ext for b in ext)
        li = max(max(abs(a[0] - b[0]), abs(a[1] - b[1]))
                 for a in ext for b in ext)
        g = by_fix[fix]
        assert (g["l1_diam"] == int(l1)).all()
        assert (g["linf_diam"] == int(li)).all()


def test_affinity_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext127 import (
        SQL_LANG_CENTROID_AFFINITY, q_lang_centroid_affinity,
    )

    d = q_lang_centroid_affinity(SF).to_pandas()
    o = con.execute(SQL_LANG_CENTROID_AFFINITY).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_affinity_brute(ray_session, con):
    """Counter twin: per-lang corpus counts then per-doc dot, plus the
    bound affinity <= n_tokens · max corpus count."""
    from collections import Counter

    from polylabel_rs_ray.pipelines.queries_ext127 import (
        q_lang_centroid_affinity,
    )

    d = q_lang_centroid_affinity(SF).to_pandas().set_index("doc_id")
    docs = con.execute("SELECT doc_id, lang, text FROM documents").df()
    cent: Counter = Counter()
    for r in docs.itertuples():
        for w in (r.text or "").lower().split():
            cent[(r.lang, w)] += 1
    mx = max(cent.values())
    for r in docs.itertuples():
        toks = (r.text or "").lower().split()
        aff = sum(cent[(r.lang, w)] for w in toks)
        row = d.loc[r.doc_id]
        assert row["affinity"] == aff
        assert row["n_tokens"] == len(toks)
        assert row["affinity"] <= len(toks) * mx
