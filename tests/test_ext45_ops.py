"""Extension batch 45: model-evaluation statistics (AUC, confusion)."""

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


def test_quality_auc_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext45 import (
        _sql_quality_auc, q_quality_auc,
    )

    d = q_quality_auc(SF).to_pandas()
    o = con.execute(_sql_quality_auc()).df()
    assert len(d) == len(o) == 1
    for col in ("n_pos", "n_neg", "num2"):
        assert int(d.iloc[0][col]) == int(o.iloc[0][col]), col
    assert d.iloc[0]["auc"] == o.iloc[0]["auc"]


def test_quality_auc_is_mann_whitney(ray_session, con):
    """Brute-force pairwise AUC (wins + half-ties over all pos x neg pairs)
    equals the histogram-rank computation.  The synthetic corpus draws lang
    labels independently of the text, so the CORRECT answer is near-chance —
    the eval op faithfully reports the absence of signal."""
    from polylabel_rs_ray.pipelines.queries_ext45 import q_quality_auc

    rows = con.execute(
        "SELECT 100 * len(list_filter(regexp_extract_all(lower(text), '\\S+'),"
        " t -> t IN ('the','and','of','to','a','in','is','it','that','for')))"
        " // GREATEST(len(regexp_extract_all(text, '\\S+')), 1)"
        " AS s, lang = 'en' AS pos FROM documents"
    ).df()
    pos = rows[rows["pos"]]["s"].to_numpy()
    neg = rows[~rows["pos"]]["s"].to_numpy()
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    auc_bf = (wins + 0.5 * ties) / (len(pos) * len(neg))

    got = q_quality_auc(SF).to_pandas().iloc[0]
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert np.isclose(got["auc"], auc_bf, rtol=0, atol=1e-12)
    assert 0.3 < got["auc"] < 0.7


def test_auc_from_hist_known_cases():
    """The rank identity on constructed histograms: perfect separation,
    perfect inversion, all-ties, and a hand-computed mixed case."""
    from polylabel_rs_ray.pipelines.queries_ext45 import auc_from_hist

    # scores ascending; negatives all below positives -> AUC 1
    assert auc_from_hist([0, 5], [3, 0])[3] == 1.0
    # positives all below negatives -> AUC 0
    assert auc_from_hist([5, 0], [0, 3])[3] == 0.0
    # everything tied on one score -> AUC 0.5
    assert auc_from_hist([4], [6])[3] == 0.5
    # mixed: pos at scores {1:1, 2:1}, neg at {0:1, 2:1}
    # pairs: (1>0)=1, (1 vs 2)=0, (2>0)=1, (2==2)=0.5 -> 2.5/4
    P, N, num2, auc = auc_from_hist([0, 1, 1], [1, 0, 1])
    assert (P, N) == (2, 2)
    assert auc == 2.5 / 4


def test_lang_confusion_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext45 import (
        _sql_lang_confusion, q_lang_confusion,
    )

    d = _sorted(q_lang_confusion(SF).to_pandas())
    o = con.execute(_sql_lang_confusion()).df()
    o = _sorted(o.astype(d.dtypes.to_dict()))
    assert len(d) == len(o) > 0
    assert d.equals(o)
    # totals == corpus size; marginals per true lang match the table
    n_docs = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert d["n"].sum() == n_docs
    marg = d.groupby("lang")["n"].sum().to_dict()
    truth = dict(
        con.execute("SELECT lang, COUNT(*) FROM documents GROUP BY 1").fetchall()
    )
    assert marg == truth
