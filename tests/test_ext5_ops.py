"""Extension operators batch 6 (queries_ext5, LLM-corpus text ops):
bit-equal to their DuckDB oracles at sf0.001 plus kernel-level checks."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _compare(q, sql, con):
    res = q(SF)
    d = res.to_pandas() if hasattr(res, "to_pandas") else res
    if isinstance(d, pa.Table):
        d = d.to_pandas()
    o = con.execute(sql).df()
    cols = sorted(d.columns)
    a = d[cols].sort_values(cols).reset_index(drop=True)
    b = o[cols].astype(a.dtypes.to_dict()).sort_values(cols).reset_index(drop=True)
    assert len(a) > 0 and a.equals(b), sql
    return a


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["documents", "events"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _lev_scalar(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def test_levenshtein_pairs_matches_scalar_dp():
    from polylabel_rs_ray.pipelines.queries_ext5 import _levenshtein_pairs

    rng = np.random.default_rng(11)
    alphabet = "abcd"
    strs = [
        "".join(rng.choice(list(alphabet), size=rng.integers(0, 20)))
        for _ in range(40)
    ]
    ia = rng.integers(0, len(strs), 120)
    ib = rng.integers(0, len(strs), 120)
    enc = [s.encode() for s in strs]
    lens = np.array([len(e) for e in enc], dtype=np.int64)
    maxlen = max(1, int(lens.max()))
    chars = np.zeros((len(strs), maxlen), dtype=np.uint8)
    for i, e in enumerate(enc):
        chars[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
    got = _levenshtein_pairs(chars[ia], lens[ia], chars[ib], lens[ib])
    want = np.array([_lev_scalar(strs[x], strs[y]) for x, y in zip(ia, ib)])
    assert np.array_equal(got, want)


def test_levenshtein_banded_matches_full_within_threshold():
    from polylabel_rs_ray.pipelines.queries_ext5 import (
        _levenshtein_pairs,
        _levenshtein_pairs_banded,
    )

    rng = np.random.default_rng(13)
    strs = ["".join(rng.choice(list("ab"), size=rng.integers(0, 30))) for _ in range(50)]
    enc = [s.encode() for s in strs]
    lens = np.array([len(e) for e in enc], dtype=np.int64)
    maxlen = max(1, int(lens.max()))
    chars = np.zeros((len(strs), maxlen), dtype=np.uint8)
    for i, e in enumerate(enc):
        chars[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
    d = 8
    pairs = [
        (i, j)
        for i in range(len(strs))
        for j in range(len(strs))
        if abs(lens[i] - lens[j]) <= d
    ]
    ia = np.array([p[0] for p in pairs])
    ib = np.array([p[1] for p in pairs])
    full = _levenshtein_pairs(chars[ia], lens[ia], chars[ib], lens[ib])
    band = _levenshtein_pairs_banded(chars[ia], lens[ia], chars[ib], lens[ib], d)
    near = full <= d
    assert np.array_equal(band[near], full[near])  # exact within threshold
    assert (band[~near] > d).all()  # clamped beyond it


def test_gopher_signals_match_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext5 import (
        SQL_GOPHER_SIGNALS,
        q_gopher_signals,
    )

    g = _compare(q_gopher_signals, SQL_GOPHER_SIGNALS, con)
    assert (g["n_distinct"] <= g["n_words"]).all()
    assert (g["top_word_count"] >= 1).all()
    # a word appearing c times yields at most c adjacent bigram repeats
    assert (g["top_bigram_count"] <= g["n_words"]).all()
    n_docs = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert len(g) == n_docs


def test_edit_distance_dups_match_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext5 import (
        SQL_EDIT_DISTANCE_DUPS,
        q_edit_distance_dups,
    )

    e = _compare(q_edit_distance_dups, SQL_EDIT_DISTANCE_DUPS, con)
    assert (e["doc_a"] < e["doc_b"]).all()
    # exact duplicates (same text) must appear with dist 0
    dups = con.execute(
        "SELECT a.doc_id, b.doc_id FROM documents a JOIN documents b "
        "ON a.text = b.text AND a.doc_id < b.doc_id"
    ).df()
    if len(dups):
        zero = e[e["dist"] == 0]
        got = set(zip(zero["doc_a"], zero["doc_b"]))
        assert set(zip(dups.iloc[:, 0], dups.iloc[:, 1])) <= got


def test_heavy_hitters_match_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext5 import (
        SQL_HEAVY_HITTER_WORDS,
        q_heavy_hitter_words,
    )

    h = _compare(q_heavy_hitter_words, SQL_HEAVY_HITTER_WORDS, con)
    # the returned k words hold the k largest counts in the corpus
    top = con.execute(
        "SELECT MAX(n) FROM (SELECT COUNT(*) n FROM (SELECT "
        "UNNEST(string_split(text,' ')) w FROM documents) GROUP BY w)"
    ).fetchone()[0]
    assert h["n"].max() == top


def test_mg_partial_bounds_candidates():
    # the per-block summary never exceeds MG_CAPACITY rows and preserves
    # exact counts when the block vocabulary fits
    from polylabel_rs_ray.pipelines.queries_ext5 import MG_CAPACITY

    import polylabel_rs_ray.pipelines.queries_ext5 as m

    words = ["w%d" % (i % 300) for i in range(3000)]
    batch = pa.table({"text": [" ".join(words)]})
    out = None
    # call the inner partial through the public query path is heavy; build
    # the same logic inline via value_counts to check the bound
    flat, _, _ = m._word_lists(batch)
    import pyarrow.compute as pc

    vc = pc.value_counts(flat)
    assert len(vc) == 300  # 300 distinct > capacity only if capacity < 300
    assert MG_CAPACITY == 256
    counts = vc.field("counts").to_numpy()
    order = np.argsort(-counts, kind="stable")
    dec = counts[order[MG_CAPACITY]]
    est = counts[order[:MG_CAPACITY]] - dec
    assert (est >= 0).all() and len(est) <= MG_CAPACITY


def test_scrub_props_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext5 import (
        SQL_SCRUB_PROPS,
        q_scrub_props,
    )

    s = _compare(q_scrub_props, SQL_SCRUB_PROPS, con)
    assert not s["props_scrubbed"].str.contains(r"\d").any()
