"""Hypothesis property tests for the later continuation kernels: banded
Levenshtein, weighted median, HLL register math."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


def _chars(strs):
    enc = [s.encode() for s in strs]
    lens = np.array([len(e) for e in enc], dtype=np.int64)
    maxlen = max(1, int(lens.max()) if len(lens) else 1)
    chars = np.zeros((len(strs), maxlen), dtype=np.uint8)
    for i, e in enumerate(enc):
        chars[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
    return chars, lens


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.text(alphabet="abc", max_size=25), min_size=2, max_size=12),
    st.integers(1, 10),
)
def test_banded_levenshtein_exact_within_threshold(strs, d):
    from polylabel_rs_ray.pipelines.queries_ext5 import _levenshtein_pairs_banded

    chars, lens = _chars(strs)
    pairs = [
        (i, j)
        for i in range(len(strs))
        for j in range(len(strs))
        if abs(lens[i] - lens[j]) <= d
    ]
    if not pairs:
        return
    ia = np.array([p[0] for p in pairs])
    ib = np.array([p[1] for p in pairs])
    band = _levenshtein_pairs_banded(chars[ia], lens[ia], chars[ib], lens[ib], d)
    for (i, j), got in zip(pairs, band):
        true = _lev(strs[i], strs[j])
        if true <= d:
            assert got == true, (strs[i], strs[j], d, got, true)
        else:
            assert got > d, (strs[i], strs[j], d, got, true)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(1, 7)),
        min_size=1,
        max_size=150,
    )
)
def test_weighted_median_matches_expansion(ray_session, tmp_path_factory, rows):
    import os

    import pyarrow.parquet as pq

    from polylabel_rs_ray.pipelines.queries_ext18 import q_weighted_median_price

    c = np.array([r[0] for r in rows], dtype=np.int64)
    w = np.array([r[1] for r in rows], dtype=np.int64)
    d = str(tmp_path_factory.mktemp("wm"))
    pq.write_table(
        pa.table({
            "l_extendedprice": pa.array(c / 100.0, type=pa.float64()),
            "l_quantity": pa.array(w.astype(np.float64)),
        }),
        os.path.join(d, "lineitem.parquet"),
    )
    got = int(q_weighted_median_price(d).to_pandas()["wmedian_cents"].iloc[0])
    expanded = np.sort(np.repeat(c, w))
    want = int(expanded[(len(expanded) + 1) // 2 - 1])
    assert got == want, (len(rows), got, want)


def test_hll_union_is_register_max():
    # |A ∪ B| estimated from max(regs_A, regs_B) equals sketching A ∪ B
    # directly — the losslessness the overlap op relies on (checked on
    # the production md5 hash chain)
    from polylabel_rs_ray.pipelines.queries import _hll_md5_reg_rho
    from polylabel_rs_ray.pipelines.queries_ext15 import HLL_P

    m = 1 << HLL_P
    rng = np.random.default_rng(31)

    def regs(vals):
        r = np.zeros(m, dtype=np.int64)
        reg, rho = _hll_md5_reg_rho(vals.astype(np.int64))
        np.maximum.at(r, reg, rho)
        return r

    a = rng.integers(0, 10_000, 3000)
    b = rng.integers(5_000, 15_000, 3000)
    assert np.array_equal(
        np.maximum(regs(a), regs(b)), regs(np.concatenate([a, b]))
    )
