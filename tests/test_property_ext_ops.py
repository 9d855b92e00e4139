"""Hypothesis property tests for the pure per-block kernels added in the
round-2 continuation: local skyline, quantile-sketch block compression,
and the integer-histogram median's bin-boundary behavior."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

points = st.lists(
    st.tuples(st.integers(0, 200), st.integers(0, 60)), min_size=1, max_size=120
)


def _brute_skyline(rows):
    out = []
    for i, (p, s) in enumerate(rows):
        dominated = any(
            (q <= p and t >= s and (q < p or t > s)) for (q, t) in rows
        )
        if not dominated:
            out.append(i)
    return sorted(out)


@settings(max_examples=150, deadline=None)
@given(points)
def test_local_skyline_equals_brute_force(rows):
    from polylabel_rs_ray.pipelines.queries_ext4 import _local_skyline

    tbl = pa.table({
        "p_partkey": pa.array(range(len(rows)), type=pa.int64()),
        "p_size": pa.array([s for _, s in rows], type=pa.int64()),
        "price_cents": pa.array([p for p, _ in rows], type=pa.int64()),
    })
    got = sorted(_local_skyline(tbl).column("p_partkey").to_pylist())
    assert got == _brute_skyline(rows)


@settings(max_examples=150, deadline=None)
@given(points)
def test_two_phase_skyline_equals_one_shot(rows):
    from polylabel_rs_ray.pipelines.queries_ext4 import _local_skyline

    tbl = pa.table({
        "p_partkey": pa.array(range(len(rows)), type=pa.int64()),
        "p_size": pa.array([s for _, s in rows], type=pa.int64()),
        "price_cents": pa.array([p for p, _ in rows], type=pa.int64()),
    })
    cut = len(rows) // 2
    merged = pa.concat_tables(
        [_local_skyline(tbl.slice(0, cut)), _local_skyline(tbl.slice(cut))]
    )
    two = sorted(_local_skyline(merged).column("p_partkey").to_pylist())
    one = sorted(_local_skyline(tbl).column("p_partkey").to_pylist())
    assert two == one


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(-10_000, 10_000), min_size=1, max_size=5_000))
def test_sketch_block_rank_error_bound(vals):
    from polylabel_rs_ray.pipelines.queries_ext7 import SKETCH_B, sketch_block

    x = np.asarray(vals, dtype=np.int64)
    reps, w = sketch_block(x)
    assert w.sum() == len(x)
    assert len(reps) <= SKETCH_B
    s = np.sort(x)
    stride = -(-len(x) // SKETCH_B)
    cum = np.cumsum(w)
    # the i-th representative IS the sorted element at its cumulative
    # weight (the exact invariant; with ties the value-level searchsorted
    # rank interval is looser than this)
    assert np.array_equal(reps, s[cum - 1])
    # and every run is at most one stride long -> rank error <= stride
    assert (w <= stride).all()


def test_exact_median_bin_boundary_adversarials(ray_session):
    # values engineered to straddle integer-histogram bin edges — the
    # class of input that caught the interval-reconstruction bug
    import ray

    from polylabel_rs_ray.pipelines.queries_ext8 import MAD_BINS, exact_median_int

    span_vals = [
        np.array([0, MAD_BINS - 1, MAD_BINS, MAD_BINS + 1, 2 * MAD_BINS]),
        np.arange(MAD_BINS * 3),          # every bin populated
        np.full(999, 7),                  # single value
        np.array([0, 0, 0, 2**40, 2**40]),  # huge span, tiny count
        np.array([-5, -4, -3, -2, -1, 0, 1]),
    ]
    for vals in span_vals:
        ds = ray.data.from_arrow(pa.table({"c": pa.array(vals, type=pa.int64())}))
        got = exact_median_int(ds, "c")
        s = np.sort(vals)
        want = int(s[int(np.ceil(0.5 * len(s))) - 1])
        assert got == want, (vals[:8], got, want)
