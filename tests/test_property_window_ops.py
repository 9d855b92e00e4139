"""Property tests for the co-partitioned window / range-join operators:
random event streams, engine results vs driver-side brute force.  Exercises
partition boundaries (many users x few partitions) that the fixed test
tables cannot."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st


@st.composite
def event_stream(draw):
    n = draw(st.integers(min_value=4, max_value=120))
    users = draw(st.lists(st.integers(min_value=0, max_value=7),
                          min_size=n, max_size=n))
    # microsecond timestamps with deliberate collisions
    ts = draw(st.lists(st.integers(min_value=0, max_value=50_000_000),
                       min_size=n, max_size=n))
    kinds = draw(st.lists(st.sampled_from(["purchase", "view", "click"]),
                          min_size=n, max_size=n))
    vals = draw(st.lists(st.floats(min_value=0.0, max_value=100.0,
                                   allow_nan=False), min_size=n, max_size=n))
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.asarray(users, dtype=np.int64),
        "ts_us": np.asarray(ts, dtype=np.int64),
        "event_type": kinds,
        "value": vals,
    })


def _write_events(df: pd.DataFrame, tmpdir: str) -> str:
    import pyarrow.parquet as pq

    t = pa.table({
        "event_id": pa.array(df.event_id, type=pa.int64()),
        "ts": pa.array(df.ts_us.to_numpy().astype("datetime64[us]")),
        "user_id": pa.array(df.user_id, type=pa.int64()),
        "event_type": pa.array(df.event_type, type=pa.string()),
        "value": pa.array(df.value, type=pa.float64()),
    })
    pq.write_table(t, f"{tmpdir}/events.parquet")
    return tmpdir


@settings(max_examples=12, deadline=None)
@given(event_stream())
def test_rolling_matches_pandas_bruteforce(ray_session, tmp_path_factory, df):
    from polylabel_rs_ray.pipelines.queries import q_rolling_user_stats

    sf = _write_events(df, str(tmp_path_factory.mktemp("evroll")))
    got = (
        q_rolling_user_stats(sf, n_parts=3)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    df = df.sort_values(["user_id", "ts_us", "event_id"]).reset_index(drop=True)
    g = df.groupby("user_id")["value"]
    want = df.assign(
        prev_value=g.shift(1).fillna(0.0),
        roll_max=g.rolling(3, min_periods=1).max().reset_index(level=0, drop=True),
        roll_n=g.rolling(3, min_periods=1).count().reset_index(level=0, drop=True)
        .astype(np.int64),
    ).sort_values("event_id").reset_index(drop=True)
    for col in ("prev_value", "roll_max", "roll_n"):
        assert np.array_equal(got[col].to_numpy(), want[col].to_numpy()), col


@settings(max_examples=12, deadline=None)
@given(event_stream())
def test_attribution_matches_bruteforce(ray_session, tmp_path_factory, df):
    from polylabel_rs_ray.pipelines.queries import (
        ATTRIB_WINDOW_US,
        q_attribution_counts,
    )

    sf = _write_events(df, str(tmp_path_factory.mktemp("evattr")))
    got = q_attribution_counts(sf, n_parts=3).to_pandas()
    if got.empty and "event_id" not in got.columns:
        # a purchase-free stream yields zero rows; Ray's to_pandas drops
        # the (correct — ds.schema() carries it) column set on all-empty
        # blocks, so normalize before comparing
        got = got.reindex(columns=["event_id", "user_id", "purchase_ts_us",
                                   "n_views_1h"])
    got = got.sort_values("event_id").reset_index(drop=True)
    p = df[df.event_type == "purchase"]
    v = df[df.event_type == "view"]
    want = [
        int(((v.user_id == r.user_id)
             & (v.ts_us > r.ts_us - ATTRIB_WINDOW_US)
             & (v.ts_us <= r.ts_us)).sum())
        for r in p.sort_values("event_id").itertuples()
    ]
    assert len(got) == len(p)
    assert got["n_views_1h"].tolist() == want
