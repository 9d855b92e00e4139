"""Extension batch 56: z-score normalization + daily anomaly flags."""

import duckdb
import numpy as np
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


def test_value_zscores_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext56 import (
        SQL_VALUE_ZSCORES, q_value_zscores,
    )

    d = _sorted(q_value_zscores(SF).to_pandas())
    o = con.execute(SQL_VALUE_ZSCORES).df()
    o = _sorted(o.astype(d.dtypes.to_dict()))
    assert len(d) == len(o) > 0
    assert d.equals(o)


def test_value_zscores_standardize(ray_session):
    """Per-type z means ~0 and sample second moment ~1 (population sd), and
    the outlier flag matches |z| > 3 exactly."""
    from polylabel_rs_ray.pipelines.queries_ext56 import q_value_zscores

    df = q_value_zscores(SF).to_pandas()
    for t, g in df.groupby("event_type"):
        assert abs(g["z"].mean()) < 1e-9
        assert abs((g["z"] ** 2).mean() - 1.0) < 1e-9
    assert ((df["z"].abs() > 3.0) == (df["is_outlier"] == 1)).all()


def test_anomalous_days_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext56 import (
        SQL_ANOMALOUS_DAYS, q_anomalous_days,
    )

    d = _sorted(q_anomalous_days(SF).to_pandas())
    o = con.execute(SQL_ANOMALOUS_DAYS).df()
    o = _sorted(o.astype(d.dtypes.to_dict()))
    assert len(d) == len(o) > 0
    assert d.equals(o)


def test_anomalous_days_semantics(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext56 import (
        MAD_FENCE, q_anomalous_days,
    )

    df = q_anomalous_days(SF).to_pandas()
    n_events = con.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    assert df["n_events"].sum() == n_events
    counts = np.sort(df["n_events"].to_numpy())
    med = counts[(len(counts) - 1) // 2]
    assert (df["median_n"] == med).all()
    mad = np.sort(np.abs(df["n_events"].to_numpy() - med))[(len(df) - 1) // 2]
    assert (df["mad_n"] == mad).all()
    flags = np.abs(df["n_events"] - med) > MAD_FENCE * mad
    assert (flags == (df["is_anomaly"] == 1)).all()
