"""Extension batch 155: SQ8 class medoids + isotonic regression."""

import duckdb
import numpy as np
import pytest
from fractions import Fraction

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("embeddings", "part"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_medoids_match_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext155 import (
        _sql_sq8_class_medoids, q_sq8_class_medoids,
    )

    d = q_sq8_class_medoids(SF).to_pandas()
    o = con.execute(_sql_sq8_class_medoids()).df()
    assert len(d) == len(o) > 0
    assert _norm(d).equals(_norm(o))


def test_medoids_vs_bruteforce(ray_session, con):
    """Brute-force O(n^2) pairwise recount per class: the Gram-identity
    cost must equal the literal sum of squared distances, and the medoid
    must be its argmin."""
    from polylabel_rs_ray.pipelines.queries_ext32 import _minmax, _quantize
    from polylabel_rs_ray.pipelines.queries_ext155 import q_sq8_class_medoids

    d = q_sq8_class_medoids(SF).to_pandas()
    raw = con.execute(
        "SELECT vec_id, embedding, label FROM embeddings ORDER BY vec_id"
    ).df()
    mn, mx = _minmax(SF)
    span = np.where(mx > mn, mx - mn, 1.0)
    codes = _quantize(
        np.asarray(list(raw["embedding"]), dtype=np.float64), mn, span)
    vids = raw["vec_id"].to_numpy().astype(np.int64)
    labs = raw["label"].to_numpy().astype(np.int64)
    for row in d.itertuples():
        m = labs == row.label
        c = codes[m]
        v = vids[m]
        # pairwise squared distances (class is small at sf0.001)
        d2 = ((c[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        cost = d2.sum(axis=1)
        best = np.lexsort((v, cost))[0]
        assert v[best] == row.medoid_vec_id
        assert int(cost[best]) == row.total_sq_dist


def test_isotonic_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext155 import (
        SQL_ISOTONIC_PRICE_SIZE, q_isotonic_price_size,
    )

    d = q_isotonic_price_size(SF).to_pandas()
    o = con.execute(SQL_ISOTONIC_PRICE_SIZE).df()
    assert len(d) == len(o) == 50
    assert _norm(d).equals(_norm(o))


def test_isotonic_properties(ray_session):
    """The fit is monotone non-decreasing, mass-preserving per block,
    and equals the brute-force minimax formula at every point (PAVA's
    uniqueness characterization, recomputed independently here)."""
    from polylabel_rs_ray.pipelines.queries_ext155 import (
        q_isotonic_price_size,
    )

    d = q_isotonic_price_size(SF).to_pandas().sort_values("sz") \
        .reset_index(drop=True)
    fits = [Fraction(int(a), int(b))
            for a, b in zip(d["fit_num"], d["fit_den"])]
    assert all(x <= y for x, y in zip(fits, fits[1:]))
    S = d["raw_sum_cents"].to_numpy().astype(object)
    N = d["raw_n"].to_numpy().astype(object)
    ps = np.concatenate([[0], np.cumsum(S)])
    pn = np.concatenate([[0], np.cumsum(N)])
    K = len(d)

    def avg(i, j):
        return Fraction(int(ps[j + 1] - ps[i]), int(pn[j + 1] - pn[i]))

    minimax = [max(min(avg(i, j) for j in range(k, K))
                   for i in range(k + 1)) for k in range(K)]
    assert fits == minimax
    # block mass preservation: within a level set, sum of raw mass
    # equals fit_num and counts equal fit_den
    bid = (np.array([0] + [int(fits[i] != fits[i - 1])
                           for i in range(1, K)])).cumsum()
    for b in np.unique(bid):
        m = bid == b
        assert int(sum(S[m])) == int(d.loc[m, "fit_num"].iloc[0])
        assert int(sum(N[m])) == int(d.loc[m, "fit_den"].iloc[0])
