"""Extension batch 196: CRC-8 histogram + Feistel shuffle audit."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders",):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(by=sorted(df.columns))
              .reset_index(drop=True)
              .astype(str))


def test_crc8_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext196 import (
        _sql_orderkey_crc8_histogram, q_orderkey_crc8_histogram,
    )

    d = q_orderkey_crc8_histogram(SF).to_pandas()
    o = con.execute(_sql_orderkey_crc8_histogram()).df()
    assert len(d) == len(o) > 100
    assert _norm(d).equals(_norm(o))


def test_crc8_known_vectors(ray_session, con):
    """Published CRC-8/0x07 check value: '123456789' -> 0xF4; also a
    scalar bitwise recomputation over a key sample agrees with the
    table-driven path; mass identity."""
    from polylabel_rs_ray.pipelines.queries_ext196 import (
        _CRC8, CRC_POLY, q_orderkey_crc8_histogram,
    )

    def crc8_bytes(data: bytes) -> int:
        crc = 0
        for b in data:
            crc ^= b
            for _ in range(8):
                crc = ((crc << 1) ^ CRC_POLY) & 0xFF if crc & 0x80 \
                    else (crc << 1) & 0xFF
        return crc

    assert crc8_bytes(b"123456789") == 0xF4  # CRC-8/SMBUS check value

    d = q_orderkey_crc8_histogram(SF).to_pandas()
    keys = [int(r[0]) for r in con.execute(
        "SELECT o_orderkey FROM orders").fetchall()]
    assert int(d["n_keys"].sum()) == len(keys)
    for k in keys[:50]:
        bitwise = crc8_bytes(k.to_bytes(8, "big"))
        c = 0
        for i in range(7, -1, -1):
            c = int(_CRC8[c ^ ((k >> (8 * i)) & 0xFF)])
        assert c == bitwise, k


def test_feistel_matches_duckdb(ray_session, con):
    from polylabel_rs_ray.pipelines.queries_ext196 import (
        SQL_FEISTEL_SHUFFLE_AUDIT, q_feistel_shuffle_audit,
    )

    d = q_feistel_shuffle_audit(SF).to_pandas()
    o = con.execute(SQL_FEISTEL_SHUFFLE_AUDIT).df()
    assert len(d) == len(o) > 30
    assert _norm(d).equals(_norm(o))


def test_feistel_bijectivity(ray_session, con):
    """The network inverts exactly (decrypt = reversed rounds), so it is
    a permutation; distinct permuted values == distinct keys; buckets
    spread (no bucket hoards more than 10% of mass)."""
    from polylabel_rs_ray.pipelines.queries_ext196 import (
        FEI_M1, FEI_M2, _feistel, q_feistel_shuffle_audit,
    )

    d = q_feistel_shuffle_audit(SF).to_pandas()
    keys = np.array([int(r[0]) for r in con.execute(
        "SELECT o_orderkey FROM orders").fetchall()], dtype=np.int64)
    p = _feistel(keys)
    assert len(set(p.tolist())) == len(set(keys.tolist()))

    def invert(v: int) -> int:
        l, r = (v >> 16) & 0xFFFF, v & 0xFFFF
        for rnd in (2, 1):
            f = (l * FEI_M1 + rnd * FEI_M2) % 65536
            l, r = (r ^ f) & 0xFFFF, l
        return (l << 16) | r

    for k, v in zip(keys[:100].tolist(), p[:100].tolist()):
        assert invert(int(v)) == int(k)
    assert int(d["n_keys"].sum()) == len(keys)
    assert int(d["n_keys"].max()) <= len(keys) // 10 + 1
