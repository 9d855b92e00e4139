"""Distributed bloom filter over int64 key columns.

Build: every block of the key dataset emits ONE packed bitmap row
(map-side), and the driver OR-reduces O(blocks) bitmaps — the driver never
sees keys, only fixed-size bitmaps.  Probe: broadcast the bitmap once
(``ray.put`` — zero-copy shared-memory numpy on every worker) and test
membership vectorized inside ``map_batches``.

No false negatives (supersets only), so using it as a semi-join prefilter
can never change join results — it only cuts shuffle volume.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

GOLD_A = np.uint64(0x9E3779B97F4A7C15)
GOLD_B = np.uint64(0xC2B2AE3D27D4EB4F)
MIN_BITS = 1 << 20
MAX_BITS = 1 << 28


def bloom_size_bits(n_keys: int) -> int:
    """Power-of-two bit count at ~32 bits/key (k=2 -> fp ~0.4%)."""
    target = max(MIN_BITS, min(MAX_BITS, 32 * max(n_keys, 1)))
    return 1 << int(np.ceil(np.log2(target)))


def _hash_pair(keys: np.ndarray, m_bits: int) -> tuple[np.ndarray, np.ndarray]:
    u = keys.astype(np.uint64)
    mask = np.uint64(m_bits - 1)
    h1 = ((u * GOLD_A) >> np.uint64(32)) & mask
    h2 = (((u * GOLD_B) >> np.uint64(32)) | np.uint64(1)) & mask
    return h1, (h1 + h2) & mask


def _set_bits(bits: np.ndarray, idx: np.ndarray) -> None:
    np.bitwise_or.at(bits, (idx >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (idx & np.uint64(63)))


def build_bloom(ds, cols: list[str], m_bits: int) -> np.ndarray:
    """OR-reduce per-block bitmaps of every value in ``cols`` of ``ds``."""
    words = m_bits // 64

    def batch_bits(batch: pa.Table) -> pa.Table:
        bits = np.zeros(words, dtype=np.uint64)
        for c in cols:
            k = batch.column(c).to_numpy().astype(np.uint64)
            for idx in _hash_pair(k, m_bits):
                _set_bits(bits, idx)
        return pa.table({"bits": pa.array([bits.tobytes()], type=pa.large_binary())})

    parts = ds.map_batches(batch_bits, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    out = np.zeros(words, dtype=np.uint64)
    for blob in parts["bits"]:
        out |= np.frombuffer(blob, dtype=np.uint64)
    return out


def bloom_contains(bits: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """(n,) bool membership mask — vectorized double-hash probe."""
    m_bits = len(bits) * 64
    h1, h2 = _hash_pair(keys, m_bits)
    one = np.uint64(1)
    t1 = (bits[(h1 >> np.uint64(6)).astype(np.int64)] >> (h1 & np.uint64(63))) & one
    t2 = (bits[(h2 >> np.uint64(6)).astype(np.int64)] >> (h2 & np.uint64(63))) & one
    return (t1 & t2).astype(bool)
