"""Round-2 extension operators, batch 13: windowed distincts + text index.

* ``sliding_window_users`` — COUNT(DISTINCT user) per sliding window
  (1 h window / 15 min hop): the fixed-factor window fan-out feeds a
  pair-dedup aggregate (shuffle carries unique (window, user) pairs per
  block), then a constant-size per-window count — the streaming-distinct
  shape at any scale.
* ``inverted_index`` — text index build: per word, document frequency
  and the ordered posting list of doc ids.  (word, doc) pairs dedup
  through a map-side-combined groupby, co-partition by hash(word), and
  each partition emits its words' joined postings from one lexsort —
  no per-word task, no global sort (the ``event_types_per_user``
  machinery pointed at an unbounded key domain)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

HOP_US = 900_000_000
WIN_HOPS = 4


def _ray():
    import ray

    return ray


def _P(n_parts: int | None) -> int:
    from ..stages.util import shuffle_blocks

    return int(n_parts or min(32, shuffle_blocks()))


def q_sliding_window_users(sf_dir: str):
    from ..stages.agg import grouped_aggregate

    ray = _ray()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def fanout(batch: pa.Table) -> pa.Table:
        ts_us = batch.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = batch.column("user_id").to_numpy().astype(np.int64)
        h = ts_us // HOP_US
        n = len(h)
        ws = (np.repeat(h, WIN_HOPS) - np.tile(np.arange(WIN_HOPS, dtype=np.int64), n)) * HOP_US
        return pa.table({
            "ws_us": pa.array(ws, type=pa.int64()),
            "user_id": pa.array(np.repeat(uid, WIN_HOPS), type=pa.int64()),
        })

    pairs = grouped_aggregate(
        ds.map_batches(fanout, batch_format="pyarrow", zero_copy_batch=True),
        ["ws_us", "user_id"],
        [("count", None, "_n")],
        high_cardinality=True,  # (window, user) pairs ~ fanned-out rows
    )
    return grouped_aggregate(pairs, ["ws_us"], [("count", None, "n_users")])


SQL_SLIDING_WINDOW_USERS = """
    SELECT (epoch_us(ts) // 900000000 - j.j) * 900000000 AS ws_us,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS j) j
    GROUP BY 1
"""


def q_inverted_index(sf_dir: str, n_parts: int | None = None):
    from ..stages.agg import grouped_aggregate
    from ..stages.util import coalesce_for_shuffle
    from .queries_ext5 import _word_lists

    ray = _ray()
    P = _P(n_parts)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def word_doc(batch: pa.Table) -> pa.Table:
        flat, counts, doc_idx = _word_lists(batch)
        did = batch.column("doc_id").to_numpy().astype(np.int64)
        return pa.table({
            "word": flat,
            "doc_id": pa.array(did[doc_idx], type=pa.int64()),
        })

    pairs = grouped_aggregate(
        ds.map_batches(word_doc, batch_format="pyarrow", zero_copy_batch=True),
        ["word", "doc_id"],
        [("count", None, "_n")],
    )

    def to_parts(batch: pa.Table) -> pa.Table:
        words = batch.column("word")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        # deterministic word-hash partitioner (crc32 over the utf8 bytes)
        import zlib

        h = np.fromiter(
            (zlib.crc32(w.encode()) for w in words.to_pylist()),
            dtype=np.int64,
            count=len(words),
        )
        return pa.table({
            "part": pa.array(h % P, type=pa.int64()),
            "word": words,
            "doc_id": batch.column("doc_id"),
        })

    def join_postings(group: pa.Table) -> pa.Table:
        w = group.column("word").to_pandas().to_numpy()
        did = group.column("doc_id").to_numpy().astype(np.int64)
        order = np.lexsort((did, w))
        w, did = w[order], did[order]
        new_seg = np.r_[True, w[1:] != w[:-1]]
        starts = np.flatnonzero(new_seg)
        ends = np.r_[starts[1:], len(w)]
        joined = [",".join(map(str, did[s:e])) for s, e in zip(starts, ends)]
        return pa.table({
            "word": pa.array(w[starts], type=pa.string()),
            "df": pa.array(ends - starts, type=pa.int64()),
            "postings": pa.array(joined, type=pa.string()),
        })

    return (
        coalesce_for_shuffle(
            pairs.map_batches(to_parts, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("part")
        .map_groups(join_postings, batch_format="pyarrow")
    )


SQL_INVERTED_INDEX = """
    WITH wd AS (
        SELECT DISTINCT w.word, d.doc_id
        FROM documents d,
             UNNEST(string_split(d.text, ' ')) AS w(word)
    )
    SELECT word, CAST(COUNT(*) AS BIGINT) AS df,
           STRING_AGG(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM wd GROUP BY word
"""


def build_queries_ext12() -> dict:
    return {
        "sliding_window_users": q_sliding_window_users,
        "inverted_index": q_inverted_index,
    }


def build_oracles_ext12() -> dict:
    return {
        "sliding_window_users": SQL_SLIDING_WINDOW_USERS,
        "inverted_index": SQL_INVERTED_INDEX,
    }
