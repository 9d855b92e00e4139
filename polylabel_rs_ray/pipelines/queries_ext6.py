"""Round-2 extension operators, batch 7: iterative graph + audio plumbing.

* ``pagerank_parts`` — weighted PageRank over the part co-occurrence
  graph (the edges of ``part_pair_counts``): the rank vector is O(parts)
  — a bounded dimension, like the broadcast side of every dim join here
  — so each of the K power iterations is ONE streamed pass over the
  edge dataset with the current ranks broadcast (``ray.put`` once per
  iteration), a map-side-combined per-destination sum, and an O(V)
  driver update (damping + dangling mass).  The edge set itself is the
  aggregated pair graph — far smaller than the fact table — and is
  materialized once instead of re-deriving it from lineitem every
  iteration.  Rows-only (iterative float algorithm); pytest pins it
  against a dense numpy power iteration on the same graph.
* ``audio_chunk_stats`` — audio-decode plumbing end-to-end: docs ->
  media-span explode -> AudioChunker actor pool (fixed-duration PCM
  chunks, fake decode per the stub policy) -> per-doc chunk count and
  payload bytes.  Rows-only (spans are synthesized engine-side)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PR_DAMPING = 0.85
PR_ITERS = 8
PR_TOPK = 20


def _ray():
    import ray

    return ray


def pagerank_over_pairs(edges, node_ids: np.ndarray,
                        damping: float = PR_DAMPING, iters: int = PR_ITERS):
    """Run weighted PageRank over an (part_a, part_b, n_pairs) edge
    Dataset treated as undirected.  ``node_ids`` is the full sorted node
    domain (isolated nodes included — they hold teleport-only rank).
    Returns the final rank vector aligned with node_ids."""
    ray = _ray()
    V = len(node_ids)
    ids_ref = ray.put(node_ids)

    def _dense_sum(ds) -> np.ndarray:
        # each block emits ONE dense length-V partial vector (the rank
        # domain is a bounded dimension) — the reduce is an O(blocks)
        # driver sum with NO shuffle, the histogram-reduce pattern
        parts = ds.to_pandas()
        acc = np.zeros(V, dtype=np.float64)
        for row in parts["vec"]:
            acc += np.asarray(row, dtype=np.float64)
        return acc

    # weighted degree s_u = sum of incident edge weights (one pass)
    def deg_partial(batch: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        a = batch.column("part_a").to_numpy().astype(np.int64)
        b = batch.column("part_b").to_numpy().astype(np.int64)
        w = batch.column("n_pairs").to_numpy().astype(np.float64)
        vec = np.zeros(len(ids), dtype=np.float64)
        np.add.at(vec, np.searchsorted(ids, a), w)
        np.add.at(vec, np.searchsorted(ids, b), w)
        return pa.table({"vec": pa.array([vec], type=pa.list_(pa.float64()))})

    s = _dense_sum(
        edges.map_batches(deg_partial, batch_format="pyarrow", zero_copy_batch=True)
    )

    r = np.full(V, 1.0 / V)
    for _ in range(iters):
        # rank-over-degree, zero for dangling nodes (their mass teleports)
        rod = np.where(s > 0, r / np.maximum(s, 1.0e-300), 0.0)
        rod_ref = ray.put(rod)

        def contrib(batch: pa.Table) -> pa.Table:
            ids = ray.get(ids_ref)
            rv = ray.get(rod_ref)
            a = batch.column("part_a").to_numpy().astype(np.int64)
            b = batch.column("part_b").to_numpy().astype(np.int64)
            w = batch.column("n_pairs").to_numpy().astype(np.float64)
            ia = np.searchsorted(ids, a)
            ib = np.searchsorted(ids, b)
            vec = np.zeros(len(ids), dtype=np.float64)
            np.add.at(vec, ia, w * rv[ib])
            np.add.at(vec, ib, w * rv[ia])
            return pa.table({"vec": pa.array([vec], type=pa.list_(pa.float64()))})

        inflow = _dense_sum(
            edges.map_batches(contrib, batch_format="pyarrow", zero_copy_batch=True)
        )
        dangling = float(r[s == 0].sum())
        r = (1.0 - damping) / V + damping * (inflow + dangling / V)
    return r


def q_pagerank_parts(sf_dir: str):
    from .queries import q_part_pair_counts

    import pyarrow.parquet as pq

    # aggregated pair graph: repartition to a few dense blocks BEFORE
    # materializing — every one of the K iterations walks these blocks, so
    # per-iteration task-launch overhead scales with block count
    edges = q_part_pair_counts(sf_dir).repartition(8).materialize()
    # orders of magnitude smaller than lineitem; reused across K iterations
    node_ids = np.sort(
        pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
        .column("p_partkey")
        .to_numpy()
        .astype(np.int64)
    )
    r = pagerank_over_pairs(edges, node_ids)
    order = np.lexsort((node_ids, -r))[:PR_TOPK]
    return pa.table({
        "p_partkey": pa.array(node_ids[order], type=pa.int64()),
        "rank": pa.array(r[order], type=pa.float64()),
    })


def q_audio_chunk_stats(sf_dir: str):
    from ..stages.agg import grouped_aggregate
    from ..stages.media import audio_pipeline

    chunks = audio_pipeline(sf_dir)

    def sizes(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_num": batch.column("doc_num"),
            "pcm_bytes": pc.cast(pc.binary_length(batch.column("pcm")), pa.int64()),
        })

    return grouped_aggregate(
        chunks.map_batches(sizes, batch_format="pyarrow", zero_copy_batch=True),
        ["doc_num"],
        [("count", None, "n_chunks"), ("sum", "pcm_bytes", "total_bytes")],
    )


def build_queries_ext6() -> dict:
    return {
        "pagerank_parts": q_pagerank_parts,
        "audio_chunk_stats": q_audio_chunk_stats,
    }


def build_oracles_ext6() -> dict:
    # both rows-only: iterative float algorithm / engine-synthesized spans
    return {}
