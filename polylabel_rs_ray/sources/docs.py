"""Deterministic synthesis of the interleaved text+media document table.

Input table shape per ``BASELINE.json`` ``input_hint``:

    doc_id:    string      (derived from the integer doc_id of the sf tables)
    spans:     list<struct<kind: string, text: string, media_ref: string,
                           offset: int32>>
    rings:     list<list<fixed_size_list<double, 2>>>   ring 0 = exterior
    tolerance: double

Everything is a pure function of the integer ``doc_id`` (seed-free), so any
shard of the table can be synthesized independently on any worker — the
property that lets the same generator run at 10^12-doc scale as a
``map_batches`` over a doc_id range dataset.

Geometry: row i carries fixture ``FIXTURE_CYCLE[i % 9]`` translated by the
integer offset ``(i*37 % 1000, i*73 % 1000)``.  For the dyadic fixtures
(DYADIC_FIXTURES) integer translation shifts the reference label point
EXACTLY (tests/test_geom_kernel.py::test_translation_exactness_dyadic),
which the DuckDB oracle queries rely on.  Degenerate sentinels stay (0,0)
regardless of translation (lib.rs:340-343 returns before any geometry is
used).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .fixtures import DYADIC_FIXTURES, FIXTURE_CYCLE, FIXTURES
from ..geom.kernel import normalize_ring

SPAN_KINDS = ["text", "image", "audio", "video"]

SPANS_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)
RINGS_TYPE = pa.list_(pa.list_(pa.list_(pa.float64(), 2)))


class _Template:
    __slots__ = ("coords", "ring_lens", "tolerance", "n_rings", "n_pts")

    def __init__(self, rings, tolerance):
        rs = [np.ascontiguousarray(r, dtype=np.float64) for r in rings]
        self.coords = np.concatenate(rs)
        self.ring_lens = np.array([len(r) for r in rs], dtype=np.int32)
        self.tolerance = float(tolerance)
        self.n_rings = len(rs)
        self.n_pts = int(self.ring_lens.sum())


TEMPLATES: list[_Template] = [
    _Template(FIXTURES[name].rings, FIXTURES[name].tolerance) for name in FIXTURE_CYCLE
]
DYADIC_CYCLE_IDX = [FIXTURE_CYCLE.index(n) for n in DYADIC_FIXTURES]

N_FIXTURES = len(FIXTURE_CYCLE)
OFF_X_MULT, OFF_Y_MULT, OFF_MOD = 37, 73, 1000


def doc_offsets(doc_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    dx = ((doc_ids * OFF_X_MULT) % OFF_MOD).astype(np.float64)
    dy = ((doc_ids * OFF_Y_MULT) % OFF_MOD).astype(np.float64)
    return dx, dy


def rings_for_doc_ids(doc_ids: np.ndarray) -> pa.ListArray:
    """Vectorized construction of the nested rings column for a batch."""
    n = len(doc_ids)
    fix = (doc_ids % N_FIXTURES).astype(np.int64)
    dx, dy = doc_offsets(doc_ids)

    order = np.argsort(fix, kind="stable")
    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n)

    coord_parts: list[np.ndarray] = []
    ring_len_parts: list[np.ndarray] = []
    rings_per_row = np.empty(n, dtype=np.int32)
    pos = 0
    for f in range(N_FIXTURES):
        rows = order[fix[order] == f]
        g = len(rows)
        if g == 0:
            continue
        t = TEMPLATES[f]
        tiled = np.tile(t.coords, (g, 1))
        offs = np.empty((g, 2))
        offs[:, 0] = dx[rows]
        offs[:, 1] = dy[rows]
        tiled += np.repeat(offs, t.n_pts, axis=0)
        coord_parts.append(tiled)
        ring_len_parts.append(np.tile(t.ring_lens, g))
        rings_per_row[pos : pos + g] = t.n_rings
        pos += g

    coords = np.concatenate(coord_parts) if coord_parts else np.empty((0, 2))
    ring_lens = np.concatenate(ring_len_parts) if ring_len_parts else np.empty(0, dtype=np.int32)

    flat = pa.array(coords.ravel(), type=pa.float64())
    points = pa.FixedSizeListArray.from_arrays(flat, 2)
    ring_offsets = np.zeros(len(ring_lens) + 1, dtype=np.int32)
    np.cumsum(ring_lens, out=ring_offsets[1:])
    rings_arr = pa.ListArray.from_arrays(pa.array(ring_offsets, type=pa.int32()), points)
    row_offsets = np.zeros(pos + 1, dtype=np.int32)
    np.cumsum(rings_per_row[:pos], out=row_offsets[1:])
    nested = pa.ListArray.from_arrays(pa.array(row_offsets, type=pa.int32()), rings_arr)
    # restore original row order
    return nested.take(pa.array(inv, type=pa.int64()))


def tolerance_for_doc_ids(doc_ids: np.ndarray) -> np.ndarray:
    tols = np.array([t.tolerance for t in TEMPLATES])
    return tols[(doc_ids % N_FIXTURES).astype(np.int64)]


def spans_for_doc_ids(doc_ids: np.ndarray) -> pa.ListArray:
    """1..8 interleaved spans per doc; kind cycles text/image/audio/video,
    deterministic values so span-sequence equality is checkable anywhere."""
    n = len(doc_ids)
    counts = (doc_ids % 8 + 1).astype(np.int32)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    total = int(offsets[-1])
    doc_rep = np.repeat(doc_ids, counts)
    j = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], counts)
    kind_idx = ((doc_rep + j) % len(SPAN_KINDS)).astype(np.int64)
    is_text = kind_idx == 0

    # string assembly via arrow C++ kernels (int->string cast + elementwise
    # join + if_else) — ~6x the numpy np.char path this replaced
    import pyarrow.compute as pc

    kinds = pc.take(pa.array(SPAN_KINDS, type=pa.string()),
                    pa.array(kind_idx, type=pa.int64()))
    doc_s = pc.cast(pa.array(doc_rep, type=pa.int64()), pa.string())
    j_s = pc.cast(pa.array(j, type=pa.int64()), pa.string())
    text_all = pc.binary_join_element_wise(
        "text of doc ", doc_s, " span ", j_s, ""
    )
    ref_all = pc.binary_join_element_wise("media://", doc_s, "/", j_s, "")
    mask = pa.array(is_text)
    nulls = pa.nulls(total, pa.string())
    struct = pa.StructArray.from_arrays(
        [
            kinds,
            pc.if_else(mask, text_all, nulls),
            pc.if_else(mask, nulls, ref_all),
            pa.array(j, type=pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), struct)


def attach_interleaved(batch: pa.Table) -> pa.Table:
    """map_batches(batch_format="pyarrow") stage: given a batch carrying an
    integer ``doc_id`` column, append the interleaved-document columns
    (string doc_id, spans, rings, tolerance)."""
    import pyarrow.compute as pc

    ids = batch.column("doc_id").to_numpy().astype(np.int64)
    ids_arr = pa.array(ids, type=pa.int64())
    doc_id_str = pc.binary_join_element_wise(
        pa.array(["doc-"] * len(ids), type=pa.string()),
        pc.cast(ids_arr, pa.string()),
        "",
    )
    out = pa.table(
        {
            "doc_id": doc_id_str,
            "doc_num": ids_arr,
            "spans": spans_for_doc_ids(ids),
            "rings": rings_for_doc_ids(ids),
            "tolerance": pa.array(tolerance_for_doc_ids(ids), type=pa.float64()),
        }
    )
    return out


# read_docs block sizing: a single parquet file reads as ONE block, which
# would serialize the downstream label chain (measured 12-17x on 120k docs).
# Below this row count the doc_id column is cheap enough (8 bytes/row) to
# re-split into ~300-row blocks (the label stage's skew-balancing size);
# above it — the 10^12-doc deployment — the table is many files/fragments
# and the reader's natural sharding provides the parallelism, so a
# repartition of the id column would be a pointless all-to-all.
RESPLIT_MAX_ROWS = 50_000_000
LABEL_BLOCK_ROWS = 300


def read_docs(sf_dir: str, columns: list[str] | None = None,
              limit: int | None = None):
    """Interleaved-document Dataset derived from the sf documents table.

    On a real deployment this is ``ray.data.read_lance`` over the Lance table
    (input_hint); in this sandbox the same logical table is synthesized
    deterministically from the documents table's doc_id column — only the
    needed column leaves storage (prune-at-read).  The format is resolved by
    ``sources.table.read_table`` (Lance if available, Parquet fallback).
    Small single-file tables are re-split to ~300-row blocks so the label
    chain parallelizes (see RESPLIT_MAX_ROWS note above).

    ``limit`` truncates BEFORE the repartition and synthesis stages — a
    ``.limit()`` applied downstream of read_docs sits after the re-split
    barrier and the span/ring synthesis, so the whole table gets synthesized
    while the limit races it (measured: the skew probe spent ~3x its label
    time there).  Pushing it here means only ``limit`` rows are ever built."""
    from .table import read_table
    from ..stages.util import shuffle_blocks

    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    rows = None
    try:
        import pyarrow.parquet as pq

        rows = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    except Exception:  # noqa: BLE001 — non-parquet source: trust its sharding
        pass
    if limit is not None:
        ds = ds.limit(limit)
        rows = min(rows, limit) if rows else limit
    if rows and rows <= RESPLIT_MAX_ROWS:
        target = int(min(max(rows // LABEL_BLOCK_ROWS, shuffle_blocks()), 4096))
        ds = ds.repartition(target)
    return ds.map_batches(attach_interleaved, batch_format="pyarrow", zero_copy_batch=True)
