"""Hierarchical quad-cell index (S2-style, built from scratch — no h3/s2
libraries exist in this environment; SURVEY.md §7 step 3).

A cell id packs ``(resolution << 58) | morton(ix, iy)`` into an int64:
``ix, iy`` are the column/row of the 2^res x 2^res grid over the fixed world
square (config.WORLD_MIN + WORLD_SIZE).  Morton (Z-order) interleaving makes
parent/child relations bit-prefix operations — the property the spatial join
and the tile assignment rely on — and keeps spatially-close cells
numerically close, which keeps range-partitioned shuffles local.

``CellEncoder`` is the stateful actor-pool stage: the 16-bit->32-bit morton
spread LUT (512 KiB) is built once per actor in ``__init__`` and reused for
every batch (map_batches(CellEncoder, concurrency=N) pattern).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CELL_RES, MAX_RES, WORLD_MIN, WORLD_SIZE

_RES_SHIFT = 58


def _spread_bits_u32(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low 32 bits of v (morton part1by1)."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact_bits_u64(v: np.ndarray) -> np.ndarray:
    """Inverse of _spread_bits_u32 (keep even bits, compact)."""
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def grid_coords(x: np.ndarray, y: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) -> integer grid column/row at resolution ``res``, clipped to
    the world square.  Non-finite inputs map to cell (0, 0)."""
    n = 1 << res
    scale = n / WORLD_SIZE
    with np.errstate(invalid="ignore"):
        ix = np.floor((np.asarray(x, dtype=np.float64) - WORLD_MIN) * scale)
        iy = np.floor((np.asarray(y, dtype=np.float64) - WORLD_MIN) * scale)
    ix = np.nan_to_num(ix, nan=0.0, posinf=n - 1, neginf=0.0)
    iy = np.nan_to_num(iy, nan=0.0, posinf=n - 1, neginf=0.0)
    return (
        np.clip(ix, 0, n - 1).astype(np.int64),
        np.clip(iy, 0, n - 1).astype(np.int64),
    )


def encode_cells(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    """(ix, iy, res) -> int64 cell ids."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution {res} outside [0, {MAX_RES}]")
    morton = _spread_bits_u32(np.asarray(ix)) | (_spread_bits_u32(np.asarray(iy)) << np.uint64(1))
    cid = (np.uint64(res) << np.uint64(_RES_SHIFT)) | morton
    return cid.astype(np.int64)


def cell_id(x: np.ndarray, y: np.ndarray, res: int = DEFAULT_CELL_RES) -> np.ndarray:
    ix, iy = grid_coords(x, y, res)
    return encode_cells(ix, iy, res)


def decode_cells(cid: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """int64 cell ids -> (ix, iy, res)."""
    u = np.asarray(cid).astype(np.uint64)
    res = (u >> np.uint64(_RES_SHIFT)).astype(np.int64)
    morton = u & np.uint64((1 << _RES_SHIFT) - 1)
    ix = _compact_bits_u64(morton).astype(np.int64)
    iy = _compact_bits_u64(morton >> np.uint64(1)).astype(np.int64)
    return ix, iy, res


def cell_parent(cid: np.ndarray, parent_res: int) -> np.ndarray:
    ix, iy, res = decode_cells(cid)
    shift = res - parent_res
    if np.any(shift < 0):
        raise ValueError("parent_res coarser than cell res required")
    return encode_cells(ix >> shift, iy >> shift, parent_res)


def cell_center(cid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ix, iy, res = decode_cells(cid)
    sizes = WORLD_SIZE / (2.0 ** res)
    cx = WORLD_MIN + (ix + 0.5) * sizes
    cy = WORLD_MIN + (iy + 0.5) * sizes
    return cx, cy


def cell_bounds(cid: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    ix, iy, res = decode_cells(cid)
    sizes = WORLD_SIZE / (2.0 ** res)
    x0 = WORLD_MIN + ix * sizes
    y0 = WORLD_MIN + iy * sizes
    return x0, y0, x0 + sizes, y0 + sizes


def cover_bbox(minx: float, miny: float, maxx: float, maxy: float, res: int) -> np.ndarray:
    """Cell ids of every cell at ``res`` intersecting the bbox (the
    polygon-side covering used by the spatial join)."""
    (ix0,), (iy0,) = grid_coords(np.array([minx]), np.array([miny]), res)
    (ix1,), (iy1,) = grid_coords(np.array([maxx]), np.array([maxy]), res)
    gx = np.arange(ix0, ix1 + 1, dtype=np.int64)
    gy = np.arange(iy0, iy1 + 1, dtype=np.int64)
    mx, my = np.meshgrid(gx, gy, indexing="ij")
    return encode_cells(mx.ravel(), my.ravel(), res)


def neighbor_ring(ix: int, iy: int, res: int, k: int) -> np.ndarray:
    """Cells exactly k rings away from (ix, iy) (k=0 -> the cell itself),
    clipped at the world edge — the expanding-ring search used for kNN
    tile assignment."""
    n = 1 << res
    if k == 0:
        return encode_cells(np.array([ix]), np.array([iy]), res)
    xs, ys = [], []
    for dx in range(-k, k + 1):
        for dy in range(-k, k + 1):
            if max(abs(dx), abs(dy)) != k:
                continue
            x, y = ix + dx, iy + dy
            if 0 <= x < n and 0 <= y < n:
                xs.append(x)
                ys.append(y)
    if not xs:
        return np.empty(0, dtype=np.int64)
    return encode_cells(np.array(xs), np.array(ys), res)


def sql_cell_id_expr(x_expr: str, y_expr: str, res: int) -> str:
    """DuckDB SQL computing the same int64 cell id as ``cell_id`` — used by
    the oracle queries.  Expands the morton interleave bit-by-bit."""
    n = 1 << res
    cell = WORLD_SIZE / n
    ix = (
        f"LEAST({n - 1}, GREATEST(0, CAST(FLOOR(({x_expr} - ({WORLD_MIN!r})) / {cell!r}) AS BIGINT)))"
    )
    iy = (
        f"LEAST({n - 1}, GREATEST(0, CAST(FLOOR(({y_expr} - ({WORLD_MIN!r})) / {cell!r}) AS BIGINT)))"
    )
    return sql_morton_expr(ix, iy, res)


def sql_morton_expr(ix_expr: str, iy_expr: str, res: int) -> str:
    """DuckDB expression: int64 cell id from integer grid exprs."""
    terms = []
    for b in range(res):
        terms.append(f"((({ix_expr} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({iy_expr} >> {b}) & 1) << {2 * b + 1})")
    morton = " | ".join(terms)
    return f"CAST((CAST({res} AS BIGINT) << {_RES_SHIFT}) | ({morton}) AS BIGINT)"


def append_cell_columns(
    batch: pa.Table,
    cell_res: int = DEFAULT_CELL_RES,
    tile_res: int | None = None,
    x_col: str = "label_x",
    y_col: str = "label_y",
) -> pa.Table:
    """Stateless function form of the cell encoding (same bit math, no LUT) —
    used where elastic task parallelism matters more than per-actor state."""
    x = batch.column(x_col).to_numpy()
    y = batch.column(y_col).to_numpy()
    ix, iy = grid_coords(x, y, cell_res)
    out = batch.append_column("cell_id", pa.array(encode_cells(ix, iy, cell_res), type=pa.int64()))
    if tile_res is not None:
        shift = cell_res - tile_res
        out = out.append_column(
            "tile_id", pa.array(encode_cells(ix >> shift, iy >> shift, tile_res), type=pa.int64())
        )
    return out


class CellEncoder:
    """Actor-pool map_batches stage: append cell_id (join key) and tile_id
    (coarser parent) for the label point of each row.

    Stateful setup (once per actor): the morton spread LUT for 16-bit
    halves.  Use as
    ``ds.map_batches(CellEncoder, fn_constructor_kwargs=..., concurrency=N,
    batch_format="pyarrow")``."""

    def __init__(self, cell_res: int = DEFAULT_CELL_RES, tile_res: int | None = None,
                 x_col: str = "label_x", y_col: str = "label_y"):
        self.cell_res = cell_res
        self.tile_res = tile_res
        self.x_col = x_col
        self.y_col = y_col
        # 16-bit -> 32-bit spread LUT, built once per actor
        base = np.arange(1 << 16, dtype=np.uint64)
        self._lut = _spread_bits_u32(base)

    def _morton(self, ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
        ixu = ix.astype(np.uint64)
        iyu = iy.astype(np.uint64)
        sx = self._lut[ixu & np.uint64(0xFFFF)] | (
            self._lut[ixu >> np.uint64(16)] << np.uint64(32)
        )
        sy = self._lut[iyu & np.uint64(0xFFFF)] | (
            self._lut[iyu >> np.uint64(16)] << np.uint64(32)
        )
        return sx | (sy << np.uint64(1))

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch.column(self.x_col).to_numpy()
        y = batch.column(self.y_col).to_numpy()
        ix, iy = grid_coords(x, y, self.cell_res)
        cid = (
            (np.uint64(self.cell_res) << np.uint64(_RES_SHIFT)) | self._morton(ix, iy)
        ).astype(np.int64)
        out = batch.append_column("cell_id", pa.array(cid, type=pa.int64()))
        if self.tile_res is not None:
            shift = self.cell_res - self.tile_res
            tid = encode_cells(ix >> shift, iy >> shift, self.tile_res)
            out = out.append_column("tile_id", pa.array(tid, type=pa.int64()))
        return out
