"""Spatial join stages: point-in-polygon zone join and kNN label->tile.

Patterns (SURVEY.md §2.3 joins, §7 step 4):

* **Broadcast PIP join** — the polygon side (the deterministic ``zones``
  table) is small, so it is shipped once (serialized into the stage
  callable / ``ray.put``) instead of shuffled; each actor builds a
  cell_id -> candidate-zone index once in ``__init__`` (the H3/S2-style
  cell prefilter), then exact containment runs the same even-odd parity
  kernel the labeler uses (lib.rs:218-222).  For a large polygon side the
  same stage composes with ``groupby(cell_id).map_groups`` co-partitioning
  instead of a broadcast — see ``pipelines/flagship.py``.
* **kNN label->tile** — tile centers form a regular grid, so the
  k-nearest-tile search scans the 5x5 neighbor-ring candidate set
  (provably a superset of the true top-3: any ring>=3 center is farther
  than every ring<=1 center can be) and ranks by exact squared distance
  with tile_id as the deterministic tiebreak.

Zone geometry is axis-aligned (rectangles with a deterministic layout) so
the DuckDB oracle can express the same join with BETWEEN predicates; zone
edges sit on half-integer coordinates so no label point ever lies exactly
on a zone boundary (labels are sentinel (0,0) or carry fractional dyadic
parts != .5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CELL_RES, DEFAULT_TILE_RES, WORLD_MIN, WORLD_SIZE
from .cells import cover_bbox, decode_cells, encode_cells, grid_coords

N_ZONES = 40


def zone_table() -> dict[str, np.ndarray]:
    """Deterministic axis-aligned zones (the small join side)."""
    i = np.arange(N_ZONES, dtype=np.int64)
    x0 = ((i * 131) % 1200).astype(np.float64) - 59.5
    y0 = ((i * 197) % 1200).astype(np.float64) - 59.5
    w = 40.0 + ((i * 13) % 160).astype(np.float64)
    h = 40.0 + ((i * 29) % 160).astype(np.float64)
    return {"zone_id": i, "x0": x0, "y0": y0, "x1": x0 + w, "y1": y0 + h}


def zone_rings(z: dict[str, np.ndarray], j: int) -> list[np.ndarray]:
    """Zone j as a closed ring (counter-clockwise) for the parity kernel."""
    x0, y0, x1, y1 = z["x0"][j], z["y0"][j], z["x1"][j], z["y1"][j]
    return [np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)])]


def sql_zone_values() -> str:
    """The zones table as a DuckDB VALUES list (oracle side)."""
    z = zone_table()
    rows = ", ".join(
        f"({int(z['zone_id'][j])}, {z['x0'][j]!r}, {z['y0'][j]!r}, {z['x1'][j]!r}, {z['y1'][j]!r})"
        for j in range(N_ZONES)
    )
    return f"(VALUES {rows}) AS zones(zone_id, zx0, zy0, zx1, zy1)"


class ZoneJoin:
    """map_batches stage: rows with (label_x, label_y) -> (row, zone_id)
    pairs for every zone containing the label point.  Rows matching no zone
    are dropped (inner-join semantics).

    Stateful per-actor setup: cell_id -> candidate zone ids, built from each
    zone's bbox covering at ``cell_res``."""

    def __init__(self, cell_res: int = DEFAULT_CELL_RES, keep_cols: tuple = ("doc_num",)):
        self.cell_res = cell_res
        self.keep_cols = list(keep_cols)
        z = zone_table()
        self.z = z
        index: dict[int, list[int]] = {}
        for j in range(N_ZONES):
            for cid in cover_bbox(z["x0"][j], z["y0"][j], z["x1"][j], z["y1"][j], cell_res):
                index.setdefault(int(cid), []).append(j)
        # CSR layout (cell_id -> zone-id span) so per-batch candidate
        # expansion is pure searchsorted + repeat/gather, no Python loop
        cells_sorted = np.array(sorted(index), dtype=np.int64)
        counts = np.array([len(index[c]) for c in cells_sorted], dtype=np.int64)
        self.csr_cells = cells_sorted
        self.csr_off = np.concatenate([[0], np.cumsum(counts)])
        self.csr_zones = (
            np.concatenate([np.asarray(index[c], dtype=np.int64) for c in cells_sorted])
            if len(cells_sorted)
            else np.empty(0, dtype=np.int64)
        )
        # rings for the exact parity test (general-polygon path; rectangles
        # here, but the kernel is the same one used for any zone geometry)
        from ..geom.kernel import prepare_edges

        self.prep = prepare_edges([zone_rings(z, j) for j in range(N_ZONES)])

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..geom.kernel import score_points_flat

        px = batch.column("label_x").to_numpy()
        py = batch.column("label_y").to_numpy()
        ix, iy = grid_coords(px, py, self.cell_res)
        cid = encode_cells(ix, iy, self.cell_res)

        # CSR candidate expansion: one searchsorted + repeat/gather
        ncells = len(self.csr_cells)
        pos = np.searchsorted(self.csr_cells, cid)
        pos_c = np.minimum(pos, max(ncells - 1, 0))
        found = (self.csr_cells[pos_c] == cid) if ncells else np.zeros(len(cid), bool)
        cnt = np.where(found, self.csr_off[pos_c + 1] - self.csr_off[pos_c], 0)
        total = int(cnt.sum())
        if total == 0:
            out = batch.select(self.keep_cols).slice(0, 0)
            return out.append_column("zone_id", pa.array([], type=pa.int64()))

        rows_a = np.repeat(np.arange(len(px), dtype=np.int64), cnt)
        base = np.repeat(self.csr_off[pos_c], cnt)
        csum = np.cumsum(cnt)
        zones_a = self.csr_zones[base + np.arange(total) - np.repeat(csum - cnt, cnt)]
        d = score_points_flat(px[rows_a], py[rows_a], zones_a, self.prep)
        hit = d > 0  # strictly inside (no boundary cases by construction)
        rows_a = rows_a[hit]
        zones_a = zones_a[hit]
        out = batch.select(self.keep_cols).take(pa.array(rows_a))
        return out.append_column("zone_id", pa.array(zones_a, type=pa.int64()))


def copartitioned_zone_join(points_ds, cell_res: int = DEFAULT_CELL_RES,
                            keep_cols: tuple = ("doc_num",)):
    """Large-large variant of the PIP join: no broadcast — both sides are
    keyed by cell_id and co-partitioned through ONE groupby shuffle.

      zones  --flat_map--> (cell_id, zone_id) covering rows
      points --map------->(cell_id, point)   rows
      union --groupby(cell_id).map_groups--> exact parity test per cell

    Each point is tested exactly once (in its own cell), so results equal
    the broadcast path row-for-row.  The zone side here is the same small
    deterministic table (so the oracle stays valid); the shape is what a
    billion-polygon side would use, with hot cells salted upstream."""
    import ray

    from ..geom.kernel import prepare_edges, score_points_flat

    z = zone_table()
    cover_rows = {"cell_id": [], "zone_id": []}
    for j in range(N_ZONES):
        for cid in cover_bbox(z["x0"][j], z["y0"][j], z["x1"][j], z["y1"][j], cell_res):
            cover_rows["cell_id"].append(int(cid))
            cover_rows["zone_id"].append(j)
    keep = list(keep_cols)
    nz = len(cover_rows["zone_id"])
    zcols = {
        "cell_id": pa.array(cover_rows["cell_id"], type=pa.int64()),
        "zone_id": pa.array(cover_rows["zone_id"], type=pa.int64()),
        "side": pa.array(["zone"] * nz, type=pa.string()),
        "label_x": pa.array(np.full(nz, np.nan), type=pa.float64()),
        "label_y": pa.array(np.full(nz, np.nan), type=pa.float64()),
    }
    for c in keep:
        zcols[c] = pa.array(np.full(nz, -1), type=pa.int64())
    zones_ds = ray.data.from_arrow(pa.table(zcols))

    def key_points(batch: pa.Table) -> pa.Table:
        px = batch.column("label_x").to_numpy()
        py = batch.column("label_y").to_numpy()
        ix, iy = grid_coords(px, py, cell_res)
        cid = encode_cells(ix, iy, cell_res)
        cols = {
            "cell_id": pa.array(cid, type=pa.int64()),
            "zone_id": pa.array(np.full(len(px), -1), type=pa.int64()),
            "side": pa.array(["point"] * len(px), type=pa.string()),
            "label_x": batch.column("label_x"),
            "label_y": batch.column("label_y"),
        }
        for c in keep:
            cols[c] = batch.column(c)
        return pa.table(cols)

    pts = points_ds.map_batches(key_points, batch_format="pyarrow", zero_copy_batch=True)

    prep = prepare_edges([zone_rings(z, j) for j in range(N_ZONES)])

    def join_cell(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("side").to_pylist())
        zmask = side == "zone"
        zone_ids = group.column("zone_id").to_numpy()[zmask]
        empty = pa.table({
            **{c: pa.array([], type=pa.int64()) for c in keep},
            "zone_id": pa.array([], type=pa.int64()),
        })
        if len(zone_ids) == 0 or zmask.all():
            return empty
        pidx = np.flatnonzero(~zmask)
        px = group.column("label_x").to_numpy()[pidx]
        py = group.column("label_y").to_numpy()[pidx]
        P, Z = len(pidx), len(zone_ids)
        pp = np.repeat(np.arange(P), Z)
        zz = np.tile(zone_ids, P)
        d = score_points_flat(px[pp], py[pp], zz, prep)
        hit = d > 0
        cols = {}
        for c in keep:
            vals = group.column(c).to_numpy(zero_copy_only=False)[pidx]
            cols[c] = pa.array(vals[pp[hit]], type=pa.int64())
        cols["zone_id"] = pa.array(zz[hit], type=pa.int64())
        return pa.table(cols)

    from .util import coalesce_for_shuffle

    both = coalesce_for_shuffle(pts.union(zones_ds))
    return both.groupby("cell_id").map_groups(join_cell, batch_format="pyarrow")


class KnnTiles:
    """map_batches stage: k nearest tile centers per label point via the
    neighbor-ring candidate set; appends rank (1-based), tile_id, dist2."""

    def __init__(self, tile_res: int = DEFAULT_TILE_RES, k: int = 3,
                 keep_cols: tuple = ("doc_num",)):
        self.tile_res = tile_res
        self.k = k
        self.keep_cols = list(keep_cols)
        # relative 5x5 candidate offsets, built once per actor
        d = np.arange(-2, 3, dtype=np.int64)
        ox, oy = np.meshgrid(d, d, indexing="ij")
        self.ox = ox.ravel()
        self.oy = oy.ravel()

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch.column("label_x").to_numpy()
        py = batch.column("label_y").to_numpy()
        n = 1 << self.tile_res
        size = WORLD_SIZE / n
        ix, iy = grid_coords(px, py, self.tile_res)
        cx = ix[:, None] + self.ox[None, :]
        cy = iy[:, None] + self.oy[None, :]
        valid = (cx >= 0) & (cx < n) & (cy >= 0) & (cy < n)
        ccx = WORLD_MIN + (cx + 0.5) * size
        ccy = WORLD_MIN + (cy + 0.5) * size
        dist2 = (px[:, None] - ccx) ** 2 + (py[:, None] - ccy) ** 2
        dist2 = np.where(valid, dist2, np.inf)
        tid = encode_cells(
            np.clip(cx, 0, n - 1).ravel(), np.clip(cy, 0, n - 1).ravel(), self.tile_res
        ).reshape(dist2.shape)
        # rank by (dist2, tile_id) — deterministic under exact-dyadic ties
        order = np.lexsort((tid, dist2), axis=-1)[:, : self.k]
        P = len(px)
        rows = np.repeat(np.arange(P), self.k)
        sel_t = np.take_along_axis(tid, order, axis=1).ravel()
        sel_d = np.take_along_axis(dist2, order, axis=1).ravel()
        ranks = np.tile(np.arange(1, self.k + 1), P)
        out = batch.select(self.keep_cols).take(pa.array(rows))
        return (
            out.append_column("knn_rank", pa.array(ranks, type=pa.int64()))
            .append_column("tile_id", pa.array(sel_t, type=pa.int64()))
            .append_column("dist2", pa.array(sel_d, type=pa.float64()))
        )
