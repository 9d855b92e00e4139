"""Tile rendering: per-tile raster (point-density grid) and vector
(clipped zone geometry + points) payloads.

This is the wide stage: rows are grouped by ``tile_id``
(``ds.groupby("tile_id").map_groups(...)`` — the one all-to-all shuffle in
the flagship pipeline) and each group renders independently.  Raster
payloads are raw little-endian uint32 grids here; real spec-compliant
PNG encoding of the grids lives in ``functions/png.py`` (pure-stdlib
codec) and runs as a downstream stateless map — see the
``tile_png_stats`` query.  Vector payloads are the tile-clipped zone
rectangles plus the points, serialized as plain float64 arrays.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_TILE_RES, WORLD_MIN, WORLD_SIZE
from .cells import cell_bounds
from .join import N_ZONES, zone_table


class TileRenderer:
    """map_groups callable: one group = one tile's points."""

    def __init__(self, tile_res: int = DEFAULT_TILE_RES, raster_px: int = 64):
        self.tile_res = tile_res
        self.px = raster_px
        z = zone_table()
        self.z = z

    def __call__(self, group: pa.Table) -> pa.Table:
        tid = int(group.column("tile_id")[0].as_py())
        x = group.column("label_x").to_numpy()
        y = group.column("label_y").to_numpy()
        (x0,), (y0,), (x1,), (y1,) = cell_bounds(np.array([tid]))

        # raster: point-count grid, row-major from (x0, y0)
        gx = np.clip(((x - x0) / (x1 - x0) * self.px).astype(np.int64), 0, self.px - 1)
        gy = np.clip(((y - y0) / (y1 - y0) * self.px).astype(np.int64), 0, self.px - 1)
        grid = np.zeros((self.px, self.px), dtype=np.uint32)
        np.add.at(grid, (gy, gx), 1)

        # vector: zones clipped to the tile bbox + the points themselves
        z = self.z
        cx0 = np.maximum(z["x0"], x0)
        cy0 = np.maximum(z["y0"], y0)
        cx1 = np.minimum(z["x1"], x1)
        cy1 = np.minimum(z["y1"], y1)
        keep = (cx0 < cx1) & (cy0 < cy1)
        clipped = np.column_stack(
            [z["zone_id"][keep].astype(np.float64), cx0[keep], cy0[keep], cx1[keep], cy1[keep]]
        )

        return pa.table(
            {
                "tile_id": pa.array([tid], type=pa.int64()),
                "n_points": pa.array([len(x)], type=pa.int64()),
                "n_zones_clipped": pa.array([int(keep.sum())], type=pa.int64()),
                "raster": pa.array([grid.tobytes()], type=pa.binary()),
                "raster_nonzero": pa.array([int((grid > 0).sum())], type=pa.int64()),
                "raster_sum": pa.array([int(grid.sum())], type=pa.int64()),
                "vector": pa.array([clipped.tobytes()], type=pa.binary()),
                "points_x": pa.array([np.sort(x).tolist()], type=pa.list_(pa.float64())),
                "points_y": pa.array([np.sort(y).tolist()], type=pa.list_(pa.float64())),
            }
        )


def render_tiles(ds, tile_res: int = DEFAULT_TILE_RES, raster_px: int = 64,
                 salt: int = 1):
    """Dataset with (tile_id, label_x, label_y) -> one row per tile.

    ``salt > 1`` enables hot-key salting (SURVEY.md §4.2): rows are spread
    over ``(tile_id, salt)`` sub-groups rendered independently, then the
    sub-rasters are summed in a second (tiny) groupby — so one mega-tile
    cannot pin a single reducer.  Output is identical to the unsalted path
    (rasters are additive; point lists re-sorted on merge)."""
    renderer = TileRenderer(tile_res=tile_res, raster_px=raster_px)

    def render_tile_group(group: pa.Table) -> pa.Table:
        return renderer(group)

    from .util import coalesce_for_shuffle

    if salt <= 1:
        return coalesce_for_shuffle(ds).groupby("tile_id").map_groups(
            render_tile_group, batch_format="pyarrow"
        )

    def add_salt(batch: pa.Table) -> pa.Table:
        x = batch.column("label_x").to_numpy()
        s = (np.abs(x * 64389.0).astype(np.int64)) % salt
        return batch.append_column("salt", pa.array(s, type=pa.int64()))

    salted = coalesce_for_shuffle(
        ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
    )
    partial = salted.groupby(["tile_id", "salt"]).map_groups(
        render_tile_group, batch_format="pyarrow"
    )

    px2 = raster_px

    def merge_tile(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        grid = np.zeros((px2, px2), dtype=np.uint32)
        xs, ys = [], []
        for r in rows:
            grid += np.frombuffer(r["raster"], dtype=np.uint32).reshape(px2, px2)
            xs.extend(r["points_x"])
            ys.extend(r["points_y"])
        first = rows[0]
        return pa.table({
            "tile_id": pa.array([first["tile_id"]], type=pa.int64()),
            "n_points": pa.array([sum(r["n_points"] for r in rows)], type=pa.int64()),
            "n_zones_clipped": pa.array([first["n_zones_clipped"]], type=pa.int64()),
            "raster": pa.array([grid.tobytes()], type=pa.binary()),
            "raster_nonzero": pa.array([int((grid > 0).sum())], type=pa.int64()),
            "raster_sum": pa.array([int(grid.sum())], type=pa.int64()),
            "vector": pa.array([first["vector"]], type=pa.binary()),
            "points_x": pa.array([sorted(xs)], type=pa.list_(pa.float64())),
            "points_y": pa.array([sorted(ys)], type=pa.list_(pa.float64())),
        })

    return partial.groupby("tile_id").map_groups(merge_tile, batch_format="pyarrow")
