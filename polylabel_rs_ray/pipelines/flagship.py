"""Flagship pipeline: the full streaming chain from SURVEY.md §3.4.

    read interleaved docs (doc_id-pruned read, deterministic synthesis)
      -> map_batches(label_batch)            stateless tasks, Arrow zero-copy
      -> map_batches(CellEncoder, ...)       actor pool (per-actor LUTs)
      -> groupby(tile_id).map_groups(render) THE shuffle
      -> tile rows (raster + vector payloads)

Every stage streams; nothing materializes the whole dataset."""

from __future__ import annotations

from ..config import DEFAULT_CELL_RES, DEFAULT_TILE_RES
from ..sources.docs import read_docs
from ..stages.cells import CellEncoder
from ..stages.label import label_points
from ..stages.tiles import render_tiles


def flagship_pipeline(sf_dir: str, *, encoder_concurrency: int = 2):
    ds = read_docs(sf_dir)
    ds = label_points(ds)
    ds = ds.map_batches(
        CellEncoder,
        fn_constructor_kwargs={"cell_res": DEFAULT_CELL_RES, "tile_res": DEFAULT_TILE_RES},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=encoder_concurrency,
    )
    return render_tiles(ds)
