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


def labeled_output(sf_dir: str, *, encoder_concurrency: int = 2):
    """The per-document output table in the exact FIXTURES.md §3 schema:

        doc_id, spans (pass-through, order-preserved), label struct<x,y>,
        label_dist, area, label_error (nullable), cell_id, tile_id
    """
    import pyarrow as pa

    ds = read_docs(sf_dir)
    ds = label_points(ds)
    ds = ds.map_batches(
        CellEncoder,
        fn_constructor_kwargs={"cell_res": DEFAULT_CELL_RES, "tile_res": DEFAULT_TILE_RES},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=encoder_concurrency,
    )

    def shape(batch: pa.Table) -> pa.Table:
        label = pa.StructArray.from_arrays(
            [
                batch.column("label_x").combine_chunks()
                if isinstance(batch.column("label_x"), pa.ChunkedArray)
                else batch.column("label_x"),
                batch.column("label_y").combine_chunks()
                if isinstance(batch.column("label_y"), pa.ChunkedArray)
                else batch.column("label_y"),
            ],
            names=["x", "y"],
        )
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "spans": batch.column("spans"),
            "label": label,
            "label_dist": batch.column("label_dist"),
            "area": batch.column("area"),
            "label_error": batch.column("label_error"),
            "cell_id": batch.column("cell_id"),
            "tile_id": batch.column("tile_id"),
        })

    return ds.map_batches(shape, batch_format="pyarrow", zero_copy_batch=True)
