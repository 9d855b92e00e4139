"""CLI runner: the flagship pipeline with resumable partitioned output.

    python -m polylabel_rs_ray.run --out /tmp/labels_run --n-docs 20000 \
        --partitions 16 [--tiles] [--num-cpus 32]

Phase 1 (resumable): doc-id-range partitions -> synthesize -> label ->
cell-encode -> per-partition parquet + lineage manifest.  A re-run skips
partitions whose manifest matches the input fingerprint.
Phase 2: tile rendering over the labeled output (the groupby(tile_id)
shuffle), written beside it.

On a multi-node deployment this module is the ``ray job submit`` entry;
partition count scales with cluster size and doc-id ranges shard the input
table without coordination."""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import pyarrow as pa


def build_partition_descs(n_docs: int, n_parts: int, cell_res: int, tile_res: int) -> list[dict]:
    bounds = np.linspace(0, n_docs, n_parts + 1, dtype=np.int64)
    return [
        {
            "kind": "doc_id_range",
            "lo": int(bounds[i]),
            "hi": int(bounds[i + 1]),
            "cell_res": cell_res,
            "tile_res": tile_res,
            "pipeline": "label+cells:v1",
        }
        for i in range(n_parts)
    ]


def run_label_partition(desc: dict) -> pa.Table:
    import ray

    from .sources.docs import attach_interleaved
    from .stages.cells import append_cell_columns
    from .stages.label import label_points

    # one dominant compute stage -> per-op CPU reservation only starves it
    ray.data.DataContext.get_current().op_resource_reservation_enabled = False

    n = desc["hi"] - desc["lo"]
    ds = ray.data.range(n, override_num_blocks=max(n // 300, 8))

    lo = desc["lo"]

    def to_doc_ids(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy() + lo
        return attach_interleaved(pa.table({"doc_id": pa.array(ids, type=pa.int64())}))

    ds = ds.map_batches(to_doc_ids, batch_format="pyarrow", zero_copy_batch=True)
    ds = label_points(ds, batch_size=300)

    def encode(batch: pa.Table) -> pa.Table:
        return append_cell_columns(
            batch, cell_res=desc["cell_res"], tile_res=desc["tile_res"]
        )

    ds = ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.drop_columns(["rings"])  # labels + lineage only in the sink
    # one partition's output is bounded by construction (n_docs / n_parts
    # rows), so collecting its blocks to write a single partition file is a
    # small-result materialization, not a whole-dataset one
    return pa.concat_tables(ray.get(ds.to_arrow_refs()))


def run(out_dir: str, n_docs: int, n_parts: int, *, tiles: bool = False,
        cell_res: int | None = None, tile_res: int | None = None) -> dict:
    from .config import DEFAULT_CELL_RES, DEFAULT_TILE_RES
    from .state.manifest import run_partitioned, write_summary

    cell_res = cell_res or DEFAULT_CELL_RES
    tile_res = tile_res or DEFAULT_TILE_RES
    parts = build_partition_descs(n_docs, n_parts, cell_res, tile_res)
    t0 = time.time()
    summary = run_partitioned(out_dir, parts, run_label_partition)
    summary["label_wall_s"] = time.time() - t0

    if tiles:
        import ray

        from .stages.tiles import render_tiles

        ds = ray.data.read_parquet(
            [os.path.join(out_dir, d, "data.parquet") for d in sorted(os.listdir(out_dir))
             if d.startswith("part-")],
            columns=["tile_id", "label_x", "label_y"],
        )
        tile_out = os.path.join(out_dir, "tiles")
        render_tiles(ds).write_parquet(tile_out)
        summary["tiles_dir"] = tile_out
    return write_summary(out_dir, summary)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-docs", type=int, default=20_000)
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--tiles", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    summary = run(args.out, args.n_docs, args.partitions, tiles=args.tiles)
    print(summary)
    ray.shutdown()


if __name__ == "__main__":
    main()
