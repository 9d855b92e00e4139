"""Resumable partitioned runs: manifests, skip-on-resume, staleness."""

import json
import os

import pyarrow.parquet as pq

from polylabel_rs_ray.state.manifest import (
    input_fingerprint,
    is_complete,
    manifest_path,
    pending_partitions,
)


def test_run_and_resume(ray_session, tmp_path):
    from polylabel_rs_ray.run import build_partition_descs, run

    out = str(tmp_path / "run1")
    s1 = run(out, n_docs=360, n_parts=4)
    assert s1["partitions"] == 4
    assert s1["rows"] == 360
    assert s1["resumed_skipped"] == 0

    # all partitions complete -> nothing pending
    parts = build_partition_descs(360, 4, 8, 5)
    assert pending_partitions(out, parts) == []

    # delete one manifest -> only that partition pending; resume redoes it
    os.remove(manifest_path(out, 2))
    assert pending_partitions(out, parts) == [2]
    s2 = run(out, n_docs=360, n_parts=4)
    assert s2["resumed_skipped"] == 3
    assert s2["rows"] == 360

    # outputs identical after resume (deterministic synthesis + kernel)
    t = pq.read_table(os.path.join(out, "part-00002", "data.parquet"))
    assert t.num_rows == 90
    assert "label_x" in t.column_names and "spans" in t.column_names

    # a changed input fingerprint marks the partition stale
    desc = dict(parts[2])
    desc["hi"] += 1
    assert not is_complete(out, 2, input_fingerprint(desc))
    assert is_complete(out, 2, input_fingerprint(parts[2]))


def test_tiles_phase(ray_session, tmp_path):
    from polylabel_rs_ray.run import run

    out = str(tmp_path / "run2")
    s = run(out, n_docs=180, n_parts=2, tiles=True)
    files = os.listdir(s["tiles_dir"])
    assert any(f.endswith(".parquet") for f in files)
    tiles = pq.read_table(s["tiles_dir"])
    assert tiles.column("n_points").to_pandas().sum() == 180

    with open(os.path.join(out, "_RUN_SUMMARY.json")) as f:
        summary = json.load(f)
    assert summary["rows"] == 180
