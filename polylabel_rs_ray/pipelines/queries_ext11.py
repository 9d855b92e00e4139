"""Round-2 extension operators, batch 12: shape metrology.

``diameter_stats`` — per-polygon diameter^2 (max pairwise squared
distance, computed over the convex hull — the rotating-calipers answer)
and perimeter of the bbox-normalized exterior ring.  Same execution
shape as the label kernel (per-row geometry kernel in map_batches) and
the same dyadic-constant oracle discipline as ``hull_stats``: both
metrics are translation-invariant bit-for-bit on the dyadic fixtures,
so the SQL replays engine-derived per-fixture constants."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.ops import ring_diameter_sq, ring_perimeter
from ..sources import docs as docs_mod
from ..sources.fixtures import DYADIC_FIXTURES, FIXTURE_CYCLE, FIXTURES
from .queries_ext import DYADIC_IDX, _dyadic_rings_ds, _norm_exterior


def _shape_stage(batch: pa.Table) -> pa.Table:
    from ..stages.label import rings_to_numpy

    polys = rings_to_numpy(batch.column("rings"))
    doc = batch.column("doc_num").to_numpy()
    dsq = np.empty(len(polys), dtype=np.float64)
    per = np.empty(len(polys), dtype=np.float64)
    for i, rings in enumerate(polys):
        ext = _norm_exterior(rings)
        dsq[i] = ring_diameter_sq(ext)
        per[i] = ring_perimeter(ext)
    return pa.table({
        "doc_num": pa.array(doc, type=pa.int64()),
        "fixture_idx": pa.array(doc % docs_mod.N_FIXTURES, type=pa.int64()),
        "diam_sq": pa.array(dsq, type=pa.float64()),
        "perimeter": pa.array(per, type=pa.float64()),
    })


def q_diameter_stats(sf_dir: str):
    return _dyadic_rings_ds(sf_dir).map_batches(
        _shape_stage, batch_format="pyarrow", zero_copy_batch=True
    )


def _sql_diameter_stats() -> str:
    cases_d, cases_p = [], []
    for name in DYADIC_FIXTURES:
        f = FIXTURE_CYCLE.index(name)
        ext = _norm_exterior(
            [np.asarray(r, dtype=np.float64) for r in FIXTURES[name].rings]
        )
        cases_d.append(f"WHEN {f} THEN {ring_diameter_sq(ext)!r}")
        cases_p.append(f"WHEN {f} THEN {ring_perimeter(ext)!r}")
    n = docs_mod.N_FIXTURES
    mods = ",".join(str(m) for m in DYADIC_IDX)
    return f"""
        SELECT doc_id AS doc_num, doc_id % {n} AS fixture_idx,
               CASE doc_id % {n} {' '.join(cases_d)} END AS diam_sq,
               CASE doc_id % {n} {' '.join(cases_p)} END AS perimeter
        FROM documents WHERE doc_id % {n} IN ({mods})
    """


def build_queries_ext11() -> dict:
    return {"diameter_stats": q_diameter_stats}


def build_oracles_ext11() -> dict:
    return {"diameter_stats": _sql_diameter_stats()}
