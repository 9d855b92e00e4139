"""Round-3 extension operators, batch 50: polygon triangulation.

``triangulate_stats`` — ear-clipping triangulation of each dyadic
document's exterior ring (the tessellation step feeding GPU fills,
area-weighted sampling, and mesh exports), verified by the closure
property that makes it oracle-exact: on dyadic coordinates every ear's
cross product is exactly representable, so the SUM of triangle
twice-areas equals the ring's shoelace twice-area BIT-FOR-BIT, in any
summation order.  Output per document: triangle count (nv - 2 for a
simple ring, 0 for the degenerate zero-area fixtures) and both
twice-areas.  Same execution shape as the label kernel (per-row
geometry in map_batches; the ring loop is per-document like every
geometry kernel here); the oracle replays per-fixture constants from an
INDEPENDENT pure-Python shoelace twin (the diameter_stats discipline,
per round-2 ADVICE).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources import docs as docs_mod


def _strip_close(ext: np.ndarray) -> np.ndarray:
    if len(ext) >= 2 and ext[0][0] == ext[-1][0] and ext[0][1] == ext[-1][1]:
        return ext[:-1]
    return ext


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _point_in_tri(p, a, b, c) -> bool:
    """Strict interior-or-edge containment for CCW triangle (a, b, c)."""
    return (
        _cross(a, b, p) >= 0.0
        and _cross(b, c, p) >= 0.0
        and _cross(c, a, p) >= 0.0
    )


def ear_clip(ext: np.ndarray) -> list[tuple[int, int, int]]:
    """Ear-clipping triangulation of a simple ring (closing vertex
    stripped; CW rings are reversed).  Zero-area rings -> no triangles."""
    pts = _strip_close(np.asarray(ext, dtype=np.float64))
    n = len(pts)
    if n < 3:
        return []
    x, y = pts[:, 0], pts[:, 1]
    area2 = float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
    if area2 == 0.0:
        return []
    order = list(range(n))
    if area2 < 0.0:
        order.reverse()
    tris: list[tuple[int, int, int]] = []
    idx = order[:]
    guard = 0
    while len(idx) > 3 and guard < 4 * n * n:
        guard += 1
        m = len(idx)
        clipped = False
        for k in range(m):
            i0, i1, i2 = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
            a, b, c = pts[i0], pts[i1], pts[i2]
            if _cross(a, b, c) <= 0.0:
                continue  # reflex or collinear corner
            # no other remaining vertex inside the candidate ear
            ok = True
            for j in idx:
                if j in (i0, i1, i2):
                    continue
                if _point_in_tri(pts[j], a, b, c):
                    ok = False
                    break
            if ok:
                tris.append((i0, i1, i2))
                idx.pop(k)
                clipped = True
                break
        if not clipped:  # degenerate remainder (collinear chain)
            break
    if len(idx) == 3:
        i0, i1, i2 = idx
        if _cross(pts[i0], pts[i1], pts[i2]) != 0.0:
            tris.append((i0, i1, i2))
    return [(int(a), int(b), int(c)) for a, b, c in tris]


def tri_area2_sum(ext: np.ndarray, tris) -> float:
    pts = _strip_close(np.asarray(ext, dtype=np.float64))
    s = 0.0
    for i0, i1, i2 in tris:
        s += abs(_cross(pts[i0], pts[i1], pts[i2]))
    return s


def q_triangulate_stats(sf_dir: str):
    from ..stages.label import rings_to_numpy

    from .queries_ext import _dyadic_rings_ds, _norm_exterior

    def stage(batch: pa.Table) -> pa.Table:
        polys = rings_to_numpy(batch.column("rings"))
        doc = batch.column("doc_num").to_numpy()
        n_tris = np.empty(len(polys), dtype=np.int64)
        t2 = np.empty(len(polys), dtype=np.float64)
        s2 = np.empty(len(polys), dtype=np.float64)
        for i, rings in enumerate(polys):
            ext = _strip_close(_norm_exterior(rings))
            tris = ear_clip(ext)
            n_tris[i] = len(tris)
            t2[i] = tri_area2_sum(ext, tris)
            xx, yy = ext[:, 0], ext[:, 1]
            s2[i] = abs(float(np.sum(xx * np.roll(yy, -1) - np.roll(xx, -1) * yy)))
        return pa.table({
            "doc_num": pa.array(doc, type=pa.int64()),
            "fixture_idx": pa.array(doc % docs_mod.N_FIXTURES, type=pa.int64()),
            "n_triangles": pa.array(n_tris, type=pa.int64()),
            "tri_area2": pa.array(t2, type=pa.float64()),
            "shoelace_area2": pa.array(s2, type=pa.float64()),
        })

    return _dyadic_rings_ds(sf_dir).map_batches(
        stage, batch_format="pyarrow", zero_copy_batch=True
    )


def _independent_area2(ext: np.ndarray) -> float:
    """Oracle twin: sequential pure-Python shoelace (no numpy, no engine
    kernels) — exact on dyadic coords, so it equals both engine columns."""
    pts = [(float(a), float(b)) for a, b in _strip_close(ext)]
    s = 0.0
    n = len(pts)
    for i in range(n):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % n]
        s += x0 * y1 - x1 * y0
    return abs(s)


def _sql_triangulate_stats() -> str:
    from ..sources.fixtures import DYADIC_FIXTURES, FIXTURE_CYCLE, FIXTURES

    from .queries_ext import DYADIC_IDX, _norm_exterior

    cases_n, cases_a = [], []
    for name in DYADIC_FIXTURES:
        f = FIXTURE_CYCLE.index(name)
        ext = _strip_close(_norm_exterior(
            [np.asarray(r, dtype=np.float64) for r in FIXTURES[name].rings]
        ))
        a2 = _independent_area2(ext)
        nt = 0 if a2 == 0.0 else len(ext) - 2
        cases_n.append(f"WHEN {f} THEN {nt}")
        cases_a.append(f"WHEN {f} THEN {a2!r}")
    n = docs_mod.N_FIXTURES
    mods = ",".join(str(m) for m in DYADIC_IDX)
    return f"""
        SELECT doc_id AS doc_num, doc_id % {n} AS fixture_idx,
               CAST(CASE doc_id % {n} {' '.join(cases_n)} END AS BIGINT)
                   AS n_triangles,
               CASE doc_id % {n} {' '.join(cases_a)} END AS tri_area2,
               CASE doc_id % {n} {' '.join(cases_a)} END AS shoelace_area2
        FROM documents WHERE doc_id % {n} IN ({mods})
    """


def build_queries_ext50() -> dict:
    return {"triangulate_stats": q_triangulate_stats}


def build_oracles_ext50() -> dict:
    return {"triangulate_stats": _sql_triangulate_stats()}
