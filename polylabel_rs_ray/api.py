"""Convenience API mirroring the reference's Python harness.

``label_position(ext, interiors, tolerance)`` accepts an exterior ring (list
of [x, y]) and optional interior rings, returning an (x, y) tuple — the same
call shape as the reference's ctypes harness ``label_position``
(/root/reference/ffi.py:116-131), minus the shapely dependency (pass plain
coordinate lists; anything with ``exterior.coords``/``interiors`` duck-types
too).  Errors return ``(nan, nan)`` like the FFI boundary
(/root/reference/src/ffi.rs:78-80)."""

from __future__ import annotations

import numpy as np

from .geom.kernel import polylabel_one


def label_position(ext, interiors=None, tolerance: float = 1.0) -> tuple[float, float]:
    """f32 inputs are honored like the reference's generic ``T: GeoFloat``
    (src/lib.rs:336-339): coordinates are upcast for the search (>= f32
    precision) and the result is returned in the input's dtype."""
    f32_in = False
    if hasattr(ext, "exterior"):  # shapely-like Polygon object
        poly = ext
        rings = [np.asarray(list(poly.exterior.coords), dtype=np.float64)]
        rings += [np.asarray(list(r.coords), dtype=np.float64) for r in poly.interiors]
    else:
        arrs = [np.asarray(ext)] + [np.asarray(inner) for inner in interiors or []]
        f32_in = all(a.dtype == np.float32 for a in arrs)
        rings = [a.astype(np.float64, copy=False).reshape(-1, 2) for a in arrs]
    x, y, _d, _a, _e = polylabel_one(rings, float(tolerance))
    if f32_in:
        return (np.float32(x), np.float32(y))
    return (x, y)
