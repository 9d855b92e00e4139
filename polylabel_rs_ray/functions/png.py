"""Pure-stdlib PNG codec (zlib + struct) for raster tile payloads.

Closes the "PNG encoding of rasters is out of scope" gap noted in
``stages/tiles.py``: tile rasters can now ship as real, spec-compliant
PNG files with zero external dependencies (``zlib`` is the container's
stdlib DEFLATE; chunk CRCs via ``zlib.crc32``).

Supported pixel layouts (PNG spec, ISO/IEC 15948):

===========  ==========  =========  =====================
color type   bit depth   numpy in   meaning
===========  ==========  =========  =====================
0 gray       8           (h,w) u8   grayscale
0 gray       16          (h,w) u16  grayscale, big-endian
2 RGB        8           (h,w,3) u8 truecolor
6 RGBA       8           (h,w,4) u8 truecolor + alpha
===========  ==========  =========  =====================

Count grids (``uint32`` tile rasters) encode losslessly:

* ``max < 2**16`` -> 16-bit grayscale (the natural heatmap form);
* otherwise     -> RGBA8, each pixel the big-endian uint32 (exact for
  any count — a display pipeline would tone-map, the engine keeps the
  data path lossless).

Everything is deterministic: fixed zlib level, fixed filter choice, so
the bytes are stable across runs (resume/fingerprint-safe).

The decoder understands all five PNG scanline filters (None/Sub/Up/
Average/Paeth) so it can read third-party baseline PNGs of the layouts
above, not just its own output (no interlace, no palette).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"

# (color_type, bit_depth) -> channels
_LAYOUTS = {(0, 8): 1, (0, 16): 1, (2, 8): 3, (6, 8): 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _to_scanbytes(arr: np.ndarray) -> tuple[np.ndarray, int, int]:
    """array -> (h x rowbytes uint8 matrix, color_type, bit_depth)."""
    if arr.ndim == 2:
        if arr.dtype == np.uint8:
            ct, bd = 0, 8
            rows = arr
        elif arr.dtype == np.uint16:
            ct, bd = 0, 16
            rows = arr.astype(">u2").view(np.uint8).reshape(arr.shape[0], -1)
        else:
            raise ValueError(f"grayscale PNG needs uint8/uint16, got {arr.dtype}")
    elif arr.ndim == 3 and arr.dtype == np.uint8 and arr.shape[2] in (3, 4):
        ct = 2 if arr.shape[2] == 3 else 6
        bd = 8
        rows = arr.reshape(arr.shape[0], -1)
    else:
        raise ValueError(f"unsupported PNG array: shape={arr.shape} dtype={arr.dtype}")
    return np.ascontiguousarray(rows), ct, bd


_FILTERS = {"none": 0, "sub": 1, "up": 2, "average": 3, "paeth": 4}


def encode_png(arr: np.ndarray, *, filter: str = "up", level: int = 6) -> bytes:
    """Encode a numpy image (see module table) as a baseline PNG.

    ``filter`` applies ONE filter type to every scanline (deterministic;
    "up" is cheap to apply vectorized and compresses count grids well).
    """
    rows, ct, bd = _to_scanbytes(arr)
    h, rowbytes = rows.shape
    w = arr.shape[1]
    ftype = _FILTERS[filter]
    bpp = max(1, (_LAYOUTS[(ct, bd)] * bd) // 8)

    prior = np.zeros_like(rows[0:1])
    if ftype == 0:
        filt = rows
    elif ftype == 1:  # Sub: x - left
        left = np.zeros_like(rows)
        left[:, bpp:] = rows[:, :-bpp]
        filt = rows - left
    elif ftype == 2:  # Up: x - above
        above = np.vstack([prior, rows[:-1]])
        filt = rows - above
    elif ftype == 3:  # Average: x - (left + above)//2
        left = np.zeros_like(rows)
        left[:, bpp:] = rows[:, :-bpp]
        above = np.vstack([prior, rows[:-1]])
        filt = rows - ((left.astype(np.uint16) + above) // 2).astype(np.uint8)
    else:  # Paeth
        left = np.zeros_like(rows)
        left[:, bpp:] = rows[:, :-bpp]
        above = np.vstack([prior, rows[:-1]])
        ul = np.zeros_like(rows)
        ul[1:, bpp:] = rows[:-1, :-bpp]
        filt = rows - _paeth(left, above, ul)

    raw = np.empty((h, rowbytes + 1), dtype=np.uint8)
    raw[:, 0] = ftype
    raw[:, 1:] = filt
    ihdr = struct.pack(">IIBBBBB", w, h, bd, ct, 0, 0, 0)
    idat = zlib.compress(raw.tobytes(), level)
    return SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec 9.4) on uint8 arrays."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa_ = np.abs(p - a16)
    pb = np.abs(p - b16)
    pc = np.abs(p - c16)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode a baseline PNG of a supported layout back to numpy.

    Handles all five scanline filters; rejects interlace/palette.
    Returns uint8 ``(h,w)`` / ``(h,w,3)`` / ``(h,w,4)`` or uint16 ``(h,w)``.
    """
    if data[:8] != SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    w = h = bd = ct = None
    idat = []
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r}: CRC mismatch")
        if tag == b"IHDR":
            w, h, bd, ct, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            if (ct, bd) not in _LAYOUTS:
                raise ValueError(f"unsupported PNG layout: color={ct} depth={bd}")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    nch = _LAYOUTS[(ct, bd)]
    bpp = max(1, (nch * bd) // 8)
    rowbytes = (w * nch * bd) // 8
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (rowbytes + 1):
        raise ValueError("PNG IDAT size mismatch")
    raw = raw.reshape(h, rowbytes + 1)
    out = np.zeros((h, rowbytes), dtype=np.uint8)
    prev = np.zeros(rowbytes, dtype=np.uint8)
    for y in range(h):
        f = int(raw[y, 0])
        line = raw[y, 1:].copy()
        if f == 0:
            pass
        elif f == 1:  # Sub — sequential in bpp strides
            for x in range(bpp, rowbytes):
                line[x] = (int(line[x]) + int(line[x - bpp])) & 0xFF
        elif f == 2:  # Up
            line += prev
        elif f == 3:  # Average
            for x in range(rowbytes):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(rowbytes):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = line
        prev = out[y]
    if ct == 0 and bd == 16:
        return out.reshape(h, w, 2).view(">u2").reshape(h, w).astype(np.uint16)
    if ct == 0:
        return out.reshape(h, w)
    return out.reshape(h, w, nch)


def encode_count_grid(grid: np.ndarray) -> tuple[bytes, str]:
    """Lossless PNG for a uint32 count grid (tile raster).

    gray16 when every count fits 16 bits (the display-friendly form),
    else RGBA8 carrying the big-endian uint32 exactly.
    Returns ``(png_bytes, mode)``.
    """
    if grid.dtype != np.uint32 or grid.ndim != 2:
        raise ValueError("count grid must be 2-D uint32")
    if grid.size == 0 or int(grid.max()) < (1 << 16):
        return encode_png(grid.astype(np.uint16)), "gray16"
    quads = grid.astype(">u4").view(np.uint8).reshape(grid.shape[0], grid.shape[1], 4)
    return encode_png(quads), "rgba8"


def decode_count_grid(data: bytes) -> np.ndarray:
    """Inverse of :func:`encode_count_grid` -> uint32 grid."""
    arr = decode_png(data)
    if arr.ndim == 2 and arr.dtype == np.uint16:
        return arr.astype(np.uint32)
    if arr.ndim == 3 and arr.shape[2] == 4:
        return arr.astype(np.uint8).view(">u4").reshape(arr.shape[0], arr.shape[1]).astype(np.uint32)
    raise ValueError(f"not a count-grid PNG: shape={arr.shape} dtype={arr.dtype}")
