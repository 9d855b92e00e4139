"""Extract the reference's polygon fixture *data* (coordinates only) into a
binary .npz shipped with the package.

The reference stores fixtures as Rust literals:
  tests/fixtures/poly{1,2,3}.rs  -> ``vec![ (x, y), ... ]`` with ``_`` digit
                                    separators
  data/norway_main.rs            -> ``vec![[x, y], ...]``

This script parses the numbers (pure data — no code is copied) and writes
``polylabel_rs_ray/sources/fixture_data.npz`` with one (n, 2) float64 array per
fixture. Run once at build time; the npz is committed.
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

REF = Path("/root/reference")
OUT = Path(__file__).resolve().parent.parent / "polylabel_rs_ray" / "sources" / "fixture_data.npz"

NUM = re.compile(r"-?\d[\d_]*\.?[\d_]*(?:[eE]-?\d+)?")


def parse_rust_coords(path: Path) -> np.ndarray:
    text = path.read_text()
    nums = [float(m.group(0).replace("_", "")) for m in NUM.finditer(text)]
    if len(nums) % 2:
        raise ValueError(f"odd number of floats in {path}")
    return np.asarray(nums, dtype=np.float64).reshape(-1, 2)


def main() -> None:
    arrays = {
        "poly1": parse_rust_coords(REF / "tests" / "fixtures" / "poly1.rs"),
        "poly2": parse_rust_coords(REF / "tests" / "fixtures" / "poly2.rs"),
        "poly3": parse_rust_coords(REF / "tests" / "fixtures" / "poly3.rs"),
        "norway_main": parse_rust_coords(REF / "data" / "norway_main.rs"),
    }
    for name, arr in arrays.items():
        print(name, arr.shape, arr[0], arr[-1])
    np.savez_compressed(OUT, **arrays)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
