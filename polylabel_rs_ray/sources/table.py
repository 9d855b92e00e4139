"""Table source abstraction: Lance first (per BASELINE.json ``input_hint``),
Parquet fallback.

``pylance`` is not installed in this sandbox, so ``read_table`` resolves the
format at call time: a ``<name>.lance`` dataset directory is read via
``ray.data.read_lance`` when the library exists, else ``<name>.parquet`` via
``ray.data.read_parquet`` — same logical schema, same downstream pipeline.
Column pruning is always pushed to the read."""

from __future__ import annotations

import os


def have_lance() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_table(base_dir: str, name: str, columns: list[str] | None = None, **kwargs):
    """Ray Dataset over ``{base_dir}/{name}.lance`` (if present and readable)
    or ``{base_dir}/{name}.parquet``."""
    import ray

    lance_path = os.path.join(base_dir, f"{name}.lance")
    if os.path.exists(lance_path) and have_lance():
        return ray.data.read_lance(lance_path, columns=columns, **kwargs)
    parquet_path = os.path.join(base_dir, f"{name}.parquet")
    return ray.data.read_parquet(parquet_path, columns=columns, **kwargs)
