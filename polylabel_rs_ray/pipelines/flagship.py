"""Flagship pipeline: read interleaved docs -> label -> (cell encode ->
join/tile once built) -> labeled dataset.

Grows as stages land; always returns a streaming Dataset."""

from __future__ import annotations

from ..sources.docs import read_docs
from ..stages.label import label_points


def flagship_pipeline(sf_dir: str):
    ds = read_docs(sf_dir)
    ds = label_points(ds)
    return ds
