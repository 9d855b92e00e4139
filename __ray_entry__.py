"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline on sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 with
DuckDB oracles where SQL-expressible.  Ray is initialised by the driver
before this module is imported — nothing here calls ray.init/shutdown.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline: interleaved docs -> label -> cell-encode -> tiles."""
    from polylabel_rs_ray.pipelines.flagship import flagship_pipeline

    return flagship_pipeline(SF0001)


def queries() -> dict[str, Callable[[str], Any]]:
    from polylabel_rs_ray.pipelines.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from polylabel_rs_ray.pipelines.queries import build_oracles

    return build_oracles()
