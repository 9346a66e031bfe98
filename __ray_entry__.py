"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB.

No ``ray.init``/``ray.shutdown`` happens here or in the library (driver
owns the session); ``bench.py``, CLI scripts and the pytest fixture own
their own sessions.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# Make the repo importable when this module is loaded by file path. NOTE:
# Ray *workers* resolve `dug_ray` through the driver's working directory —
# run driver processes from the repo root (the driver harness does).
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry() -> Any:
    """Flagship pipeline: documents -> KG triple table at sf0.001."""
    from dug_ray.pipelines import kg
    return kg.kg_triples("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from dug_ray import queries as q
    return dict(q.QUERIES)


def oracle_sql() -> dict[str, str]:
    from dug_ray import queries as q
    return dict(q.ORACLES)
