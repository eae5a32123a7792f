"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code these
functions touch (only bench.py / CLI scripts / the pytest fixture own a
Ray session).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline: the reference worker's multi-stage quality
    filter (heuristics → gatekeeper → analyzer → verdict + packet
    projection) over the sf0.001 documents table."""
    from crawler_ray.pipelines.flagship import refine_documents

    return refine_documents(SF0001, concurrency=2)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (+ the scale additions: dedup family, ANN, text analysis)."""
    from crawler_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for the non-SQL ops:
    minhash_near_dups, simhash_blocks, doc_fingerprints, language_id)."""
    from crawler_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
