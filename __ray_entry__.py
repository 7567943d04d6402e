"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship spatial pipeline at sf0.001;
``queries()`` exposes every implemented operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL where expressible
(geometry / hashing / model-ish ops get rows-only checks).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` happens here or in the library.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001."""
    from simplepolygon_ray.pipelines.flagship import flagship

    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from simplepolygon_ray.relational.queries import QUERIES as rel
    from simplepolygon_ray.pipelines.catalog import GEO_QUERIES, TEXT_QUERIES, ANN_QUERIES

    out: dict[str, Callable[[str], Any]] = {}
    out.update(rel)
    out.update(GEO_QUERIES)
    out.update(TEXT_QUERIES)
    out.update(ANN_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from simplepolygon_ray.relational.queries import ORACLE_SQL as rel
    from simplepolygon_ray.pipelines.catalog import EXTRA_ORACLE_SQL

    out: dict[str, str] = {}
    out.update(rel)
    out.update(EXTRA_ORACLE_SQL)
    return out
