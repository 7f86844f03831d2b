"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in pythongis_ray) calls ray.init()/ray.shutdown().

- entry(): flagship pipeline on sf0.001 (pages → geocode → spatial join
  → per-zone/lang aggregate); returns a ray.data.Dataset.
- queries(): one callable per implemented operator (SURVEY.md §2 +
  training-data ops); each takes sf_dir.
- oracle_sql(): bit-exact DuckDB equivalents (see pythongis_ray/
  queries.py for the exactness contract); non-SQL-expressible ops
  (LSH/IVF/geodetic/warp — seeded projections, iterative or
  transcendental) are omitted → rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001."""
    from pythongis_ray import pipelines

    return pipelines.flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from pythongis_ray import queries as q

    return q.get_queries()


def oracle_sql() -> dict[str, str]:
    from pythongis_ray import queries as q

    return q.get_oracle_sql()
