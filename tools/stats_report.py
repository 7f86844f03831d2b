"""Print Ray Data per-stage execution stats for the flagship pipelines.

The tuning loop the engine was built with: run a pipeline, read
`ds.stats()`, attack the stage that dominates wall time. Usage:

    python tools/stats_report.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pythongis_ray import pipelines, queries as q, spatial

    print("=" * 70)
    print("broadcast spatial join (points x zones)")
    print("=" * 70)
    pts = q.points_lineitem(sf_dir)
    zones = pipelines.load_zones(sf_dir)
    joined = spatial.spatial_join(pts, zones[["zone_id", "geometry"]],
                                  predicate="within")
    m = joined.materialize()
    print(m.stats())

    print("=" * 70)
    print("flagship pages pipeline (synthesize -> geocode -> join -> agg)")
    print("=" * 70)
    agg = pipelines.flagship(sf_dir)
    m2 = agg.materialize()
    print(m2.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
