"""Benchmark harness (driver contract).

Runs the headline pipelines over $GRAFT_SF_DIR (default sf0.1) with a
fresh local Ray at $RAY_GRAFT_CPUS (default 32) and prints ONE JSON
line. `--scaling` runs the headline job in two fresh subprocesses at
num_cpus=8 and num_cpus=32 on the same input and reports both
throughputs + scaling efficiency (the in-sandbox stand-in for the
N-vs-4N-node criterion in BASELINE.json).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def run_benchmarks() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pythongis_ray import embed, pipelines, queries as q, spatial, text

    import pandas as pd

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # warm the page cache so we measure compute+shuffle, not first read
    import ray.data as rd
    rd.read_parquet(f"{SF_DIR}/lineitem.parquet").count()

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    # 1. headline: broadcast spatial join of geocoded points → count
    def spjoin():
        pts = q.points_lineitem(SF_DIR)
        zones = pipelines.load_zones(SF_DIR)
        joined = spatial.spatial_join(pts, zones[["zone_id", "geometry"]],
                                      predicate="within")
        return joined.count()

    joined_rows = timed("spjoin_points", spjoin)
    extras["spjoin_joined_rows"] = joined_rows
    extras["spjoin_rows_per_sec"] = round(joined_rows / timings["spjoin_points"], 1)

    # 2. same join through the salted shuffle path
    def spjoin_shuffle():
        import ray.data as rd
        pts = q.points_lineitem(SF_DIR)
        zones = pipelines.load_zones(SF_DIR)
        zds = rd.from_pandas(zones[["zone_id", "geometry"]])
        return spatial.spatial_join_shuffle(pts, zds, predicate="within").count()

    timed("spjoin_shuffle", spjoin_shuffle)

    # 3. flagship pages pipeline (wide rows: html+text carried to the join)
    timed("flagship_pages", lambda: pipelines.flagship(SF_DIR, replicate=20)
          .to_pandas().n_pages.sum())

    # 4. kNN join
    def knn():
        cpts = q._keyed_points(SF_DIR, "customer", "c_custkey", 4, 1, "ck")
        ppts = q._keyed_points(SF_DIR, "part", "p_partkey", 4, 2, "place_id").to_pandas()
        return spatial.knn_join(cpts, ppts, k=3, id_col="place_id").count()

    timed("knn", knn)

    # 5. zonal statistics
    timed("zonal_stats", lambda: len(q.q_zonal_stats(SF_DIR)))

    # 6. grouped aggregate (combiner path)
    timed("agg_pricing", lambda: q.q_agg_pricing(SF_DIR).count())

    # 7. exact dedup by content fingerprint
    timed("dedup_docs", lambda: q.q_dedup_docs(SF_DIR).count())

    # 8. word frequency top-k
    timed("word_topk", lambda: len(q.q_word_topk(SF_DIR)))

    # 9. ANN top-k over embeddings
    timed("ann_topk", lambda: len(q.q_ann_topk(SF_DIR)))

    # 10. event-time window aggregate
    timed("window_events", lambda: q.q_window_events(SF_DIR).count())

    ray.shutdown()
    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline pipeline suite wall time (spatial join + flagship + 8 ops)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "extras": extras,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    t_lo = lo["queries"]["spjoin_points"] + lo["queries"]["flagship_pages"]
    t_hi = hi["queries"]["spjoin_points"] + hi["queries"]["flagship_pages"]
    eff = (t_lo / t_hi) / (32 / 8)
    return {
        "metric": "scaling efficiency (8 vs 32 cpus, headline join+flagship)",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "total_sec_8": lo["value"],
        "total_sec_32": hi["value"],
        "rows_per_sec_8": lo["extras"]["spjoin_rows_per_sec"],
        "rows_per_sec_32": hi["extras"]["spjoin_rows_per_sec"],
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_benchmarks()))
