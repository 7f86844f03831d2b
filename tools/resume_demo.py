"""Kill/resume demonstration (BASELINE.json resumability criterion).

Runs the flagship joined-pages pipeline into a resumable partitioned
sink. With GRAFT_CRASH_AFTER=<k> set, the sink raises after writing k
partitions — simulating a killed `ray job submit` run mid-write. A
rerun without the env var resumes from the partition manifest, writes
only the missing partitions, and the final output is byte-identical to
an uninterrupted run (verified by tests/test_resume.py, including the
per-url text byte-identity invariant).

Usage: python tools/resume_demo.py <out_dir> [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class CrashError(RuntimeError):
    pass


def main():
    import ray

    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    crash_after = int(os.environ.get("GRAFT_CRASH_AFTER", "0"))

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pythongis_ray import checkpoint, pipelines

    ds = pipelines.flagship_joined_pages(sf_dir)

    if crash_after > 0:
        # monkeypatch the partition writer to die after k partitions —
        # the manifest entries already written stay on disk, exactly
        # like a killed job
        orig = checkpoint.write_partition
        state = {"n": 0}

        def crashing(table, out_dir_, part, lineage=None):
            if state["n"] >= crash_after:
                raise CrashError(f"injected crash after {crash_after} partitions")
            state["n"] += 1
            return orig(table, out_dir_, part, lineage)

        checkpoint.write_partition = crashing

    try:
        metrics = checkpoint.write_partitioned(ds, out_dir, key_col="page_id",
                                               num_partitions=8)
        print(f"WROTE {len(metrics)} partitions, {int(metrics.rows.sum())} rows")
    except Exception as e:  # noqa: BLE001 — the injected crash path
        print(f"CRASHED: {type(e).__name__}: {e}")
        ray.shutdown()
        sys.exit(17)
    ray.shutdown()


if __name__ == "__main__":
    main()
