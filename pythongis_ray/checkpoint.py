"""Resumable partitioned-parquet sink with per-partition lineage.

BASELINE.json requires: "streaming with per-partition lineage and
metrics checkpointed to Parquet so a killed run resumes mid-shuffle".
The engine's unit of resumability is the *partition* (a key range of
the cell grid, or any integer partition column):

    out/
      part=<k>/ ...parquet        (written atomically: tmp dir + rename)
      _manifest/part-<k>.json     (lineage: rows, bytes, wall time)

On resume, partitions with a manifest entry are skipped entirely —
including their upstream work, because the skip is pushed into the
*read/filter* stage, not the sink (a killed shuffle re-runs only the
missing partitions' inputs).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def partition_of(values: np.ndarray, num_partitions: int) -> np.ndarray:
    """Deterministic partition id for an int64 key column."""
    return (values.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            % np.uint64(num_partitions)).astype(np.int64)


def completed_partitions(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for f in os.listdir(mdir):
        if f.startswith("part-") and f.endswith(".json"):
            done.add(int(f[5:-5]))
    return done


def write_partition(table: pa.Table, out_dir: str, part: int,
                    lineage: dict | None = None) -> dict:
    """Atomic per-partition write + manifest entry. Returns metrics."""
    t0 = time.monotonic()
    pdir = os.path.join(out_dir, f"part={part}")
    tmp = pdir + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(table, os.path.join(tmp, "data.parquet"))
    os.replace(tmp, pdir) if not os.path.exists(pdir) else None
    if os.path.exists(tmp):  # pdir already existed → keep original
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    mdir = os.path.join(out_dir, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    metrics = {
        "partition": part,
        "rows": table.num_rows,
        "bytes": table.nbytes,
        "wall_sec": round(time.monotonic() - t0, 4),
        **(lineage or {}),
    }
    mtmp = os.path.join(mdir, f".part-{part}.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(metrics, f)
    os.replace(mtmp, os.path.join(mdir, f"part-{part}.json"))
    return metrics


def write_partitioned(ds, out_dir: str, key_col: str, num_partitions: int = 64,
                      resume: bool = True):
    """Write a Dataset to resumable partitioned parquet.

    Rows are routed to ``hash(key) % num_partitions``; on a rerun with
    ``resume=True``, rows belonging to completed partitions are dropped
    at the FILTER stage (before any downstream work) and only missing
    partitions are written. Returns the list of partition metrics
    written this run.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = completed_partitions(out_dir) if resume else set()

    def add_part(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = partition_of(keys, num_partitions)
        batch = batch.append_column("_part", pa.array(part))
        if done:
            keep = ~np.isin(part, np.fromiter(done, dtype=np.int64))
            batch = batch.filter(pa.array(keep))
        return batch

    keyed = ds.map_batches(add_part, batch_format="pyarrow", batch_size=65536)

    import pandas as pd

    def sink(group: pd.DataFrame) -> pd.DataFrame:
        part = int(group["_part"].iloc[0])
        table = pa.Table.from_pandas(group.drop(columns=["_part"]),
                                     preserve_index=False)
        m = write_partition(table, out_dir, part)
        return pd.DataFrame([m])[["partition", "rows", "bytes", "wall_sec"]]

    metrics = keyed.groupby("_part").map_groups(sink, batch_format="pandas")
    out = metrics.to_pandas()
    # lineage + metrics additionally checkpointed AS PARQUET (the
    # BASELINE.json wording): the cumulative manifest across runs
    full = read_manifest(out_dir)
    if len(full):
        pq.write_table(pa.Table.from_pandas(full, preserve_index=False),
                       os.path.join(out_dir, "_manifest", "metrics.parquet"))
    return out


def read_manifest(out_dir: str):
    import pandas as pd

    mdir = os.path.join(out_dir, "_manifest")
    rows = []
    if os.path.isdir(mdir):
        for f in sorted(os.listdir(mdir)):
            if f.startswith("part-") and f.endswith(".json"):
                rows.append(json.load(open(os.path.join(mdir, f))))
    return pd.DataFrame(rows)
