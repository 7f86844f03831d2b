"""Local mimic of the driver's queries()-vs-oracle_sql() DuckDB harness.

Runs each registry entry at a given sf, converts both results to pandas,
sorts columns by name and rows by all columns, and compares row count,
column names and exact values. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def to_pandas(obj):
    import pandas as pd

    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    import pyarrow as pa

    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    raise TypeError(type(obj))


def canon(df):
    import numpy as np
    import pandas as pd

    df = df.copy()
    df = df[sorted(df.columns)]
    # normalize dtypes: ints → int64, floats stay float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def main():
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pythongis_ray import queries as q

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    fns = q.get_queries()
    sqls = q.get_oracle_sql()
    failures = []
    for name, fn in fns.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = to_pandas(fn(sf_dir))
        except Exception as e:
            failures.append((name, f"RAY ERROR: {type(e).__name__}: {e}"))
            print(f"[FAIL-ray ] {name}: {e}")
            continue
        t_ray = time.time() - t0
        if name not in sqls:
            print(f"[rows-only] {name}: {len(res)} rows ({t_ray:.1f}s)")
            continue
        try:
            exp = con.sql(sqls[name]).df()
        except Exception as e:
            failures.append((name, f"SQL ERROR: {e}"))
            print(f"[FAIL-sql ] {name}: {e}")
            continue
        a, b = canon(res), canon(exp)
        if list(a.columns) != list(b.columns):
            failures.append((name, f"schema {list(a.columns)} vs {list(b.columns)}"))
            print(f"[FAIL-schema] {name}: {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append((name, f"rows {len(a)} vs {len(b)}"))
            print(f"[FAIL-rows] {name}: {len(a)} vs {len(b)}")
            continue
        mism = None
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            try:
                eq = (av == bv) | ((av != av) & (bv != bv))
            except Exception:
                eq = a[c].astype(str).to_numpy() == b[c].astype(str).to_numpy()
            if not eq.all():
                i = int((~eq).argmax())
                mism = f"col {c} row {i}: {av[i]!r} != {bv[i]!r}"
                break
        if mism:
            failures.append((name, mism))
            print(f"[FAIL-val ] {name}: {mism}")
        else:
            print(f"[OK       ] {name}: {len(a)} rows ({t_ray:.1f}s)")
    ray.shutdown()
    print(f"\n{len(failures)} failures")
    for n, m in failures:
        print(" -", n, ":", m[:200])
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
