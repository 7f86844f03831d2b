"""Value classification (the reference's `classypie` sidecar).

Break algorithms from /root/reference/classypie/breaks.py:17-413 —
equal, quantile, log, stdev, headtail, pretty, natural (jenks on a
sample) — plus `Classifier`-style apply (`find_class` interpolation,
classypie/main.py:194-300) and `rescale` (main.py:554-631).

Breaks are computed on an aggregated/sampled view of the Dataset on the
driver (they are O(k) outputs); the *apply* is a vectorized
``map_batches`` stage (np.digitize/searchsorted), matching the engine
rule that per-row work never runs on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


# ------------------------------------------------------------ breaks

def equal(values, k: int) -> list[float]:
    """Equal-interval breaks (classypie/breaks.py 'equal')."""
    v = np.asarray(values, np.float64)
    lo, hi = float(np.nanmin(v)), float(np.nanmax(v))
    step = (hi - lo) / k
    return [lo + i * step for i in range(k + 1)]


def quantile(values, k: int) -> list[float]:
    """Quantile breaks (equal counts per class)."""
    v = np.sort(np.asarray(values, np.float64))
    v = v[~np.isnan(v)]
    qs = np.linspace(0, 1, k + 1)
    return [float(np.quantile(v, q)) for q in qs]


def log_breaks(values, k: int) -> list[float]:
    """Logarithmic breaks (positive values)."""
    v = np.asarray(values, np.float64)
    lo, hi = float(np.nanmin(v)), float(np.nanmax(v))
    if lo <= 0:
        raise ValueError("log breaks require positive values")
    e = np.linspace(np.log10(lo), np.log10(hi), k + 1)
    return [float(10 ** x) for x in e]


def stdev(values, k: int) -> list[float]:
    """Mean ± i·σ breaks, clipped to the data range."""
    v = np.asarray(values, np.float64)
    v = v[~np.isnan(v)]
    mu, sd = float(v.mean()), float(v.std())
    half = k // 2
    br = [mu + (i - half) * sd for i in range(k + 1)]
    br[0] = min(br[0], float(v.min()))
    br[-1] = max(br[-1], float(v.max()))
    return br


def headtail(values, k: int) -> list[float]:
    """Head/tail breaks for heavy-tailed data (iterative mean split)."""
    v = np.asarray(values, np.float64)
    v = v[~np.isnan(v)]
    br = [float(v.min())]
    part = v
    for _ in range(k - 1):
        if len(part) < 2:
            break
        mu = float(part.mean())
        br.append(mu)
        part = part[part > mu]
    br.append(float(v.max()))
    return sorted(set(br))


def jenks_sample(values, k: int, sample: int = 1000, seed: int = 42) -> list[float]:
    """Natural breaks (Fisher-Jenks) on a bounded sample — mirrors the
    reference's sampling strategy for large inputs
    (/root/reference/classypie/breaks.py:271-374). O(sample² · k) DP."""
    v = np.asarray(values, np.float64)
    v = v[~np.isnan(v)]
    if len(v) > sample:
        rng = np.random.default_rng(seed)
        v = rng.choice(v, sample, replace=False)
    v = np.sort(v)
    n = len(v)
    if k >= n:
        return [float(x) for x in np.unique(v)]
    # DP over prefix sums
    csum = np.concatenate(([0.0], np.cumsum(v)))
    csq = np.concatenate(([0.0], np.cumsum(v * v)))

    def sse(i, j):  # variance cost of v[i:j]
        cnt = j - i
        s = csum[j] - csum[i]
        return (csq[j] - csq[i]) - s * s / cnt

    cost = np.full((n + 1, k + 1), np.inf)
    back = np.zeros((n + 1, k + 1), dtype=np.int64)
    cost[0, 0] = 0.0
    for j in range(1, k + 1):
        for i in range(j, n + 1):
            for m in range(j - 1, i):
                c = cost[m, j - 1] + sse(m, i)
                if c < cost[i, j]:
                    cost[i, j] = c
                    back[i, j] = m
    # recover break positions
    breaks = [float(v[-1])]
    i = n
    for j in range(k, 0, -1):
        m = back[i, j]
        breaks.append(float(v[m]) if m > 0 else float(v[0]))
        i = m
    return sorted(breaks)


ALGORITHMS = {
    "equal": equal,
    "quantile": quantile,
    "log": log_breaks,
    "stdev": stdev,
    "headtail": headtail,
    "natural": jenks_sample,
}


def breaks_for_dataset(ds, col: str, algorithm: str, k: int,
                       sample_limit: int = 100_000, seed: int = 42) -> list[float]:
    """Compute breaks from a Dataset column: exact min/max path for
    'equal', bounded random sample for the distribution-shaped
    algorithms (never materializes the full column on the driver)."""
    if algorithm == "equal":
        from pythongis_ray.vector import describe

        prof = describe(ds, [col]).set_index("column")
        lo, hi = float(prof.loc[col, "min"]), float(prof.loc[col, "max"])
        step = (hi - lo) / k
        return [lo + i * step for i in range(k + 1)]
    n = ds.count()
    frac = min(1.0, sample_limit / max(1, n))
    vals = ds.select_columns([col]).random_sample(frac, seed=seed).to_pandas()[col]
    return ALGORITHMS[algorithm](vals.to_numpy(), k)


# ------------------------------------------------------------- apply

def find_class(values, breaks) -> np.ndarray:
    """Class index per value: class i covers [breaks[i], breaks[i+1])
    with the last class closed (reference find_class semantics,
    classypie/main.py:194-243)."""
    br = np.asarray(breaks, np.float64)
    v = np.asarray(values, np.float64)
    idx = np.searchsorted(br, v, side="right") - 1
    return np.clip(idx, 0, len(br) - 2).astype(np.int64)


def apply_classes(ds, col: str, breaks, out_col: str = "class"):
    """Vectorized classification stage."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch[out_col] = find_class(batch[col].to_numpy(), breaks)
        return batch

    return ds.map_batches(fn, batch_format="pandas", batch_size=65536)


def rescale(ds, col: str, to: tuple[float, float], out_col: str | None = None):
    """Linear rescale of a column to a target range (classypie rescale,
    main.py:554-631). Global min/max via one streaming describe pass."""
    from pythongis_ray.vector import describe

    prof = describe(ds, [col]).set_index("column")
    lo, hi = float(prof.loc[col, "min"]), float(prof.loc[col, "max"])
    a, b = to
    span = hi - lo if hi > lo else 1.0
    out_col = out_col or f"{col}_scaled"

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch[out_col] = (batch[col].to_numpy(np.float64) - lo) / span * (b - a) + a
        return batch

    return ds.map_batches(fn, batch_format="pandas", batch_size=65536)
