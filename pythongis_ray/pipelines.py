"""End-to-end pipelines; `flagship` is the engine's headline job.

Flagship (the BASELINE.json north star, scaled to the sandbox):
  read documents.parquet (column-pruned)
  → synthesize pages (url, warc_ts, html, text, lang)
  → geocode (skewed deterministic hash → lon/lat + cell id)
  → spatial join against the nation zone polygons (broadcast index)
  → per (zone, lang) aggregate page counts + token sums
Everything streams: no take_all/to_pandas on the big side; the only
materialized result is the tiny aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pythongis_ray import fixtures, pages, spatial


def load_zones(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    return fixtures.zones_from_nation(nation)


def flagship(sf_dir: str, replicate: int = 1, how: str = "inner"):
    """pages → geocode → spatial join → (zone, lang) aggregate.
    Returns a small aggregated Dataset (zone_id, name, lang, n_pages,
    sum_tokens)."""
    from ray.data.aggregate import Count, Sum

    ds = pages.pages_dataset(sf_dir, replicate=replicate)

    def add_tokens(batch: pa.Table) -> pa.Table:
        n = pc.add(pc.count_substring(batch["text"], " "), 1)
        return batch.append_column("n_tokens", pc.cast(n, pa.int64()))

    ds = ds.map_batches(add_tokens, batch_format="pyarrow", batch_size=8192)
    # heavy columns pruned before the join — html/text never enter the
    # join or the aggregate (wide-row rule, SURVEY.md §7.5)
    slim = ds.select_columns(["page_id", "lon", "lat", "lang", "n_tokens"])
    zones = load_zones(sf_dir)
    joined = spatial.spatial_join(slim, zones[["zone_id", "name", "geometry"]],
                                  predicate="within", how=how)
    agg = joined.groupby(["zone_id", "name", "lang"]).aggregate(
        Count(alias_name="n_pages"),
        Sum("n_tokens", alias_name="sum_tokens"),
    )
    return agg


def flagship_wide_rejoin(sf_dir: str, replicate: int = 1):
    """The wide-row discipline end-to-end (SURVEY.md §7.5 / SCALING.md):
    heavy columns (html, text) are PROJECTED OUT before the spatial
    join; the joined slim rows re-attach them afterwards by key via a
    bucketed hash join — html/text never enter the join or any
    shuffle. Returns the joined pages WITH html/text re-attached
    (byte-identical; asserted in tests)."""
    from pythongis_ray import relational as rel

    ds = pages.pages_dataset(sf_dir, replicate=replicate)
    slim = ds.select_columns(["page_id", "lon", "lat", "lang"])
    heavy = ds.select_columns(["page_id", "url", "warc_ts", "html", "text"])
    zones = load_zones(sf_dir)
    joined = spatial.spatial_join(slim, zones[["zone_id", "name", "geometry"]],
                                  predicate="within")
    return rel.join_large(joined, heavy, on="page_id")


def flagship_joined_pages(sf_dir: str, replicate: int = 1):
    """The un-aggregated joined pages Dataset (page_id..zone columns),
    with text carried through — used by the byte-identity invariant
    test and the resumable-sink path."""
    ds = pages.pages_dataset(sf_dir, replicate=replicate)
    zones = load_zones(sf_dir)
    return spatial.spatial_join(
        ds, zones[["zone_id", "name", "geometry"]], predicate="within", how="left")
