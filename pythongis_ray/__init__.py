"""pythongis_ray — a Ray-Data-native spatial / data-processing engine.

A from-scratch rebuild of the *capabilities* of karimbahgat/PythonGis
(reference at /root/reference) on top of ``ray.data.Dataset`` pipelines:
zero-copy Arrow batches, actor pools for stateful refine stages, explicit
cell-grid partitioning (quadkey; H3-shaped API) for every spatial shuffle,
and partitioned-parquet checkpointing for resume.

The reference is a single-process, fully-materialized engine
(``/root/reference/pythongis/vector/data.py:400``); nothing here ports its
execution model — only its operator semantics (SURVEY.md §2).

Modules
-------
grid        cell index (point→cell, polygon cover, k-ring, parent/child)
geom        pure-numpy geometry kernel (WKB, predicates, measures, geodesy)
relational  attribute ops: aggregate fieldmapping, joins, dedup, windows
spatial     two-phase spatial join / semi-join / kNN over the cell grid
raster      tile-table raster ops (zonal stats, upscale, mosaic, band math)
text        tokenize / language-id / quality / fingerprint / minhash dedup
embed       similarity search over embedding columns
fixtures    deterministic spatial fixtures derived from the test tables
pages       Common-Crawl-style pages table synthesis + geocode
checkpoint  partitioned sink with lineage manifest + resume-skip
pipelines   flagship end-to-end pipelines
"""

__version__ = "0.1.0"

from pythongis_ray import state as _state

_state.tune_malloc()
