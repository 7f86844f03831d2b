"""Distributed connected components (graph.py) vs a reference
union-find on the same edges."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("engine", ["actors", "dataset"])
@pytest.mark.parametrize("seed,n_nodes,n_edges", [(0, 30, 20), (7, 200, 150)])
def test_connected_components_matches_union_find(ray_session, seed,
                                                 n_nodes, n_edges, engine):
    import ray.data as rd

    from pythongis_ray import graph

    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    edges = pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})
    out = graph.connected_components(rd.from_arrow(edges),
                                     engine=engine).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    assert got == _uf_components(list(zip(a.tolist(), b.tolist())))


def test_connected_components_chain(ray_session):
    """Worst-case diameter: a chain still converges (O(d) rounds)
    and collapses to one component."""
    import ray.data as rd

    from pythongis_ray import graph

    n = 8
    edges = pa.table({"id_a": pa.array(np.arange(n - 1, 0, -1)),
                      "id_b": pa.array(np.arange(n, 1, -1))})
    out = graph.connected_components(rd.from_arrow(edges)).to_pandas()
    assert len(out) == n
    assert set(out["component"]) == {1}


def test_connected_components_actors_empty_edges(ray_session):
    import ray.data as rd

    from pythongis_ray import graph

    edges = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64())})
    out = graph.connected_components(rd.from_arrow(edges))
    assert out.count() == 0
    # Ray's to_pandas drops columns at 0 rows; the Dataset schema is
    # what downstream consumers (corpus_build guards) rely on
    assert out.schema().names == ["node", "component"]
