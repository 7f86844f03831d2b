"""Distributed graph operators over edge Datasets.

The one the dedup plan needs: connected components, to turn a
near-duplicate PAIR table (MinHash/SimHash/embedding candidates) into
CLUSTERS so a corpus keeps exactly one representative per duplicate
group — pairwise output alone under-deletes transitively-linked dups
(a~b, b~c but a!~b by the pair list). The reference has no graph ops
(its dedup is exact keep-first, /root/reference/pythongis/vector/
data.py:990-1015); this is the web-corpus extension.

Algorithm: hash-min label propagation (the MapReduce-CC baseline of
Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
2014). Every node starts labeled with its own id; each round sends
each endpoint's current label across every edge and takes the min;
converges in O(diameter) rounds. Near-dup graphs are unions of
near-cliques (LSH buckets emit all pairs), so the diameter — and the
round count — is small in practice; ``max_iters`` bounds pathological
chains. Each round is two partitioned hash joins (edge endpoints ×
label table) plus one hash-bucketed min-combine — all streaming
shuffles, nothing driver-side. The label table (nodes that appear in
any edge — candidate dups only, far smaller than the corpus) is
materialized once per round to cut the iterative lineage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pythongis_ray import relational as rel


def connected_components(edges, src: str = "id_a", dst: str = "id_b",
                         max_iters: int = 50):
    """Edge Dataset (src, dst) → Dataset (node, component) where
    ``component`` is the minimum node id reachable from ``node``
    (undirected). Only nodes appearing in at least one edge are
    returned. Raises if ``max_iters`` rounds don't converge."""

    def to_labels(batch: pa.Table) -> pa.Table:
        a = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.concatenate([a, b])
        return pa.table({"node": pa.array(np.unique(n))})

    nodes = edges.map_batches(to_labels, batch_format="pyarrow",
                              batch_size=65536)
    # per-batch unique above, global unique here (node cardinality =
    # candidate-dup docs, tiny vs corpus)
    nodes = rel.dedup(nodes, ["node"])
    labels = nodes.map_batches(
        lambda b: b.append_column("label", b["node"]),
        batch_format="pyarrow", batch_size=65536).materialize()

    def min_combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("node", sort=False).agg(
            new=("label", "min"), old=("is_old_lbl", "max"))
        g = g.reset_index()
        g["changed"] = (g["new"] != g["old"]).astype(np.int64)
        return g.rename(columns={"new": "label"})[
            ["node", "label", "old", "changed"]]

    for _ in range(max_iters):
        # annotate each edge endpoint with its current label
        la = labels.map_batches(
            lambda b: b.rename_columns([src, "label_src"]),
            batch_format="pyarrow", batch_size=65536)
        lb = labels.map_batches(
            lambda b: b.rename_columns([dst, "label_dst"]),
            batch_format="pyarrow", batch_size=65536)
        ann = rel.join_large(rel.join_large(edges, la, on=src, native=False),
                             lb, on=dst, native=False)

        def msgs(batch: pa.Table) -> pa.Table:
            a = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
            b = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
            sl = batch["label_src"].to_numpy(zero_copy_only=False)
            dl = batch["label_dst"].to_numpy(zero_copy_only=False)
            m = np.minimum(sl, dl).astype(np.int64)
            return pa.table({
                "node": pa.array(np.concatenate([a, b])),
                "label": pa.array(np.concatenate([m, m])),
                # edge messages never carry the old label
                "is_old_lbl": pa.array(
                    np.full(2 * len(a), np.iinfo(np.int64).min)),
            })

        def self_msgs(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "is_old_lbl", batch["label"])

        stream = ann.map_batches(msgs, batch_format="pyarrow",
                                 batch_size=65536).union(
            labels.map_batches(self_msgs, batch_format="pyarrow",
                               batch_size=65536))
        combined = rel.bucketed_group_apply(
            stream, ["node"], min_combine).materialize()
        n_changed = combined.sum("changed")
        labels = combined.drop_columns(["old", "changed"]).materialize()
        if not n_changed:
            return labels.map_batches(
                lambda b: b.rename_columns(["node", "component"]),
                batch_format="pyarrow", batch_size=65536)
    raise RuntimeError(f"connected_components: no convergence "
                       f"in {max_iters} rounds")
