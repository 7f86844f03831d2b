"""Distributed graph operators over edge Datasets.

The one the dedup plan needs: connected components, to turn a
near-duplicate PAIR table (MinHash/SimHash/embedding candidates) into
CLUSTERS so a corpus keeps exactly one representative per duplicate
group — pairwise output alone under-deletes transitively-linked dups
(a~b, b~c but a!~c by the pair list). The reference has no graph ops
(its dedup is exact keep-first, /root/reference/pythongis/vector/
data.py:990-1015); this is the web-corpus extension.

Algorithm: hash-min label propagation (the MapReduce-CC baseline of
Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
2014). Every node starts labeled with its own id; each round sends
each endpoint's current label across every edge and takes the min;
converges in O(diameter) rounds. Near-dup graphs are unions of
near-cliques (LSH buckets emit all pairs), so the diameter — and the
round count — is small in practice; ``max_iters`` bounds pathological
chains.

Each round is exactly TWO hash-bucketed shuffles, nothing driver-side:

  1. scatter: edge rows keyed by each endpoint + label rows, grouped
     by node — every edge meets its endpoint's label in one bucket
     and emits that label to the OTHER endpoint;
  2. gather: messages grouped by destination node — min-combine plus
     the convergence flag (the old label rides along).

The label table (nodes that appear in any edge — candidate dups only,
far smaller than the corpus) is materialized once per round to cut
the iterative lineage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pythongis_ray import relational as rel

_NO_LABEL = np.iinfo(np.int64).min


def connected_components(edges, src: str = "id_a", dst: str = "id_b",
                         max_iters: int = 50, engine: str = "actors",
                         checkpoint_dir: str | None = None):
    """Edge Dataset (src, dst) → Dataset (node, component) where
    ``component`` is the minimum node id reachable from ``node``
    (undirected). Only nodes appearing in at least one edge are
    returned. Raises if ``max_iters`` rounds don't converge.

    ``engine="actors"`` (default) runs on the resident-shard Pregel
    layout (see connected_components_actors — edges loaded once,
    rounds exchange label minima only); ``engine="dataset"`` keeps the
    portable shuffle-per-round formulation below. Both reach the same
    unique fixed point."""
    if engine == "actors":
        return connected_components_actors(edges, src=src, dst=dst,
                                           max_iters=max_iters,
                                           checkpoint_dir=checkpoint_dir)
    if engine != "dataset":
        raise ValueError(f"unknown engine {engine!r} "
                         "(expected 'actors' or 'dataset')")
    if checkpoint_dir is not None:
        raise ValueError("checkpoint_dir is only supported by "
                         "engine='actors' — the dataset fallback "
                         "would silently drop the resumability "
                         "request")

    def to_labels(batch: pa.Table) -> pa.Table:
        a = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(np.unique(np.concatenate([a, b])))})

    nodes = edges.map_batches(to_labels, batch_format="pyarrow",
                              batch_size=65536)
    # per-batch unique above, global unique here (node cardinality =
    # candidate-dup docs, tiny vs corpus)
    nodes = rel.dedup(nodes, ["node"])
    labels = nodes.map_batches(
        lambda b: b.append_column("label", b["node"]),
        batch_format="pyarrow", batch_size=65536).materialize()

    def doubled(batch: pa.Table) -> pa.Table:
        """Each undirected edge keyed by BOTH endpoints: (key, other)."""
        a = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"key": pa.array(np.concatenate([a, b])),
                         "other": pa.array(np.concatenate([b, a]))})

    # static across rounds; materialize once so rounds don't re-explode
    keyed_edges = edges.map_batches(doubled, batch_format="pyarrow",
                                    batch_size=65536).materialize()

    def scatter(bucket: pd.DataFrame) -> pd.DataFrame:
        """One bucket holds every edge row keyed here plus the key
        nodes' label rows (other == _NO_LABEL). Emits the key's label
        to each neighbor, plus the self row (old label riding along
        for the convergence check)."""
        is_lbl = bucket["other"].to_numpy() == _NO_LABEL
        lbl = bucket[is_lbl]
        # edge rows carry a _NO_LABEL placeholder 'label' (union schema
        # compat) — drop it so the merge brings in the real one
        e = bucket[~is_lbl].drop(columns=["label"])
        m = e.merge(lbl[["key", "label"]], on="key", how="left")
        msgs = pd.DataFrame({
            "node": m["other"].to_numpy(),
            "label": m["label"].to_numpy(),
            "old": np.full(len(m), _NO_LABEL),
        })
        self_rows = pd.DataFrame({
            "node": lbl["key"].to_numpy(),
            "label": lbl["label"].to_numpy(),
            "old": lbl["label"].to_numpy(),
        })
        return pd.concat([msgs, self_rows], ignore_index=True)

    def gather(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("node", sort=False).agg(
            label=("label", "min"), old=("old", "max")).reset_index()
        g["changed"] = (g["label"] != g["old"]).astype(np.int64)
        return g[["node", "label", "changed"]]

    for _ in range(max_iters):
        lbl_rows = labels.map_batches(
            lambda b: b.append_column(
                "other", pa.array(np.full(b.num_rows, _NO_LABEL))
            ).select(["node", "other", "label"]).rename_columns(
                ["key", "other", "label"]),
            batch_format="pyarrow", batch_size=65536)
        edge_rows = keyed_edges.map_batches(
            lambda b: b.append_column(
                "label", pa.array(np.full(b.num_rows, _NO_LABEL))),
            batch_format="pyarrow", batch_size=65536)
        msgs = rel.bucketed_group_apply(edge_rows.union(lbl_rows),
                                        ["key"], scatter)
        combined = rel.bucketed_group_apply(msgs, ["node"],
                                            gather).materialize()
        n_changed = combined.sum("changed")
        labels = combined.drop_columns(["changed"]).materialize()
        if not n_changed:
            return labels.map_batches(
                lambda b: b.rename_columns(["node", "component"]),
                batch_format="pyarrow", batch_size=65536)
    raise RuntimeError(f"connected_components: no convergence "
                       f"in {max_iters} rounds")


def pagerank(edges, src: str = "src", dst: str = "dst", iters: int = 5,
             init_mass: int = 1_000_000, base_mass: int = 150_000,
             d_num: int = 85, d_den: int = 100,
             return_trace: bool = False):
    """Deterministic INTEGER PageRank over an edge Dataset — host/page
    authority scoring for a crawled web graph (the classic corpus-
    quality signal; the reference has no graph ops at all).

    Works in integer "mass" units so the result is bit-exact and
    replayable in SQL (the float power iteration is order-dependent
    and can't be hash-checked):

        mass_0(v)     = init_mass
        mass_{k+1}(v) = base_mass
                        + sum over edges (u,v) of
                          (d_num * mass_k(u)) // (d_den * outdeg(u))

    Multi-edges count with multiplicity; dangling-node mass is dropped
    (both choices mirror exactly in SQL). All arithmetic is int64:
    with d_num/d_den = 0.85 total mass stays O(nodes * init_mass), so
    85*mass fits int64 up to ~10^11 nodes.

    ``return_trace=True`` additionally returns the per-round (node,
    mass) Datasets (already materialized by the loop — no extra cost)
    for convergence diagnostics.

    Structure per iteration (the Pregel round as TWO hash-bucketed
    shuffles, same scatter/gather shape as connected_components):
    edge rows (+ pre-joined outdeg) union mass rows, grouped by source
    node — each edge meets its source's mass and emits a contribution
    to its destination; then contributions grouped by destination and
    sum-combined. The edge table with outdeg attached is built ONCE
    and materialized (static across rounds); only the small (node,
    mass) table changes per round. At cluster scale the edge table
    would additionally be pre-partitioned by source bucket so rounds
    reuse the partitioning.
    """
    d_num = np.int64(d_num)
    d_den = np.int64(d_den)

    def as_edges(batch: pa.Table) -> pa.Table:
        a = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"key": pa.array(a), "other": pa.array(b)})

    # materialize the compact (src, dst) pairs ONCE: upstream lineage
    # (html synthesis + link extraction) would otherwise re-execute for
    # the outdeg aggregate, the join probe AND the node scan below
    e = edges.map_batches(as_edges, batch_format="pyarrow",
                          batch_size=65536).materialize()

    # outdeg per source (multiplicity), partial-agg + bucketed combine
    od = rel.groupby_aggregate(e, "key", [("od", "other", "count")])
    # attach outdeg to every edge once; static across rounds
    e_od = rel.join_large(e, od, on="key", num_buckets=16).materialize()

    def to_nodes(batch: pa.Table) -> pa.Table:
        a = batch["key"].to_numpy(zero_copy_only=False)
        b = batch["other"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.unique(np.concatenate([a, b])))})

    nodes = rel.dedup(e.map_batches(to_nodes, batch_format="pyarrow",
                                    batch_size=65536), ["node"])
    mass = nodes.map_batches(
        lambda b: b.append_column(
            "mass", pa.array(np.full(b.num_rows, init_mass, np.int64))),
        batch_format="pyarrow", batch_size=65536).materialize()

    def scatter(bucket: pd.DataFrame) -> pd.DataFrame:
        """Bucket holds this key-range's edges (other != _NO_LABEL)
        plus its nodes' mass rows. Each edge emits its contribution to
        `other`; each node emits a 0-contribution self row so nodes
        with no in-edges still surface in the gather (base mass)."""
        is_mass = bucket["other"].to_numpy() == _NO_LABEL
        mrows = bucket[is_mass]
        erows = bucket[~is_mass].drop(columns=["mass"])
        m = erows.merge(mrows[["key", "mass"]], on="key", how="left")
        contrib = (d_num * m["mass"].to_numpy(np.int64)) \
            // (d_den * m["od"].to_numpy(np.int64))
        out = pd.DataFrame({"node": m["other"].to_numpy(np.int64),
                            "contrib": contrib})
        selfr = pd.DataFrame({"node": mrows["key"].to_numpy(np.int64),
                              "contrib": np.zeros(len(mrows), np.int64)})
        return pd.concat([out, selfr], ignore_index=True)

    def gather(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("node", sort=False)["contrib"].sum().reset_index()
        g["mass"] = g["contrib"].to_numpy(np.int64) + np.int64(base_mass)
        return g[["node", "mass"]]

    trace = [mass]
    for _ in range(iters):
        mass_rows = mass.map_batches(
            lambda b: pa.table({
                "key": b["node"],
                "other": pa.array(np.full(b.num_rows, _NO_LABEL)),
                "od": pa.array(np.zeros(b.num_rows, np.int64)),
                "mass": b["mass"]}),
            batch_format="pyarrow", batch_size=65536)
        edge_rows = e_od.map_batches(
            lambda b: pa.table({
                "key": b["key"], "other": b["other"], "od": b["od"],
                "mass": pa.array(np.full(b.num_rows, _NO_LABEL))}),
            batch_format="pyarrow", batch_size=65536)
        msgs = rel.bucketed_group_apply(edge_rows.union(mass_rows),
                                        ["key"], scatter)
        mass = rel.bucketed_group_apply(msgs, ["node"],
                                        gather).materialize()
        trace.append(mass)
    if return_trace:
        return mass, trace
    return mass


def triangle_count(edges, src: str = "src", dst: str = "dst"):
    """Directed-path triangle count: instances of u→v, v→w with a
    closing edge u→w (multi-edges multiply, matching the SQL 3-way
    join exactly). The classic two-join formulation: a bucketed
    equi-join builds wedges (u,v,w), a second join on the composite
    (u,w) key probes for closing edges, and the count is the result
    cardinality — every step a hash-partitioned Dataset op, nothing
    driver-side but the final scalar. At cluster scale the standard
    degree-ordering optimization (orient edges low→high degree) would
    bound wedge fan-out on hot nodes; the synthetic web graph's
    out-degree is a constant 3 so it is omitted here.
    """
    def as_uv(batch: pa.Table) -> pa.Table:
        return pa.table({
            "u": pc.cast(batch[src], pa.int64()),
            "v": pc.cast(batch[dst], pa.int64())})

    def as_vw(batch: pa.Table) -> pa.Table:
        return pa.table({
            "v": pc.cast(batch[src], pa.int64()),
            "w": pc.cast(batch[dst], pa.int64())})

    def as_uw(batch: pa.Table) -> pa.Table:
        return pa.table({
            "u": pc.cast(batch[src], pa.int64()),
            "w": pc.cast(batch[dst], pa.int64())})

    e_uv = edges.map_batches(as_uv, batch_format="pyarrow", batch_size=65536)
    e_vw = edges.map_batches(as_vw, batch_format="pyarrow", batch_size=65536)
    e_uw = edges.map_batches(as_uw, batch_format="pyarrow", batch_size=65536)
    wedges = rel.join_large(e_uv, e_vw, on="v", num_buckets=16)
    closed = rel.join_large(
        wedges.map_batches(lambda b: b.select(["u", "w"]),
                           batch_format="pyarrow", batch_size=65536),
        e_uw, on=["u", "w"], num_buckets=16)
    n = closed.count()
    return pa.table({"n_triangles": pa.array([n], pa.int64())})


# ---------------------------------------------------------------- pregel

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _bucket_of(ids: np.ndarray, nb: int) -> np.ndarray:
    """Deterministic shard assignment for int64 node ids (Fibonacci
    multiplicative hash — internal partitioning only, never mirrored
    in SQL)."""
    return ((ids.astype(np.int64).view(np.uint64) * _GOLD)
            % np.uint64(nb)).astype(np.int64)


def _batch_token(a: np.ndarray, b: np.ndarray) -> int:
    """Content token for retry-idempotent edge ingest: a 64-bit
    blake2b over both arrays' bytes — order- and content-exact, so
    two different blocks can't collide the way the old sum-based
    checksum could (equal length + equal per-column sums)."""
    import hashlib

    h = hashlib.blake2b(digest_size=8)
    h.update(np.ascontiguousarray(a).tobytes())
    h.update(np.ascontiguousarray(b).tobytes())
    return int.from_bytes(h.digest(), "little")


def _group_sum(ids: np.ndarray, vals: np.ndarray):
    """Exact int64 per-id sums (sort + reduceat; bincount's float
    weights would lose exactness past 2^53)."""
    if len(ids) == 0:
        return ids, vals
    o = np.argsort(ids, kind="stable")
    ids, vals = ids[o], vals[o]
    first = np.concatenate(([True], ids[1:] != ids[:-1]))
    starts = np.nonzero(first)[0]
    return ids[starts], np.add.reduceat(vals, starts)


class _PregelShard:
    """One graph partition for iterative vertex programs: holds the
    edges whose SOURCE hashes here plus the state of the nodes that
    hash here (same hash → a node's out-edges and its state are
    co-resident, so a round reads state locally and ships only
    pre-combined messages). This is the raw-actor escape hatch the
    Dataset API can't express: the edge table must stay RESIDENT
    across rounds — re-shuffling it every round (the union+groupby
    formulation above) moves O(E) per round where messages are only
    O(nodes-touched)."""

    def __init__(self, b: int, nb: int):
        self.b, self.nb = b, nb
        self._src, self._dst = [], []
        self._seen_tokens = set()

    def add_edges(self, token: int, src: np.ndarray,
                  dst: np.ndarray) -> int:
        # idempotence under Ray task retry: a re-executed route task
        # re-sends the same arrays; the content token dedups them so a
        # retry can't double the outdegrees/mass contributions
        if token in self._seen_tokens:
            return len(src)
        self._seen_tokens.add(token)
        self._src.append(src)
        self._dst.append(dst)
        return len(src)

    def node_exchange(self):
        """Route every referenced dst id to its owner shard so nodes
        with only in-links get registered (num_returns=nb)."""
        self.src = (np.concatenate(self._src) if self._src
                    else np.empty(0, np.int64))
        self.dst = (np.concatenate(self._dst) if self._dst
                    else np.empty(0, np.int64))
        self._src = self._dst = None
        d = np.unique(self.dst)
        db = _bucket_of(d, self.nb)
        return tuple(d[db == t] for t in range(self.nb))

    def init(self, init_mass: int, d_num: int, d_den: int,
             base_mass: int, seed_mod: int | None, *incoming) -> int:
        self.d_num, self.d_den = np.int64(d_num), np.int64(d_den)
        self.owned = np.unique(np.concatenate([self.src, *incoming]))
        # personalized (TrustRank) teleport: base/init mass only on the
        # seed set {node % seed_mod == 0}; None = uniform PageRank
        if seed_mod:
            seeds = self.owned % np.int64(seed_mod) == 0
            self.base_vec = np.where(seeds, np.int64(base_mass),
                                     np.int64(0))
            init_vec = np.where(seeds, np.int64(init_mass), np.int64(0))
        else:
            self.base_vec = np.full(len(self.owned), base_mass,
                                    np.int64)
            init_vec = np.full(len(self.owned), init_mass, np.int64)
        # per-edge outdeg + owned-index of each edge's source
        us, inv, cnt = np.unique(self.src, return_inverse=True,
                                 return_counts=True)
        edge_od = cnt[inv]
        edge_src = np.searchsorted(self.owned, self.src)
        # pre-split edges by destination shard (stable sort ONCE)
        db = _bucket_of(self.dst, self.nb)
        o = np.argsort(db, kind="stable")
        self.e_dst = self.dst[o]
        self.e_src_idx = edge_src[o]
        self.e_od = edge_od[o]
        self.splits = np.searchsorted(db[o], np.arange(self.nb + 1))
        self.src = self.dst = None
        self.mass = init_vec
        return len(self.owned)

    def scatter(self):
        """Per-edge contributions, locally pre-combined per dst, split
        per destination shard (num_returns=nb)."""
        contrib = (self.d_num * self.mass[self.e_src_idx]) \
            // (self.d_den * self.e_od)
        out = []
        for t in range(self.nb):
            sl = slice(self.splits[t], self.splits[t + 1])
            out.append(_group_sum(self.e_dst[sl], contrib[sl]))
        return tuple(out)

    def gather(self, *msgs) -> int:
        total = self.base_vec.copy()
        for ids, sums in msgs:
            if len(ids):
                total[np.searchsorted(self.owned, ids)] += sums
        self.mass = total
        return len(total)

    def result(self) -> pa.Table:
        return pa.table({"node": pa.array(self.owned),
                         "mass": pa.array(self.mass)})

    def checkpoint(self, cdir: str, rnd: int) -> int:
        """Atomic per-shard state snapshot (tmp + rename, same
        discipline as checkpoint.write_partition)."""
        import os
        import pyarrow.parquet as pq

        d = os.path.join(cdir, f"round_{rnd:04d}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".shard_{self.b}.parquet.tmp")
        pq.write_table(self.result(), tmp)
        os.replace(tmp, os.path.join(d, f"shard_{self.b}.parquet"))
        return len(self.owned)

    def restore(self, cdir: str, rnd: int) -> int:
        import os
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(cdir, f"round_{rnd:04d}",
                                       f"shard_{self.b}.parquet"))
        node = t["node"].to_numpy().astype(np.int64)
        if not np.array_equal(node, self.owned):
            raise ValueError(
                f"pagerank checkpoint shard {self.b}: node layout "
                f"mismatch (different edges or shard count?)")
        self.mass = t["mass"].to_numpy().astype(np.int64)
        return rnd


def _complete_rounds(cdir: str, nb: int) -> list[int]:
    """Rounds whose _DONE marker AND all shard files exist."""
    import os
    import re

    out = []
    if not os.path.isdir(cdir):
        return out
    for name in os.listdir(cdir):
        m = re.fullmatch(r"round_(\d{4,})", name)
        if not m:
            continue
        d = os.path.join(cdir, name)
        if os.path.exists(os.path.join(d, "_DONE")) and all(
                os.path.exists(os.path.join(d, f"shard_{b}.parquet"))
                for b in range(nb)):
            out.append(int(m.group(1)))
    return sorted(out)


def pagerank_actors(edges, src: str = "src", dst: str = "dst",
                    iters: int = 5, init_mass: int = 1_000_000,
                    base_mass: int = 150_000, d_num: int = 85,
                    d_den: int = 100, num_shards: int | None = None,
                    checkpoint_dir: str | None = None,
                    seed_mod: int | None = None):
    """Integer PageRank on a resident actor-sharded graph (same exact
    semantics as ``pagerank``; see its docstring for the arithmetic
    contract). One streaming pass routes edge blocks directly into
    shard actors (the load IS the shuffle — no sort), then each round
    is a pure message exchange: every shard pushes O(distinct dsts)
    pre-combined int64 sums to its peers via ``num_returns`` object
    refs, so the driver only routes refs and the static O(E) edge
    arrays never move again. This is the Pregel/GraphX layout; the
    Dataset formulation in ``pagerank`` re-shuffles edges every round
    and is kept as the shuffle-only fallback."""
    import ray
    import ray.data as rd

    nb = _shard_count(num_shards)
    if checkpoint_dir:
        # validate/write run parameters BEFORE spawning or loading —
        # a mismatched resume must fail fast, not after the edge load
        import json
        import os

        os.makedirs(checkpoint_dir, exist_ok=True)
        meta_path = os.path.join(checkpoint_dir, "meta.json")
        meta = {"num_shards": nb, "d_num": int(d_num), "d_den": int(d_den),
                "init_mass": init_mass, "base_mass": base_mass,
                "seed_mod": seed_mod}
        if os.path.exists(meta_path):
            if json.load(open(meta_path)) != meta:
                raise ValueError("pagerank checkpoint_dir was written "
                                 "with different parameters/shard count")
        else:
            tmp = meta_path + ".tmp"
            json.dump(meta, open(tmp, "w"))
            os.replace(tmp, meta_path)
    Shard = ray.remote(_PregelShard)
    shards = [Shard.remote(b, nb) for b in range(nb)]
    try:
        return _pagerank_rounds(edges, shards, nb, src, dst, iters,
                                init_mass, base_mass, d_num, d_den,
                                checkpoint_dir, seed_mod)
    finally:
        # ALWAYS release the pool — each shard reserves a CPU and a
        # leaked pool (e.g. a restore() mismatch mid-run) starves
        # every later pipeline in the session (see CLAUDE.md)
        for sh in shards:
            ray.kill(sh)


def _pagerank_rounds(edges, shards, nb, src, dst, iters, init_mass,
                     base_mass, d_num, d_den, checkpoint_dir,
                     seed_mod=None):
    import ray
    import ray.data as rd

    _route_edges(edges, shards, nb, src, dst, mode="directed")

    ex = [sh.node_exchange.options(num_returns=nb).remote()
          for sh in shards]
    n_owned = ray.get(
        [shards[t].init.remote(init_mass, d_num, d_den, base_mass,
                               seed_mod, *[ex[b][t] for b in range(nb)])
         for t in range(nb)])

    # round-level checkpoint/resume (north-rule: a killed run resumes
    # mid-iteration; per-partition lineage + metrics land in Parquet).
    # State is ONLY the tiny (node, mass) table — the edge arrays are
    # rebuilt from the (deterministic) input on restart, so a round_k
    # snapshot + the same inputs reproduce rounds k+1..N bit-exactly.
    start = 0
    if checkpoint_dir:
        done = [r for r in _complete_rounds(checkpoint_dir, nb)
                if r <= iters]
        if done:
            start = max(done)
            ray.get([sh.restore.remote(checkpoint_dir, start)
                     for sh in shards])

    for rnd in range(start + 1, iters + 1):
        t0 = None
        if checkpoint_dir:
            import time as _time
            t0 = _time.monotonic()
        sc = [sh.scatter.options(num_returns=nb).remote() for sh in shards]
        ray.get([shards[t].gather.remote(*[sc[b][t] for b in range(nb)])
                 for t in range(nb)])
        if checkpoint_dir:
            import os
            import time as _time

            import pyarrow.parquet as _pq

            wall = _time.monotonic() - t0
            ray.get([sh.checkpoint.remote(checkpoint_dir, rnd)
                     for sh in shards])
            d = os.path.join(checkpoint_dir, f"round_{rnd:04d}")
            _pq.write_table(pa.table({
                "round": pa.array(np.full(nb, rnd, np.int64)),
                "shard": pa.array(np.arange(nb, dtype=np.int64)),
                "n_nodes": pa.array(np.asarray(n_owned, np.int64)),
                "round_wall_s": pa.array(np.full(nb, wall, np.float64)),
            }), os.path.join(d, "metrics.parquet"))
            open(os.path.join(d, "_DONE"), "w").close()
    # materialize BEFORE the caller's finally kills the pool
    return rd.from_arrow_refs(
        [sh.result.remote() for sh in shards]).materialize()


def _shard_count(num_shards) -> int:
    """Default shard-pool size: half the advertised CPUs, 2..16."""
    import ray

    nb = num_shards or max(2, min(16, int(
        ray.cluster_resources().get("CPU", 4)) // 2))
    return max(2, nb)


def _route_edges(edges, shards, nb: int, src: str, dst: str,
                 mode: str = "directed") -> None:
    """Stream the edge Dataset INTO the shard pool (the load is the
    only time O(E) bytes move). mode: 'directed' keys each edge by
    src; 'doubled' keys by both endpoints (undirected algorithms);
    'both' ships the forward layout keyed by src AND the reversed
    layout keyed by dst with a kind tag (HITS). Retry-idempotent via
    the blake2b content token; ray.get on the acks applies
    backpressure so the stream can't outrun the shards."""
    import ray as _ray

    def route(batch: pa.Table) -> pa.Table:
        a = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        acks = []

        def send(key, other, kind=None):
            kb = _bucket_of(key, nb)
            for t in range(nb):
                m = kb == t
                if m.any():
                    tok = _batch_token(key[m], other[m])
                    if kind is None:
                        acks.append(shards[t].add_edges.remote(
                            tok, key[m], other[m]))
                    else:
                        acks.append(shards[t].add_edges.remote(
                            kind, tok, key[m], other[m]))

        if mode == "directed":
            send(a, b)
        elif mode == "doubled":
            send(np.concatenate([a, b]), np.concatenate([b, a]))
        elif mode == "both":
            send(a, b, kind="f")
            send(b, a, kind="r")
        else:
            raise ValueError(mode)
        _ray.get(acks)
        return pa.table({"n": pa.array([len(a)], pa.int64())})

    edges.map_batches(route, batch_format="pyarrow",
                      batch_size=65536).count()


def _group_min(ids: np.ndarray, vals: np.ndarray):
    """Per-id minima (sort + minimum.reduceat), exact int64."""
    if len(ids) == 0:
        return ids, vals
    o = np.argsort(ids, kind="stable")
    ids, vals = ids[o], vals[o]
    first = np.concatenate(([True], ids[1:] != ids[:-1]))
    starts = np.nonzero(first)[0]
    return ids[starts], np.minimum.reduceat(vals, starts)


class _CCShard:
    """Resident partition for hash-min label propagation: holds the
    (doubled) edges whose KEY endpoint hashes here plus those nodes'
    current labels. Every node with an edge appears as a key on its
    owner shard (edges are doubled at load), so no node exchange is
    needed. Rounds ship only per-destination pre-combined minima."""

    def __init__(self, b: int, nb: int):
        self.b, self.nb = b, nb
        self._key, self._other = [], []
        self._seen_tokens = set()

    def add_edges(self, token: int, key: np.ndarray,
                  other: np.ndarray) -> int:
        # hash-min is idempotent, but dedup anyway so retried route
        # tasks don't inflate shard memory with duplicate edge arrays
        if token in self._seen_tokens:
            return len(key)
        self._seen_tokens.add(token)
        self._key.append(key)
        self._other.append(other)
        return len(key)

    def init(self) -> int:
        key = (np.concatenate(self._key) if self._key
               else np.empty(0, np.int64))
        other = (np.concatenate(self._other) if self._other
                 else np.empty(0, np.int64))
        self._key = self._other = None
        self.owned = np.unique(key)
        e_key = np.searchsorted(self.owned, key)
        ob = _bucket_of(other, self.nb)
        o = np.argsort(ob, kind="stable")
        self.e_other = other[o]
        self.e_key_idx = e_key[o]
        self.splits = np.searchsorted(ob[o], np.arange(self.nb + 1))
        self.labels = self.owned.copy()
        return len(self.owned)

    def scatter(self):
        lab = self.labels[self.e_key_idx]
        out = []
        for t in range(self.nb):
            sl = slice(self.splits[t], self.splits[t + 1])
            out.append(_group_min(self.e_other[sl], lab[sl]))
        return tuple(out)

    def gather(self, *msgs) -> int:
        new = self.labels.copy()
        for ids, ml in msgs:
            if len(ids):
                idx = np.searchsorted(self.owned, ids)
                np.minimum.at(new, idx, ml)
        changed = int((new != self.labels).sum())
        self.labels = new
        return changed

    def result(self) -> pa.Table:
        return pa.table({"node": pa.array(self.owned),
                         "component": pa.array(self.labels)})

    def checkpoint(self, cdir: str, rnd: int) -> int:
        import os

        import pyarrow.parquet as pq

        d = os.path.join(cdir, f"round_{rnd:04d}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".shard_{self.b}.parquet.tmp")
        pq.write_table(self.result(), tmp)
        os.replace(tmp, os.path.join(d, f"shard_{self.b}.parquet"))
        return len(self.owned)

    def restore(self, cdir: str, rnd: int) -> int:
        import os

        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(cdir, f"round_{rnd:04d}",
                                       f"shard_{self.b}.parquet"))
        node = t["node"].to_numpy().astype(np.int64)
        if not np.array_equal(node, self.owned):
            raise ValueError(
                f"cc checkpoint shard {self.b}: node layout mismatch "
                f"(different edges or shard count?)")
        self.labels = t["component"].to_numpy().astype(np.int64)
        return rnd


def connected_components_actors(edges, src: str = "id_a",
                                dst: str = "id_b", max_iters: int = 50,
                                num_shards: int | None = None,
                                checkpoint_dir: str | None = None):
    """Hash-min connected components on a resident actor-sharded graph
    — identical fixed point as ``connected_components`` (the minimum
    reachable id is unique), but the doubled edge table is loaded into
    shard actors ONCE and each round exchanges only per-shard
    pre-combined label minima, instead of re-shuffling O(E) edge rows
    twice per round. Convergence = a round with zero label changes."""
    import ray
    import ray.data as rd

    nb = _shard_count(num_shards)
    if checkpoint_dir:
        import json
        import os

        os.makedirs(checkpoint_dir, exist_ok=True)
        meta_path = os.path.join(checkpoint_dir, "meta.json")
        meta = {"num_shards": nb, "algo": "cc_hashmin"}
        if os.path.exists(meta_path):
            if json.load(open(meta_path)) != meta:
                raise ValueError("cc checkpoint_dir was written with "
                                 "different parameters/shard count")
        else:
            tmp = meta_path + ".tmp"
            json.dump(meta, open(tmp, "w"))
            os.replace(tmp, meta_path)
    Shard = ray.remote(_CCShard)
    shards = [Shard.remote(b, nb) for b in range(nb)]
    try:
        return _cc_rounds(edges, shards, nb, src, dst, max_iters,
                          checkpoint_dir)
    finally:
        for sh in shards:
            ray.kill(sh)


def _cc_rounds(edges, shards, nb, src, dst, max_iters,
               checkpoint_dir=None):
    import ray
    import ray.data as rd

    _route_edges(edges, shards, nb, src, dst, mode="doubled")
    n_owned = ray.get([sh.init.remote() for sh in shards])

    start = 0
    converged = False
    if checkpoint_dir:
        done = [r for r in _complete_rounds(checkpoint_dir, nb)
                if r <= max_iters]
        if done:
            start = max(done)
            ray.get([sh.restore.remote(checkpoint_dir, start)
                     for sh in shards])
            # the metrics table records each round's label-change
            # count: a restored round with zero changes IS the fixed
            # point (otherwise a resume at start == max_iters would
            # spuriously raise despite a valid converged snapshot)
            import os

            import pyarrow.parquet as _pq

            m = _pq.read_table(os.path.join(
                checkpoint_dir, f"round_{start:04d}",
                "metrics.parquet"))
            if int(pc.sum(m["n_changed"]).as_py() or 0) == 0:
                converged = True

    for rnd in range(start + 1, max_iters + 1):
        if converged:
            break
        t0 = None
        if checkpoint_dir:
            import time as _time
            t0 = _time.monotonic()
        sc = [sh.scatter.options(num_returns=nb).remote() for sh in shards]
        changed = ray.get(
            [shards[t].gather.remote(*[sc[b][t] for b in range(nb)])
             for t in range(nb)])
        if checkpoint_dir:
            import os
            import time as _time

            import pyarrow.parquet as _pq

            wall = _time.monotonic() - t0
            ray.get([sh.checkpoint.remote(checkpoint_dir, rnd)
                     for sh in shards])
            d = os.path.join(checkpoint_dir, f"round_{rnd:04d}")
            _pq.write_table(pa.table({
                "round": pa.array(np.full(nb, rnd, np.int64)),
                "shard": pa.array(np.arange(nb, dtype=np.int64)),
                "n_nodes": pa.array(np.asarray(n_owned, np.int64)),
                "n_changed": pa.array(np.asarray(changed, np.int64)),
                "round_wall_s": pa.array(np.full(nb, wall, np.float64)),
            }), os.path.join(d, "metrics.parquet"))
            open(os.path.join(d, "_DONE"), "w").close()
        if sum(changed) == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(f"connected_components: no convergence "
                           f"in {max_iters} rounds")
    # materialize BEFORE the caller's finally kills the pool
    return rd.from_arrow_refs(
        [sh.result.remote() for sh in shards]).materialize()


class _HitsShard:
    """Resident partition for HITS (Kleinberg 1999) hubs & authorities:
    holds TWO edge layouts — forward edges keyed by src (authority
    scatter: hub mass flows src→dst) and reversed edges keyed by dst
    (hub scatter: authority mass flows dst→src) — plus the (hub, auth)
    state of the nodes hashing here. Each half-round ships only
    per-destination pre-combined int64 sums; the driver injects the
    GLOBAL max-based divisor for integer normalization (values stay
    ≤ ~2·scale, so per-node message sums stay far below 2^63 up to
    ~10^12 in-links per node at scale=10^6)."""

    def __init__(self, b: int, nb: int):
        self.b, self.nb = b, nb
        self._fs, self._fd = [], []   # forward (src, dst), keyed by src
        self._rs, self._rd = [], []   # reverse (dst, src), keyed by dst
        self._seen = set()

    def add_edges(self, kind: str, token: int, key: np.ndarray,
                  other: np.ndarray) -> int:
        if (kind, token) in self._seen:
            return len(key)
        self._seen.add((kind, token))
        (self._fs if kind == "f" else self._rs).append(key)
        (self._fd if kind == "f" else self._rd).append(other)
        return len(key)

    def node_exchange(self):
        """Route every referenced other-end id to its owner shard."""
        self.fs = (np.concatenate(self._fs) if self._fs
                   else np.empty(0, np.int64))
        self.fd = (np.concatenate(self._fd) if self._fd
                   else np.empty(0, np.int64))
        self.rs = (np.concatenate(self._rs) if self._rs
                   else np.empty(0, np.int64))
        self.rd = (np.concatenate(self._rd) if self._rd
                   else np.empty(0, np.int64))
        self._fs = self._fd = self._rs = self._rd = None
        ends = np.unique(np.concatenate([self.fd, self.rd]))
        eb = _bucket_of(ends, self.nb)
        return tuple(ends[eb == t] for t in range(self.nb))

    def init(self, scale: int, *incoming) -> int:
        self.scale = np.int64(scale)
        self.owned = np.unique(np.concatenate(
            [self.fs, self.rs, *incoming]))
        # forward layout: contribution h[owned_idx(src)] routed to dst
        self.f_idx = np.searchsorted(self.owned, self.fs)
        db = _bucket_of(self.fd, self.nb)
        o = np.argsort(db, kind="stable")
        self.f_dst = self.fd[o]
        self.f_idx = self.f_idx[o]
        self.f_splits = np.searchsorted(db[o], np.arange(self.nb + 1))
        # reverse layout: contribution a[owned_idx(dst)] routed to src
        self.r_idx = np.searchsorted(self.owned, self.rs)
        sb = _bucket_of(self.rd, self.nb)
        o = np.argsort(sb, kind="stable")
        self.r_dst = self.rd[o]
        self.r_idx = self.r_idx[o]
        self.r_splits = np.searchsorted(sb[o], np.arange(self.nb + 1))
        self.fs = self.fd = self.rs = self.rd = None
        self.hub = np.full(len(self.owned), scale, np.int64)
        self.auth = np.full(len(self.owned), scale, np.int64)
        return len(self.owned)

    def _scatter(self, vals, e_idx, e_dst, splits):
        contrib = vals[e_idx]
        out = []
        for t in range(self.nb):
            sl = slice(splits[t], splits[t + 1])
            out.append(_group_sum(e_dst[sl], contrib[sl]))
        return tuple(out)

    def scatter_fwd(self):
        return self._scatter(self.hub, self.f_idx, self.f_dst,
                             self.f_splits)

    def scatter_rev(self):
        return self._scatter(self.auth, self.r_idx, self.r_dst,
                             self.r_splits)

    def gather_raw(self, *msgs) -> int:
        """Accumulate raw sums; return the local max for the driver's
        global normalization divisor."""
        total = np.zeros(len(self.owned), np.int64)
        for ids, sums in msgs:
            if len(ids):
                total[np.searchsorted(self.owned, ids)] += sums
        self.raw = total
        return int(total.max(initial=0))

    def finish_auth(self, divisor: int) -> int:
        self.auth = self.raw // np.int64(divisor)
        self.raw = None
        return len(self.owned)

    def finish_hub(self, divisor: int) -> int:
        self.hub = self.raw // np.int64(divisor)
        self.raw = None
        return len(self.owned)

    def result(self) -> pa.Table:
        return pa.table({"node": pa.array(self.owned),
                         "hub": pa.array(self.hub),
                         "auth": pa.array(self.auth)})


def hits_actors(edges, src: str = "src", dst: str = "dst",
                iters: int = 5, scale: int = 1_000_000,
                num_shards: int | None = None):
    """Integer HITS on the resident shard pool: per round, authority =
    per-node sum of in-neighbor hub scores normalized by the global
    divisor max(1, max_raw // scale), then hub = sum of out-neighbor
    (new) authority scores, same normalization — all int64 floor
    arithmetic, bit-reproducible for any partitioning and replayable
    in DuckDB as chained CTEs (the pagerank-oracle pattern plus a MAX
    subquery per half-round). Returns (node, hub, auth)."""
    import ray
    import ray.data as rd

    nb = _shard_count(num_shards)
    Shard = ray.remote(_HitsShard)
    shards = [Shard.remote(b, nb) for b in range(nb)]
    try:
        return _hits_rounds(edges, shards, nb, src, dst, iters, scale)
    finally:
        for sh in shards:
            ray.kill(sh)


def _hits_rounds(edges, shards, nb, src, dst, iters, scale):
    import ray
    import ray.data as rd

    _route_edges(edges, shards, nb, src, dst, mode="both")
    ex = [sh.node_exchange.options(num_returns=nb).remote()
          for sh in shards]
    ray.get([shards[t].init.remote(scale, *[ex[b][t] for b in range(nb)])
             for t in range(nb)])

    for _ in range(iters):
        sc = [sh.scatter_fwd.options(num_returns=nb).remote()
              for sh in shards]
        mx = ray.get(
            [shards[t].gather_raw.remote(*[sc[b][t] for b in range(nb)])
             for t in range(nb)])
        d_a = max(1, max(mx) // scale)
        ray.get([sh.finish_auth.remote(d_a) for sh in shards])
        sc = [sh.scatter_rev.options(num_returns=nb).remote()
              for sh in shards]
        mx = ray.get(
            [shards[t].gather_raw.remote(*[sc[b][t] for b in range(nb)])
             for t in range(nb)])
        d_h = max(1, max(mx) // scale)
        ray.get([sh.finish_hub.remote(d_h) for sh in shards])
    # materialize BEFORE the caller's finally kills the pool
    return rd.from_arrow_refs(
        [sh.result.remote() for sh in shards]).materialize()


BFS_INF = np.int64(1) << np.int64(40)   # unreachable sentinel (2^40)


class _BfsShard:
    """Resident partition for directed BFS / hop distance from a seed
    set: holds the out-edges whose SRC hashes here (contribution
    dist[src]+1 routed to dst) plus the distances of every node that
    hashes here (dst-only nodes are claimed via node_exchange, as in
    _HitsShard). Messages are per-destination pre-combined minima;
    sources still at BFS_INF are masked out of the scatter — a
    bit-exact optimization, since INF+1 can never lower any
    distance ≤ INF."""

    def __init__(self, b: int, nb: int):
        self.b, self.nb = b, nb
        self._src, self._dst = [], []
        self._seen = set()

    def add_edges(self, token: int, src: np.ndarray,
                  dst: np.ndarray) -> int:
        if token in self._seen:
            return len(src)
        self._seen.add(token)
        self._src.append(src)
        self._dst.append(dst)
        return len(src)

    def node_exchange(self):
        self.src = (np.concatenate(self._src) if self._src
                    else np.empty(0, np.int64))
        self.dst = (np.concatenate(self._dst) if self._dst
                    else np.empty(0, np.int64))
        self._src = self._dst = None
        ends = np.unique(self.dst)
        eb = _bucket_of(ends, self.nb)
        return tuple(ends[eb == t] for t in range(self.nb))

    def init(self, seed_mod: int, *incoming, weight_mod=None,
             temporal_mod=None) -> int:
        self.owned = np.unique(np.concatenate([self.src, *incoming]))
        self.e_src_idx = np.searchsorted(self.owned, self.src)
        db = _bucket_of(self.dst, self.nb)
        o = np.argsort(db, kind="stable")
        self.e_dst = self.dst[o]
        self.e_src_idx = self.e_src_idx[o]
        # deterministic per-edge weight w = (src+dst) % weight_mod + 1
        # (a pure function of the edge, so duplicate edges agree and
        # the DuckDB replay computes the identical expression inline);
        # None keeps the unit-weight BFS path bit-for-bit unchanged.
        self.e_w = (None if weight_mod is None else
                    ((self.src + self.dst) % np.int64(weight_mod)
                     + np.int64(1))[o])
        # temporal mode: edges carry the deterministic TIME
        # t = (src+dst) % temporal_mod and the fold is time-respecting
        # earliest arrival — an edge relaxes only when its time is at
        # or after the source's current arrival, and the contribution
        # IS the edge time (not dist+w)
        self.e_t = (None if temporal_mod is None else
                    ((self.src + self.dst)
                     % np.int64(temporal_mod))[o])
        self.splits = np.searchsorted(db[o], np.arange(self.nb + 1))
        self.src = self.dst = None
        self.dist = np.where(self.owned % seed_mod == 0,
                             np.int64(0), BFS_INF)
        return int((self.dist == 0).sum())

    def scatter(self):
        d = self.dist[self.e_src_idx]
        out = []
        for t in range(self.nb):
            sl = slice(self.splits[t], self.splits[t + 1])
            if self.e_t is not None:
                ts = self.e_t[sl]
                live = (d[sl] < BFS_INF) & (ts >= d[sl])
                out.append(_group_min(self.e_dst[sl][live], ts[live]))
                continue
            live = d[sl] < BFS_INF
            w = (np.int64(1) if self.e_w is None
                 else self.e_w[sl][live])
            out.append(_group_min(self.e_dst[sl][live],
                                  d[sl][live] + w))
        return tuple(out)

    def gather(self, *msgs) -> int:
        new = self.dist.copy()
        for ids, md in msgs:
            if len(ids):
                idx = np.searchsorted(self.owned, ids)
                np.minimum.at(new, idx, md)
        changed = int((new != self.dist).sum())
        self.dist = new
        return changed

    def result(self) -> pa.Table:
        return pa.table({"node": pa.array(self.owned),
                         "dist": pa.array(self.dist)})


def bfs_actors(edges, src: str = "src", dst: str = "dst",
               seed_mod: int = 97, iters: int = 8,
               num_shards: int | None = None,
               weight_mod: int | None = None,
               temporal_mod: int | None = None):
    """Hop distance from the seed set {node : node % seed_mod == 0}
    following edge direction, capped at ``iters`` rounds (nodes
    farther than that — or unreachable — keep the BFS_INF sentinel).
    With ``weight_mod`` set, edges carry the deterministic integer
    weight ``(src + dst) % weight_mod + 1`` and the propagation is
    min-plus over weighted paths (Bellman-Ford rounds on the same
    resident-shard engine — SSSP, not just hop count). With
    ``temporal_mod`` set, edges carry the deterministic TIME
    ``(src + dst) % temporal_mod`` and the fold is time-respecting
    EARLIEST ARRIVAL (Wu et al., VLDB'14 one-pass semantics run in
    synchronous rounds): an edge relaxes only when its time ≥ the
    source's current arrival, and the relaxed value is the edge time.
    Fixed round count makes any of these an exact replay of a chained
    min-fold LEFT-JOIN CTE in DuckDB, independent of sharding.
    Reference analogue: link-distance crawls in web-graph analysis
    (no direct reference op; the graph layer generalizes
    /root/reference/pythongis/vector/sql.py's per-group folds to
    iterative whole-graph folds)."""
    import ray
    import ray.data as rd

    if weight_mod is not None and temporal_mod is not None:
        raise ValueError("weight_mod and temporal_mod are exclusive")
    nb = _shard_count(num_shards)
    Shard = ray.remote(_BfsShard)
    shards = [Shard.remote(b, nb) for b in range(nb)]
    try:
        return _bfs_rounds(edges, shards, nb, src, dst, seed_mod, iters,
                           weight_mod, temporal_mod)
    finally:
        for sh in shards:
            ray.kill(sh)


def _bfs_rounds(edges, shards, nb, src, dst, seed_mod, iters,
                weight_mod=None, temporal_mod=None):
    import ray
    import ray.data as rd

    _route_edges(edges, shards, nb, src, dst, mode="directed")
    ex = [sh.node_exchange.options(num_returns=nb).remote()
          for sh in shards]
    ray.get([shards[t].init.remote(seed_mod,
                                   *[ex[b][t] for b in range(nb)],
                                   weight_mod=weight_mod,
                                   temporal_mod=temporal_mod)
             for t in range(nb)])

    for _ in range(iters):
        sc = [sh.scatter.options(num_returns=nb).remote()
              for sh in shards]
        changed = ray.get(
            [shards[t].gather.remote(*[sc[b][t] for b in range(nb)])
             for t in range(nb)])
        if sum(changed) == 0:
            break   # fixed point ≤ iters rounds: identical to running all
    return rd.from_arrow_refs(
        [sh.result.remote() for sh in shards]).materialize()


WALK_MUL = np.int64(2654435761)          # Knuth multiplicative hash
WALK_ADD = np.int64(40503)
WALK_MOD = np.int64(2147483647)          # 2^31 - 1
_WALK_CUR_MOD = np.int64(1) << np.int64(31)


def _walk_choice(cur: np.ndarray, step: int) -> np.ndarray:
    """Deterministic per-(node, step) pseudo-random draw in
    [0, 2^31-1): ((cur mod 2^31)·MUL + step·ADD) mod (2^31-1).
    (cur mod 2^31)·MUL ≤ 2^31·2.66e9 < 2^63, so int64 is exact and
    the same expression replays verbatim in DuckDB BIGINT."""
    return ((cur % _WALK_CUR_MOD) * WALK_MUL
            + np.int64(step) * WALK_ADD) % WALK_MOD


class _WalkShard:
    """Resident partition for deterministic random walks: holds the
    DISTINCT sorted out-adjacency (CSR keyed by src) of the nodes
    hashing here plus the walkers currently AT those nodes. Each
    round every walker steps to out-neighbor[h(cur, k) mod deg]
    (dead ends stay put) and is routed to the next node's owner;
    each shard appends the (start, step, node) rows it hosts."""

    def __init__(self, b: int, nb: int):
        self.b, self.nb = b, nb
        self._src, self._dst = [], []
        self._seen = set()

    def add_edges(self, token: int, src: np.ndarray,
                  dst: np.ndarray) -> int:
        if token in self._seen:
            return len(src)
        self._seen.add(token)
        self._src.append(src)
        self._dst.append(dst)
        return len(src)

    def node_exchange(self):
        self.src = (np.concatenate(self._src) if self._src
                    else np.empty(0, np.int64))
        self.dst = (np.concatenate(self._dst) if self._dst
                    else np.empty(0, np.int64))
        self._src = self._dst = None
        ends = np.unique(self.dst)
        eb = _bucket_of(ends, self.nb)
        return tuple(ends[eb == t] for t in range(self.nb))

    def init(self, *incoming):
        # distinct (src, dst), sorted by (src, dst) → CSR
        pair = np.unique(np.stack([self.src, self.dst], axis=1), axis=0)
        s, d = ((pair[:, 0], pair[:, 1]) if len(pair)
                else (np.empty(0, np.int64), np.empty(0, np.int64)))
        self.owned = np.unique(np.concatenate([self.src, *incoming]))
        self.src = self.dst = None
        self.nbrs = d
        # CSR bounds: run of owned[i] in s is [indptr[i], indptr[i+1])
        # (every s value is owned, so the next node's start closes it)
        self.indptr = np.searchsorted(s, self.owned)
        self.indptr = np.concatenate(
            [self.indptr, [len(s)]]).astype(np.int64)
        # walkers start at every owned node
        self.w_start = self.owned.copy()
        self.w_cur = self.owned.copy()
        self.out = [pa.table({
            "start": pa.array(self.owned),
            "step": pa.array(np.zeros(len(self.owned), np.int64)),
            "node": pa.array(self.owned)})]
        return len(self.owned)

    def step(self, k: int):
        """Advance resident walkers one round; return per-target-shard
        (start, next) arrays."""
        if len(self.w_cur) == 0:
            empty = (np.empty(0, np.int64), np.empty(0, np.int64))
            return tuple(empty for _ in range(self.nb))
        idx = np.searchsorted(self.owned, self.w_cur)
        lo = self.indptr[idx]
        deg = self.indptr[idx + 1] - lo
        h = _walk_choice(self.w_cur, k)
        nxt = self.w_cur.copy()
        m = deg > 0
        nxt[m] = self.nbrs[lo[m] + h[m] % deg[m]]
        tb = _bucket_of(nxt, self.nb)
        self.w_start_pending = self.w_start
        self.w_start = self.w_cur = None
        out = []
        for t in range(self.nb):
            sl = tb == t
            out.append((self.w_start_pending[sl], nxt[sl]))
        return tuple(out)

    def land(self, k: int, *msgs) -> int:
        starts = [s for s, _ in msgs]
        curs = [c for _, c in msgs]
        self.w_start = (np.concatenate(starts) if starts
                        else np.empty(0, np.int64))
        self.w_cur = (np.concatenate(curs) if curs
                      else np.empty(0, np.int64))
        self.out.append(pa.table({
            "start": pa.array(self.w_start),
            "step": pa.array(np.full(len(self.w_start), k, np.int64)),
            "node": pa.array(self.w_cur)}))
        return len(self.w_cur)

    def result(self) -> pa.Table:
        return pa.concat_tables(self.out)


def random_walks(edges, src: str = "src", dst: str = "dst",
                 length: int = 4, num_shards: int | None = None):
    """DeepWalk-style sampling corpus: one deterministic walk of
    ``length`` steps from EVERY node, stepping to the h(cur, k)-th
    distinct out-neighbor (sorted by id; dead ends stay put). Output
    is (start, step, node), (length+1) rows per start node —
    bit-reproducible for any sharding and an exact DuckDB replay
    (ROW_NUMBER adjacency + chained LEFT-JOIN CTEs). This is the
    sampling stage a graph-embedding (DeepWalk/node2vec) training
    pipeline runs at corpus scale."""
    import ray
    import ray.data as rd

    nb = _shard_count(num_shards)
    Shard = ray.remote(_WalkShard)
    shards = [Shard.remote(b, nb) for b in range(nb)]
    try:
        return _walk_rounds(edges, shards, nb, src, dst, length)
    finally:
        for sh in shards:
            ray.kill(sh)


def _walk_rounds(edges, shards, nb, src, dst, length):
    import ray
    import ray.data as rd

    _route_edges(edges, shards, nb, src, dst, mode="directed")
    ex = [sh.node_exchange.options(num_returns=nb).remote()
          for sh in shards]
    ray.get([shards[t].init.remote(*[ex[b][t] for b in range(nb)])
             for t in range(nb)])

    for k in range(1, length + 1):
        sc = [sh.step.options(num_returns=nb).remote(k)
              for sh in shards]
        ray.get([shards[t].land.remote(k, *[sc[b][t] for b in range(nb)])
                 for t in range(nb)])
    return rd.from_arrow_refs(
        [sh.result.remote() for sh in shards]).materialize()


class _KCoreShard:
    """Resident partition for k-core peeling: holds the DOUBLED
    distinct edges whose KEY endpoint hashes here (CSR), an alive
    mask per owned node and an alive mask per edge-other. Each round
    kills owned nodes whose alive-degree < k and ships ONLY the dead
    ids to the shards owning the reverse edges (message volume =
    edges of dying nodes — O(E) summed over the whole peel, not per
    round)."""

    def __init__(self, b: int, nb: int):
        self.b, self.nb = b, nb
        self._key, self._other = [], []
        self._seen = set()

    def add_edges(self, token: int, key: np.ndarray,
                  other: np.ndarray) -> int:
        if token in self._seen:
            return len(key)
        self._seen.add(token)
        self._key.append(key)
        self._other.append(other)
        return len(key)

    def init(self) -> int:
        key = (np.concatenate(self._key) if self._key
               else np.empty(0, np.int64))
        other = (np.concatenate(self._other) if self._other
                 else np.empty(0, np.int64))
        self._key = self._other = None
        # distinct (key, other) — global dedup holds because every
        # copy of an edge keyed by this node hashes to this shard
        pair = (np.unique(np.stack([key, other], axis=1), axis=0)
                if len(key) else np.empty((0, 2), np.int64))
        key, other = pair[:, 0], pair[:, 1]
        self.owned = np.unique(key)
        o = np.argsort(key, kind="stable")    # already sorted, cheap
        self.e_other = other[o]
        self.indptr = np.concatenate(
            [np.searchsorted(key[o], self.owned),
             [len(key)]]).astype(np.int64)
        self.alive = np.ones(len(self.owned), bool)
        self.e_other_alive = np.ones(len(self.e_other), bool)
        return len(self.owned)

    def peel(self, k: int):
        """Kill owned alive nodes with alive-degree < k; return the
        dead ids routed per owner shard of the reverse edges."""
        deg = self._alive_deg()
        dead = self.alive & (deg < k)
        self.alive[dead] = False
        # notify the owners of the REVERSE edges: for each dying
        # node's edge (dead → other), other's owner shard holds
        # (other → dead) and must mark it. Message volume = edges of
        # dying nodes, O(E) summed over the whole peel.
        idx = np.nonzero(dead)[0]
        starts = self.indptr[idx]
        counts = self.indptr[idx + 1] - starts
        total = int(counts.sum())
        if total == 0:
            empty = np.empty(0, np.int64)
            return tuple(empty for _ in range(self.nb))
        base = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos = np.repeat(starts - base, counts) + np.arange(total)
        others = self.e_other[pos]
        deads = np.repeat(self.owned[idx], counts)
        tb = _bucket_of(others, self.nb)
        return tuple(np.unique(deads[tb == t]) for t in range(self.nb))

    def mark_dead(self, *msgs) -> int:
        allv = [m for m in msgs if len(m)]
        if not allv:
            return 0
        dead = np.unique(np.concatenate(allv))
        hit = np.isin(self.e_other, dead)
        self.e_other_alive[hit] = False
        return int(len(dead))

    def _alive_deg(self) -> np.ndarray:
        """Per-owned-node count of alive others (exact cumsum-diff
        over the CSR segments — handles empty segments)."""
        c = np.concatenate(
            [[0], np.cumsum(self.e_other_alive.astype(np.int64))])
        return c[self.indptr[1:]] - c[self.indptr[:-1]]

    def result(self, k: int) -> pa.Table:
        deg = self._alive_deg()
        m = self.alive
        return pa.table({"node": pa.array(self.owned[m]),
                         "deg_core": pa.array(deg[m])})


def kcore(edges, src: str = "src", dst: str = "dst", k: int = 2,
          max_rounds: int = 16, num_shards: int | None = None):
    """k-core membership of the UNDIRECTED distinct-edge graph:
    iteratively remove nodes with fewer than k alive neighbors
    (simultaneous rounds) until a fixed point or ``max_rounds``;
    returns surviving (node, deg_core). Fixed simultaneous rounds
    make the result an exact replay of chained degree-filter CTEs in
    DuckDB regardless of sharding; the early exit on a no-death
    round is bit-exact (monotone fixed point). Self-loops count once
    toward degree (distinct doubled pairs)."""
    import ray
    import ray.data as rd

    nb = _shard_count(num_shards)
    Shard = ray.remote(_KCoreShard)
    shards = [Shard.remote(b, nb) for b in range(nb)]
    try:
        return _kcore_rounds(edges, shards, nb, src, dst, k, max_rounds)
    finally:
        for sh in shards:
            ray.kill(sh)


def _kcore_rounds(edges, shards, nb, src, dst, k, max_rounds):
    import ray
    import ray.data as rd

    _route_edges(edges, shards, nb, src, dst, mode="doubled")
    ray.get([sh.init.remote() for sh in shards])

    for _ in range(max_rounds):
        sc = [sh.peel.options(num_returns=nb).remote(k)
              for sh in shards]
        n_dead = ray.get(
            [shards[t].mark_dead.remote(*[sc[b][t] for b in range(nb)])
             for t in range(nb)])
        if sum(n_dead) == 0:
            break
    return rd.from_arrow_refs(
        [sh.result.remote(k) for sh in shards]).materialize()


def _group_mode_min(node: np.ndarray, lbl: np.ndarray,
                    cnt: np.ndarray):
    """Per-node argmax label by count, ties to the SMALLEST label:
    lexsort by (node, -count, label) and take each node's first row.
    Exact and deterministic for int64 inputs."""
    o = np.lexsort((lbl, -cnt, node))
    n, l = node[o], lbl[o]
    first = np.concatenate(([True], n[1:] != n[:-1]))
    return n[first], l[first]


def _group_sum2(a: np.ndarray, b: np.ndarray, v: np.ndarray):
    """Sum v per (a, b) pair (lexsort + reduceat), exact int64."""
    if len(a) == 0:
        return a, b, v
    o = np.lexsort((b, a))
    a, b, v = a[o], b[o], v[o]
    first = np.concatenate(
        ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
    starts = np.nonzero(first)[0]
    return a[starts], b[starts], np.add.reduceat(v, starts)


class _LpaShard:
    """Resident partition for synchronous label propagation
    (community detection): doubled distinct edges keyed by node, the
    node's current label resident. Each round ships per-destination
    (label, count) pairs PRE-COMBINED per shard — volume is
    O(distinct (dst, label)), not O(E) — and each node adopts its
    neighbors' majority label, ties to the smallest label id."""

    def __init__(self, b: int, nb: int):
        self.b, self.nb = b, nb
        self._key, self._other = [], []
        self._seen = set()

    def add_edges(self, token: int, key: np.ndarray,
                  other: np.ndarray) -> int:
        if token in self._seen:
            return len(key)
        self._seen.add(token)
        self._key.append(key)
        self._other.append(other)
        return len(key)

    def init(self) -> int:
        key = (np.concatenate(self._key) if self._key
               else np.empty(0, np.int64))
        other = (np.concatenate(self._other) if self._other
                 else np.empty(0, np.int64))
        self._key = self._other = None
        pair = (np.unique(np.stack([key, other], axis=1), axis=0)
                if len(key) else np.empty((0, 2), np.int64))
        key, other = pair[:, 0], pair[:, 1]
        self.owned = np.unique(key)
        self.e_key_idx = np.searchsorted(self.owned, key)
        ob = _bucket_of(other, self.nb)
        o = np.argsort(ob, kind="stable")
        self.e_other = other[o]
        self.e_key_idx = self.e_key_idx[o]
        self.splits = np.searchsorted(ob[o], np.arange(self.nb + 1))
        self.labels = self.owned.copy()
        return len(self.owned)

    def scatter(self):
        lab = self.labels[self.e_key_idx]
        out = []
        for t in range(self.nb):
            sl = slice(self.splits[t], self.splits[t + 1])
            out.append(_group_sum2(self.e_other[sl], lab[sl],
                                   np.ones(self.splits[t + 1]
                                           - self.splits[t], np.int64)))
        return tuple(out)

    def gather(self, *msgs) -> int:
        nodes = np.concatenate([m[0] for m in msgs])
        lbls = np.concatenate([m[1] for m in msgs])
        cnts = np.concatenate([m[2] for m in msgs])
        if len(nodes) == 0:
            return 0
        a, b, v = _group_sum2(nodes, lbls, cnts)
        n, l = _group_mode_min(a, b, v)
        new = self.labels.copy()
        new[np.searchsorted(self.owned, n)] = l
        changed = int((new != self.labels).sum())
        self.labels = new
        return changed

    def result(self) -> pa.Table:
        return pa.table({"node": pa.array(self.owned),
                         "community": pa.array(self.labels)})


def label_propagation(edges, src: str = "src", dst: str = "dst",
                      rounds: int = 3, num_shards: int | None = None):
    """Synchronous label propagation communities (Raghavan et al.
    2007, made deterministic): every node starts as its own label;
    each of the FIXED ``rounds`` simultaneous rounds adopts the
    majority label among neighbors, ties broken toward the smallest
    label id. Fixed rounds + deterministic ties = bit-reproducible
    for any sharding and an exact DuckDB replay (grouped counts +
    ROW_NUMBER per round)."""
    import ray
    import ray.data as rd

    nb = _shard_count(num_shards)
    Shard = ray.remote(_LpaShard)
    shards = [Shard.remote(b, nb) for b in range(nb)]
    try:
        return _lpa_rounds(edges, shards, nb, src, dst, rounds)
    finally:
        for sh in shards:
            ray.kill(sh)


def _lpa_rounds(edges, shards, nb, src, dst, rounds):
    import ray
    import ray.data as rd

    _route_edges(edges, shards, nb, src, dst, mode="doubled")
    ray.get([sh.init.remote() for sh in shards])

    for _ in range(rounds):
        sc = [sh.scatter.options(num_returns=nb).remote()
              for sh in shards]
        ray.get([shards[t].gather.remote(*[sc[b][t] for b in range(nb)])
                 for t in range(nb)])
    return rd.from_arrow_refs(
        [sh.result.remote() for sh in shards]).materialize()


# ------------------------------------------- strongly connected comps

class _SccShard:
    """Resident partition for strongly connected components via
    forward min-coloring + backward same-color anchoring (the
    distributed coloring algorithm of Orzan 2004 / Slota et al.,
    with FIXED round caps so the whole run replays as chained CTEs):
    per outer round, (1) undecided nodes propagate the minimum color
    along forward edges for ≤ inner rounds; (2) roots (col == id)
    anchor; (3) anchoring spreads ≤ inner rounds along REVERSE edges
    but only onto nodes of the SAME color — an anchored node is
    therefore mutually reachable with its root, so every emitted
    group is strongly connected BY CONSTRUCTION (caps can only split
    a large-diameter SCC across outer rounds, never merge two);
    (4) anchored nodes are decided with scc = color, colors reset.
    Holds both edge layouts (the _HitsShard pattern); color messages
    are per-destination pre-combined minima, anchor messages are
    deduped (target, color) pairs."""

    def __init__(self, b: int, nb: int):
        self.b, self.nb = b, nb
        self._fs, self._fd = [], []   # forward (src, dst), keyed by src
        self._rs, self._rd = [], []   # reverse (dst, src), keyed by dst
        self._seen = set()

    def add_edges(self, kind: str, token: int, key: np.ndarray,
                  other: np.ndarray) -> int:
        if (kind, token) in self._seen:
            return len(key)
        self._seen.add((kind, token))
        (self._fs if kind == "f" else self._rs).append(key)
        (self._fd if kind == "f" else self._rd).append(other)
        return len(key)

    def node_exchange(self):
        self.fs = (np.concatenate(self._fs) if self._fs
                   else np.empty(0, np.int64))
        self.fd = (np.concatenate(self._fd) if self._fd
                   else np.empty(0, np.int64))
        self.rs = (np.concatenate(self._rs) if self._rs
                   else np.empty(0, np.int64))
        self.rd = (np.concatenate(self._rd) if self._rd
                   else np.empty(0, np.int64))
        self._fs = self._fd = self._rs = self._rd = None
        ends = np.unique(np.concatenate([self.fd, self.rd]))
        eb = _bucket_of(ends, self.nb)
        return tuple(ends[eb == t] for t in range(self.nb))

    def init(self, *incoming) -> int:
        self.owned = np.unique(np.concatenate(
            [self.fs, self.rs, *incoming]))
        self.f_idx = np.searchsorted(self.owned, self.fs)
        db = _bucket_of(self.fd, self.nb)
        o = np.argsort(db, kind="stable")
        self.f_dst = self.fd[o]
        self.f_idx = self.f_idx[o]
        self.f_splits = np.searchsorted(db[o], np.arange(self.nb + 1))
        self.r_idx = np.searchsorted(self.owned, self.rs)
        sb = _bucket_of(self.rd, self.nb)
        o = np.argsort(sb, kind="stable")
        self.r_dst = self.rd[o]
        self.r_idx = self.r_idx[o]
        self.r_splits = np.searchsorted(sb[o], np.arange(self.nb + 1))
        self.fs = self.fd = self.rs = self.rd = None
        self.col = self.owned.copy()
        self.dec = np.zeros(len(self.owned), bool)
        self.anch = np.zeros(len(self.owned), bool)
        self.scc = np.full(len(self.owned), np.int64(-1))
        return len(self.owned)

    def scatter_col(self):
        c = self.col[self.f_idx]
        live = ~self.dec[self.f_idx]
        out = []
        for t in range(self.nb):
            sl = slice(self.f_splits[t], self.f_splits[t + 1])
            m = live[sl]
            out.append(_group_min(self.f_dst[sl][m], c[sl][m]))
        return tuple(out)

    def gather_col(self, *msgs) -> int:
        new = self.col.copy()
        for ids, mc in msgs:
            if len(ids):
                idx = np.searchsorted(self.owned, ids)
                np.minimum.at(new, idx, mc)
        new = np.where(self.dec, self.col, new)
        changed = int((new != self.col).sum())
        self.col = new
        return changed

    def mark_roots(self) -> int:
        self.anch = (~self.dec) & (self.col == self.owned)
        return int(self.anch.sum())

    def scatter_anch(self):
        live = self.anch[self.r_idx]
        out = []
        for t in range(self.nb):
            sl = slice(self.r_splits[t], self.r_splits[t + 1])
            m = live[sl]
            u = self.r_dst[sl][m]
            c = self.col[self.r_idx[sl][m]]
            if len(u):
                o = np.lexsort((c, u))
                u, c = u[o], c[o]
                keep = np.concatenate(
                    ([True], (u[1:] != u[:-1]) | (c[1:] != c[:-1])))
                u, c = u[keep], c[keep]
            out.append((u, c))
        return tuple(out)

    def gather_anch(self, *msgs) -> int:
        changed = 0
        for ids, cols in msgs:
            if len(ids):
                idx = np.searchsorted(self.owned, ids)
                upd = (~self.dec[idx]) & (~self.anch[idx]) \
                    & (self.col[idx] == cols)
                if upd.any():
                    self.anch[idx[upd]] = True
                    changed += int(upd.sum())
        return changed

    def finish_outer(self) -> int:
        a = self.anch
        self.scc = np.where(a, self.col, self.scc)
        self.dec = self.dec | a
        self.col = np.where(self.dec, self.col, self.owned)
        self.anch = np.zeros(len(self.owned), bool)
        return int((~self.dec).sum())

    def result(self) -> pa.Table:
        return pa.table({"node": pa.array(self.owned),
                         "scc": pa.array(self.scc)})


def scc_actors(edges, src: str = "src", dst: str = "dst",
               outer: int = 4, inner: int = 8,
               num_shards: int | None = None):
    """Strongly connected components (web bow-tie structure, spam
    rings): ``outer`` coloring rounds of ``inner``-capped forward
    min-color propagation + backward same-color anchoring on the
    resident shard pool. Deterministic for any sharding; nodes not
    decided within the caps keep scc = -1 (sound: every emitted
    group is strongly connected; exact when inner covers each class
    diameter and outer covers the root chain — the link_distance
    round-cap contract). Early exits at fixpoints are bit-exact."""
    import ray
    import ray.data as rd

    nb = _shard_count(num_shards)
    Shard = ray.remote(_SccShard)
    shards = [Shard.remote(b, nb) for b in range(nb)]
    try:
        return _scc_rounds(edges, shards, nb, src, dst, outer, inner)
    finally:
        for sh in shards:
            ray.kill(sh)


def _scc_rounds(edges, shards, nb, src, dst, outer, inner):
    import ray
    import ray.data as rd

    _route_edges(edges, shards, nb, src, dst, mode="both")
    ex = [sh.node_exchange.options(num_returns=nb).remote()
          for sh in shards]
    ray.get([shards[t].init.remote(*[ex[b][t] for b in range(nb)])
             for t in range(nb)])

    for _ in range(outer):
        for _ in range(inner):
            sc = [sh.scatter_col.options(num_returns=nb).remote()
                  for sh in shards]
            ch = ray.get([shards[t].gather_col.remote(
                *[sc[b][t] for b in range(nb)]) for t in range(nb)])
            if sum(ch) == 0:
                break
        ray.get([sh.mark_roots.remote() for sh in shards])
        for _ in range(inner):
            sc = [sh.scatter_anch.options(num_returns=nb).remote()
                  for sh in shards]
            ch = ray.get([shards[t].gather_anch.remote(
                *[sc[b][t] for b in range(nb)]) for t in range(nb)])
            if sum(ch) == 0:
                break
        und = ray.get([sh.finish_outer.remote() for sh in shards])
        if sum(und) == 0:
            break
    return rd.from_arrow_refs(
        [sh.result.remote() for sh in shards]).materialize()


def _truss_support(e):
    """Per-edge triangle support over a CANONICAL (u<v, distinct)
    edge Dataset: enumerate triangles a<b<c via wedge join (b) +
    closing-edge probe ((a,c) composite key), then count each
    triangle once toward all three of its edges. Edges in no
    triangle do not appear (support 0). Returns Dataset
    (u, v, support). Uses the bucketed fallback join — the native
    Dataset.join spawns a fresh actor pool per call, too costly for
    the peeling loop."""
    ab = e.map_batches(lambda b: pa.table({"a": b["u"], "b": b["v"]}),
                       batch_format="pyarrow", batch_size=65536)
    bc = e.map_batches(lambda b: pa.table({"b": b["u"], "c": b["v"]}),
                       batch_format="pyarrow", batch_size=65536)
    ac = e.map_batches(lambda b: pa.table({"a": b["u"], "c": b["v"]}),
                       batch_format="pyarrow", batch_size=65536)
    wedges = rel.join_large(ab, bc, on="b", num_buckets=16, native=False)
    tri = rel.join_large(
        wedges.map_batches(lambda b: b.select(["a", "b", "c"]),
                           batch_format="pyarrow", batch_size=65536),
        ac, on=["a", "c"], num_buckets=16, native=False)

    def emit_roles(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        c = batch["c"].to_numpy(zero_copy_only=False)
        return pa.table({
            "u": np.concatenate([a, b, a]).astype(np.int64),
            "v": np.concatenate([b, c, c]).astype(np.int64)})

    roles = tri.map_batches(emit_roles, batch_format="pyarrow",
                            batch_size=65536)

    def count(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["u", "v"], sort=False).size()
        out = c.reset_index()
        out.columns = ["u", "v", "support"]
        return out.astype(np.int64)

    supp = rel.bucketed_group_apply(roles, ["u", "v"], count)
    return rel.with_empty_schema(supp, pa.schema(
        [("u", pa.int64()), ("v", pa.int64()), ("support", pa.int64())]))


def ktruss(edges, src: str = "src", dst: str = "dst", k: int = 4,
           max_rounds: int = 4):
    """k-truss of the undirected distinct-edge graph (Cohen 2008):
    iteratively delete edges supported by fewer than k-2 triangles
    (simultaneous rounds) until a fixed point or ``max_rounds``;
    returns surviving edges with their final support. The community-
    core / spam-ring detector one notch stricter than k-core.

    Simultaneous rounds with a FIXED cap make the result an exact
    replay of chained triangle-filter CTEs in DuckDB; the early exit
    on a no-death round is bit-exact (edge deletion is monotone, so
    once a round removes nothing every later round is identical).
    Each round is two hash-partitioned joins + one bucketed count —
    the per-round state is only the narrow surviving edge list,
    re-materialized so the peeling loop never re-executes lineage."""
    def canon(batch: pa.Table) -> pa.Table:
        u = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"u": np.minimum(u, v), "v": np.maximum(u, v)})

    e = edges.map_batches(canon, batch_format="pyarrow", batch_size=65536)
    e = rel.dedup(e, ["u", "v"])
    e = rel.with_empty_schema(e, pa.schema(
        [("u", pa.int64()), ("v", pa.int64())])).materialize()
    n_edges = e.count()

    thresh = k - 2
    for _ in range(max_rounds):
        supp = _truss_support(e)
        e = supp.map_batches(
            lambda b: b.filter(pc.greater_equal(b["support"], thresh))
            .select(["u", "v"]),
            batch_format="pyarrow", batch_size=65536).materialize()
        n_new = e.count()
        if n_new == 0:
            # all later rounds (and the final support pass) are empty
            import ray.data as rd
            return rd.from_arrow(pa.table({
                "u": pa.array([], pa.int64()),
                "v": pa.array([], pa.int64()),
                "support": pa.array([], pa.int64())}))
        if n_new == n_edges:
            break
        n_edges = n_new

    return _truss_support(e)


def clustering_coefficient(edges, src: str = "src", dst: str = "dst"):
    """Local clustering coefficient per node over the undirected
    distinct-edge graph: cc = 2·tri / (deg·(deg-1)) reported as exact
    integer ppm (one floor division — no float accumulates), for
    nodes with deg >= 2. Triangles are enumerated once (a<b<c wedge
    join + closing-edge probe, the _truss_support plan) and each
    counts toward all three corners; degrees come from the doubled
    distinct edge list. Both per-node tables are node-bounded; they
    meet in ONE bucketed combine via union-all partials (no join)."""
    def canon(batch: pa.Table) -> pa.Table:
        u = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"u": np.minimum(u, v), "v": np.maximum(u, v)})

    e = edges.map_batches(canon, batch_format="pyarrow", batch_size=65536)
    e = rel.dedup(e, ["u", "v"])
    e = rel.with_empty_schema(e, pa.schema(
        [("u", pa.int64()), ("v", pa.int64())])).materialize()

    supp = _truss_support(e)   # reuse: emits (u,v,support) per EDGE

    # per-NODE triangle counts: sum each edge's support and divide by
    # 2 (every triangle at a node covers exactly two incident edges)
    def node_tri(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        s = batch["support"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": np.concatenate([u, v]).astype(np.int64),
            "tri2": np.concatenate([s, s]).astype(np.int64),
            "deg": np.zeros(2 * len(u), np.int64)})

    def node_deg(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        n = 2 * len(u)
        return pa.table({
            "node": np.concatenate([u, v]).astype(np.int64),
            "tri2": np.zeros(n, np.int64),
            "deg": np.ones(n, np.int64)})

    tri_parts = supp.map_batches(node_tri, batch_format="pyarrow",
                                 batch_size=65536)
    deg_parts = e.map_batches(node_deg, batch_format="pyarrow",
                              batch_size=65536)
    parts = tri_parts.union(deg_parts)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("node", sort=False)[["tri2", "deg"]].sum() \
            .reset_index()
        c = c[c["deg"] >= 2]
        node = c["node"].to_numpy(np.int64)
        tri = c["tri2"].to_numpy(np.int64) // 2
        deg = c["deg"].to_numpy(np.int64)
        return pd.DataFrame({
            "node": node, "tri": tri, "deg": deg,
            "cc_ppm": 2 * tri * 1_000_000 // (deg * (deg - 1))})

    out = rel.bucketed_group_apply(parts, ["node"], combine)
    return rel.with_empty_schema(out, pa.schema(
        [("node", pa.int64()), ("tri", pa.int64()),
         ("deg", pa.int64()), ("cc_ppm", pa.int64())]))


class _MultiBfsShard(_BfsShard):
    """_BfsShard with VECTOR state: one distance column per landmark
    set {node % seed_mod == l}, l < n_land — S BFS frontiers advance
    in the same rounds over the same resident edges (the landmark /
    sketch-based distance-feature pattern: one edge ingest, not S).
    Messages stay 1-D per landmark (pre-combined minima)."""

    def init(self, seed_mod: int, n_land: int, *incoming) -> int:
        self.owned = np.unique(np.concatenate([self.src, *incoming]))
        self.e_src_idx = np.searchsorted(self.owned, self.src)
        db = _bucket_of(self.dst, self.nb)
        o = np.argsort(db, kind="stable")
        self.e_dst = self.dst[o]
        self.e_src_idx = self.e_src_idx[o]
        self.splits = np.searchsorted(db[o], np.arange(self.nb + 1))
        self.src = self.dst = None
        self.S = n_land
        rem = self.owned % np.int64(seed_mod)
        self.dist = np.where(
            rem[:, None] == np.arange(n_land, dtype=np.int64)[None, :],
            np.int64(0), BFS_INF)
        return int((self.dist == 0).sum())

    def scatter(self):
        d = self.dist[self.e_src_idx]            # (E, S)
        out = []
        for t in range(self.nb):
            sl = slice(self.splits[t], self.splits[t + 1])
            msgs = []
            for l in range(self.S):
                dl = d[sl, l]
                live = dl < BFS_INF
                msgs.append(_group_min(self.e_dst[sl][live],
                                       dl[live] + np.int64(1)))
            out.append(tuple(msgs))
        return tuple(out)

    def gather(self, *msgs) -> int:
        new = self.dist.copy()
        for per_l in msgs:
            for l, (ids, md) in enumerate(per_l):
                if len(ids):
                    idx = np.searchsorted(self.owned, ids)
                    np.minimum.at(new[:, l], idx, md)
        changed = int((new != self.dist).sum())
        self.dist = new
        return changed

    def result(self) -> pa.Table:
        cols = {"node": pa.array(self.owned)}
        for l in range(self.S):
            cols[f"d{l}"] = pa.array(self.dist[:, l])
        return pa.table(cols)


def multi_bfs_actors(edges, src: str = "src", dst: str = "dst",
                     seed_mod: int = 97, n_landmarks: int = 3,
                     iters: int = 8, num_shards: int | None = None):
    """Simultaneous hop distances from ``n_landmarks`` seed sets
    ({node % seed_mod == l}) in ONE resident-shard run — the landmark
    distance-feature / harmonic-centrality prep. Edges route once;
    every round advances all landmark frontiers together, so the cost
    over single-landmark BFS is only the extra message columns. Fixed
    round cap => exact replay of n_landmarks chained min-plus
    LEFT-JOIN CTE sets in DuckDB."""
    import ray
    import ray.data as rd

    nb = _shard_count(num_shards)
    Shard = ray.remote(_MultiBfsShard)
    shards = [Shard.remote(b, nb) for b in range(nb)]
    try:
        _route_edges(edges, shards, nb, src, dst, mode="directed")
        ex = [sh.node_exchange.options(num_returns=nb).remote()
              for sh in shards]
        ray.get([shards[t].init.remote(seed_mod, n_landmarks,
                                       *[ex[b][t] for b in range(nb)])
                 for t in range(nb)])
        for _ in range(iters):
            sc = [sh.scatter.options(num_returns=nb).remote()
                  for sh in shards]
            changed = ray.get(
                [shards[t].gather.remote(*[sc[b][t] for b in range(nb)])
                 for t in range(nb)])
            if sum(changed) == 0:
                break
        return rd.from_arrow_refs(
            [sh.result.remote() for sh in shards]).materialize()
    finally:
        for sh in shards:
            ray.kill(sh)
