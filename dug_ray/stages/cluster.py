"""Dedup clustering: connected components over near-duplicate pairs.

The operation a training-data dedup pipeline runs after candidate pair
generation: group transitively-connected near-dups so one canonical doc per
cluster survives. Ray Data has no iterative-graph primitive, so this is the
(a)-style composition the brief prescribes — min-label propagation as a
driver loop of bucketed exchanges:

- labels start as each doc's own id;
- each round, every edge offers its endpoint labels to the other endpoint
  (one partitioned ``hash_join`` of the label table against the edge list
  — neither side broadcast), and each doc keeps the min label seen
  (bucketed grouped min);
- the label sum is monotonically decreasing, so convergence is detected
  with a scalar ``Dataset.sum`` per round — no label table ever reaches
  the driver. Rounds needed = graph diameter (near-dup clusters are tiny
  and dense; at web scale the large-star/small-star variant halves rounds,
  same exchange shape).

Per-round label tables are materialized (object-store pinned) — the
standard checkpoint discipline for iterative algorithms, O(docs x 2 ints).
Cluster edges use an integer-exact Jaccard threshold (``3*inter >=
n_a + n_b`` <=> jaccard >= 0.5), so the whole operator has an exact DuckDB
oracle via a recursive CTE (transitive closure + min reach).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dug_ray.shuffle import bucketed_group_apply, hash_join


def neardup_edges(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Undirected near-dup edges: pairs with word-3-gram jaccard >= 0.5,
    compared in integer space (3*inter >= n_a+n_b) for cross-engine
    exactness. Output: src, dst (both directions)."""
    from dug_ray.stages.dedup import _pairs_from_inverted, shingles

    pairs = _pairs_from_inverted(shingles(docs))

    def both_dirs(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[(df["inter"] >= 2)
                & (3 * df["inter"] >= df["n_a"] + df["n_b"])]
        a = df["doc_id_a"].to_numpy(dtype=np.int64)
        b = df["doc_id_b"].to_numpy(dtype=np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64()),
        })

    return pairs.map_batches(both_dirs, batch_format="pyarrow", batch_size=None)


def min_label_propagation(edges: ray.data.Dataset, labels: ray.data.Dataset,
                          max_rounds: int = 20,
                          num_buckets: int = 16) -> ray.data.Dataset:
    """Distributed min-label propagation to convergence — the shared
    iterative core of ``connected_components`` and the dense-graph fallback
    of ``graph.cooc_components``.

    ``edges``: (src, dst) int64 with BOTH directions present;
    ``labels``: initial (doc, label) int64 (label = own id).  Each round
    every edge offers its dst's current label to its src (one partitioned
    ``hash_join``, neither side broadcast) and each doc keeps the min seen
    (bucketed grouped min).  The label sum decreases monotonically, so
    convergence is one scalar ``Dataset.sum`` per round — no label table
    ever reaches the driver.  Returns the converged (doc, label) table."""
    prev_sum = labels.sum("label")

    def min_label(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("doc", as_index=False).agg(label=("label", "min"))

    def project(batch: pa.Table) -> pa.Table:
        if "src" not in batch.column_names:  # empty-join schema loss quirk
            return pa.table({"doc": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64())})
        return pa.table({"doc": pc.cast(batch["src"], pa.int64()),
                         "label": pc.cast(batch["label"], pa.int64())})

    for _ in range(max_rounds):
        # each edge forwards its dst's current label to its src
        offered = hash_join(edges, labels, "dst", "doc")
        cand = offered.map_batches(project, batch_format="pyarrow",
                                   batch_size=None).union(labels)
        labels = bucketed_group_apply(cand, "doc", min_label,
                                      num_buckets).materialize()
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    # falling through without convergence would silently split a
    # component into several cluster ids — refuse instead
    raise RuntimeError(
        f"min_label_propagation did not converge in {max_rounds} rounds "
        f"(component diameter exceeds max_rounds); raise max_rounds")


def connected_components(docs: ray.data.Dataset, max_rounds: int = 20,
                         max_driver_edges: int = 5_000_000) -> ray.data.Dataset:
    """doc_id -> cluster_id (= min doc_id reachable through near-dup edges;
    singletons cluster with themselves).

    Two paths, same result:

    - **edge list fits the driver** (the common case — near-dup edges are
      orders of magnitude sparser than the corpus): collect the edges,
      vectorized numpy min-label propagation with pointer jumping over the
      compacted node ids (8 B/node arrays, no Python dict), ``ray.put`` the
      (nodes, cluster) arrays (O(docs-in-edges), not O(docs)) and assign
      via ``searchsorted`` in one ``map_batches``. One pass over the
      corpus, no distributed iteration.
    - **edge list too big** (> ``max_driver_edges``): the distributed
      min-label propagation loop below — nothing on the driver beyond a
      scalar per round."""
    edges = neardup_edges(docs).materialize()

    def init(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.int64())
        return pa.table({"doc": ids, "label": ids})

    labels = docs.map_batches(init, batch_format="pyarrow",
                              batch_size=None).materialize()
    n_edges = edges.count()
    if n_edges == 0:  # no near-dups: everything is its own cluster
        return labels.map_batches(
            lambda b: pa.table({"doc_id": b["doc"], "cluster_id": b["label"]}),
            batch_format="pyarrow", batch_size=None)

    if n_edges <= max_driver_edges:
        # fully vectorized on compacted int arrays (8 B/node + 8 B/edge-end,
        # not a Python dict): min-label over all edges (both directions are
        # present) + pointer jumping, O(E) numpy work per round, O(log n)
        # rounds. label[i] only ever decreases, so label[label] composes
        # monotonically and the fixpoint is the component minimum.
        e = edges.to_pandas()
        src = e["src"].to_numpy(dtype=np.int64)
        dst = e["dst"].to_numpy(dtype=np.int64)
        nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
        a_idx, b_idx = inv[:len(src)], inv[len(src):]
        label = np.arange(len(nodes), dtype=np.int64)
        while True:
            prev = label
            label = label.copy()
            np.minimum.at(label, a_idx, label[b_idx])
            while True:  # pointer jumping to fixpoint
                nxt = label[label]
                if np.array_equal(nxt, label):
                    break
                label = nxt
            if np.array_equal(label, prev):
                break
        # nodes ascend, so the min label INDEX maps to the min doc_id
        cmap_ref = ray.put((nodes, nodes[label]))

        def assign(batch: pa.Table) -> pa.Table:
            nds, clus = ray.get(cmap_ref)
            ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(nds, ids), 0, max(len(nds) - 1, 0))
            in_edges = nds[pos] == ids if len(nds) else np.zeros(len(ids), bool)
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(np.where(in_edges, clus[pos], ids),
                                       pa.int64()),
            })

        return docs.map_batches(assign, batch_format="pyarrow", batch_size=None)

    labels = min_label_propagation(edges, labels, max_rounds=max_rounds)

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pc.cast(batch["doc"], pa.int64()),
                         "cluster_id": pc.cast(batch["label"], pa.int64())})

    return labels.map_batches(fin, batch_format="pyarrow", batch_size=None)
