"""Round-5 session-23: iterative Lloyd k-means."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _embeddings(d, mat):
    tbl = pa.table({
        "vec_id": pa.array(range(len(mat)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in mat],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(mat), pa.int32())})
    pq.write_table(tbl, os.path.join(d, "embeddings.parquet"))


def test_kmeans_lloyd_members_conserved_and_converges():
    from dug_ray.stages.similarity import kmeans_lloyd
    rng = np.random.RandomState(3)
    # two tight blobs on orthogonal axes + 12 header rows (queries 0-3,
    # seed centroids 4-11 split between the blobs)
    a = rng.normal([10, 0, 0], 0.1, size=(20, 3))
    b = rng.normal([0, 10, 0], 0.1, size=(20, 3))
    header = np.vstack([rng.normal(1, 0.5, size=(4, 3)),
                        a[:4], b[:4]])
    mat = np.vstack([header, a[4:], b[4:]]).astype("float32")
    with tempfile.TemporaryDirectory() as d:
        _embeddings(d, mat)
        r3 = kmeans_lloyd(d, rounds=3).to_pandas()
        r4 = kmeans_lloyd(d, rounds=4).to_pandas()
    n_vectors = len(mat) - 4  # every vec_id >= 4 is a member
    for out in (r3, r4):
        per_dim = out.groupby("dim")["n_members"].sum()
        assert (per_dim == n_vectors).all()
    # tight blobs converge fast: an extra round leaves the reduction
    # unchanged (fixpoint), unlike round 1 vs 3 where centroids moved
    key = ["centroid_id", "dim"]
    pd.testing.assert_frame_equal(
        r3.sort_values(key).reset_index(drop=True),
        r4.sort_values(key).reset_index(drop=True))


def test_kmeans_lloyd_empty_cluster_carries_centroid():
    from dug_ray.stages.similarity import kmeans_lloyd
    # all members sit on one axis: most seed centroids go empty and must
    # not crash or steal members
    base = np.tile([5.0, 0.0], (30, 1))
    base += np.arange(30)[:, None] * [0.01, 0.0]
    header = np.tile([[0.0, 5.0]], (12, 1))
    header[4] = [5.0, 0.05]  # one seed near the data
    mat = np.vstack([header, base]).astype("float32")
    with tempfile.TemporaryDirectory() as d:
        _embeddings(d, mat)
        out = kmeans_lloyd(d, rounds=2).to_pandas()
    g = out.groupby("centroid_id")["n_members"].first()
    assert g.loc[4] > 0            # the near-data centroid holds members
    assert g.sum() == len(mat) - 4
