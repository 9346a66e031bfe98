"""Round-5 session-74: cluster-validity trio (silhouette, Calinski-
Harabasz, Davies-Bouldin) — hand-computed pins on a float32-exact
fixture (all coordinates are powers of two, so quantization is
lossless)."""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq


def _mini_emb(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s74emb_")
    vecs = [[0.0, 0.0], [0.5, 0.0], [1.0, 0.0], [1.5, 0.0]]
    t = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1, 1], pa.int32()),
    })
    pq.write_table(t, os.path.join(d, "embeddings.parquet"))
    _cache["dir"] = d
    return d


def test_silhouette_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["silhouette_labels"](_mini_emb()).to_pandas()
    m = {int(r["label"]): (int(r["n"]), int(r["s_milli"]),
                           int(r["mean_s_milli"]))
         for _, r in out.iterrows()}
    # centroids (250000,0) and (1250000,0); s = 960 and 888 per label
    assert m[0] == (2, 1848, 924)
    assert m[1] == (2, 1848, 924)


def test_calinski_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["calinski_harabasz"](_mini_emb()).to_pandas().iloc[0]
    # W = 4 * 250000^2 = 2.5e11; global c = 750000; B = 1e12
    assert (int(out["n"]), int(out["k"])) == (4, 2)
    assert int(out["ssw"]) == 250_000_000_000
    assert int(out["ssb"]) == 1_000_000_000_000
    assert int(out["ch_milli"]) == 8000   # 1000*B*2 // (W*1)


def test_davies_bouldin_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["davies_bouldin"](_mini_emb()).to_pandas()
    m = {int(r["label"]): (int(r["v_scatter"]), int(r["r_max_milli"]),
                           int(r["db_milli"]))
         for _, r in out.iterrows()}
    # v = 6.25e10 each; m = 1e12; R = 1000*1.25e11 // 1e12 = 125
    assert m[0] == (62_500_000_000, 125, 125)
    assert m[1] == (62_500_000_000, 125, 125)
