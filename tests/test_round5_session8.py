"""Round-5 session-8: Count-Min sketch, KS drift, per-group KL, Gram
moments."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _docs(texts, langs=None):
    df = pd.DataFrame({"doc_id": range(1, len(texts) + 1), "text": texts})
    if langs is not None:
        df["lang"] = langs
    return ray.data.from_pandas(df).repartition(min(3, len(texts)))


def test_cms_registers_partition_independent_and_conservative():
    from dug_ray.stages.sketch import CMS_D, CMS_W, cms_registers
    texts = ["a b a", "b c", "a"]
    r1 = cms_registers(_docs(texts)).to_pandas()
    r2 = cms_registers(
        ray.data.from_pandas(pd.DataFrame(
            {"text": texts}))).to_pandas()  # single block
    key = ["salt", "idx"]
    assert len(r1) == CMS_D * CMS_W
    pd.testing.assert_frame_equal(
        r1.sort_values(key).reset_index(drop=True),
        r2.sort_values(key).reset_index(drop=True))
    # every row's total mass equals the token count (6)
    assert (r1.groupby("salt")["cnt"].sum() == 6).all()


def test_cms_estimate_never_underestimates():
    from dug_ray.stages.sketch import cms_estimate
    texts = ["a b a c d e", "b c f g h", "a i j k"]
    out = cms_estimate(_docs(texts), ["a", "b", "zz_absent"]).to_pandas()
    out = out.set_index("term")
    assert out.loc["a", "true_count"] == 3
    assert out.loc["b", "true_count"] == 2
    assert out.loc["zz_absent", "true_count"] == 0
    assert (out["est_count"] >= out["true_count"]).all()


def test_ks_statistic_exact_ppm():
    from dug_ray.stages.drift import ks_statistic
    # A = {1, 2}, B = {2, 3, 3}: CDF gap is max at val=1 (1/2 - 0/3) or
    # val=2 (1 - 1/3 = 2/3) -> D = 2/3
    df = pd.DataFrame({"flag": ["x", "x", "y", "y", "y"],
                       "val": [1, 2, 2, 3, 3]})
    out = ks_statistic(ray.data.from_pandas(df).repartition(2),
                       "val", "flag", "x").to_pandas()
    assert out.loc[0, "n_a"] == 2 and out.loc[0, "n_b"] == 3
    assert out.loc[0, "d_ppm"] == (2 * 1_000_000) // 3


def test_kl_by_group_matches_hand_computation():
    from dug_ray.stages.drift import kl_by_group
    texts, langs = ["a a b", "a c"], ["en", "fr"]
    out = (kl_by_group(_docs(texts, langs), "lang", num_buckets=3)
           .to_pandas().set_index("group"))
    # corpus: a=3 b=1 c=1, N=5, V=3; en: a=2 b=1 (n=3); fr: a=1 c=1 (n=2)
    nv = float(5 + 3)

    def w(c, nl, ct):
        return math.floor(
            math.log((float(c) * nv) / (float(nl) * float(ct + 1))) * 1e6)

    exp_en = 2 * w(2, 3, 3) + 1 * w(1, 3, 1)
    exp_fr = 1 * w(1, 2, 3) + 1 * w(1, 2, 1)
    assert int(out.loc["en", "kl_unats_xn"]) == exp_en
    assert int(out.loc["fr", "kl_unats_xn"]) == exp_fr
    assert out.loc["en", "n_tokens"] == 3
    assert out.loc["fr", "n_tokens"] == 2


def test_embedding_gram_matches_numpy():
    import dug_ray.queries as q
    vecs = np.arange(12, dtype=np.float32).reshape(4, 3) / 7.0
    tbl = pa.table({
        "vec_id": pa.array(range(4), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))})
    import tempfile, pyarrow.parquet as pq, os
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "embeddings.parquet"))
        out = q.QUERIES["embedding_gram"](d).to_pandas()
    qm = np.floor(vecs.astype("float64") * 1e3).astype("int64")
    g = qm.T @ qm
    got = {(r.dim_i, r.dim_j): r.sumprod_milli for r in out.itertuples()}
    for i in range(3):
        for j in range(i, 3):
            assert got[(i + 1, j + 1)] == g[i, j]
    assert (out["n"] == 4).all()
