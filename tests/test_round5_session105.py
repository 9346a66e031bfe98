"""Round-5 session-105: Whittaker beta, Preston octaves, disparity
backbone — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def _docs(rows, prefix, _cache={}):
    key = (prefix, tuple(rows))
    if key in _cache:
        return _cache[key]
    d = tempfile.mkdtemp(prefix=prefix)
    df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    df["lang"] = "en"
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(os.path.join(d, "documents.parquet"))
    _cache[key] = d
    return d


def test_whittaker_beta_hand_pin():
    import dug_ray.queries as q
    rows = [(1, "s1", "a b"), (2, "s2", "b c")]
    out = q.QUERIES["whittaker_beta"](
        _docs(rows, "s105wb_")).to_pandas().iloc[0]
    # S_total=3, sites {a,b} and {b,c} -> sum=4, k=2
    # beta = 1000*3*2//4 - 1000 = 500
    assert (int(out["s_total"]), int(out["k_sources"]),
            int(out["beta_milli"])) == (3, 2, 500)


def test_preston_octaves_hand_pin():
    import dug_ray.queries as q
    rows = [(1, "s", "a a a a a b b c")]
    out = q.QUERIES["preston_octaves"](
        _docs(rows, "s105po_")).to_pandas().set_index("octave")
    # f: a=5 (octave 2), b=2 (octave 1), c=1 (octave 0)
    assert (int(out.loc[0, "n_types"]),
            int(out.loc[0, "n_tokens"])) == (1, 1)
    assert (int(out.loc[1, "n_types"]),
            int(out.loc[1, "n_tokens"])) == (1, 2)
    assert (int(out.loc[2, "n_types"]),
            int(out.loc[2, "n_tokens"])) == (1, 5)


def test_backbone_filter_sanity():
    import dug_ray.queries as q
    sf = "/root/testdata/sf0.001"
    out = q.QUERIES["backbone_filter"](sf).to_pandas().iloc[0]
    # structural invariants: backbone is a subgraph; share in [0, 1e6]
    assert 0 <= int(out["n_backbone"]) <= int(out["n_edges"])
    assert 0 <= int(out["weight_share_ppm"]) <= 1_000_000
    assert int(out["n_edges"]) > 0
