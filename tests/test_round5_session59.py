"""Round-5 session-59: TextRank keywords, md5-bit permutation test,
Brier-score Murphy decomposition — hand-computed pins."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def test_textrank_adjacency_ranks():
    # corpus "a b a" + "b c": undirected adjacency edges
    # {a<->b, b<->c}; hand-run 3 integer PageRank rounds over the
    # 3-node graph (outdeg a=1, b=2, c=1, scale 1e12)
    from dug_ray.stages.graph import pagerank

    docs = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2], "text": ["a b a", "b c"]}))
    import pyarrow.compute as pc
    from dug_ray.shuffle import typed_table

    def edges(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parent = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        flat = toks.flatten().to_pandas().to_numpy()
        a, b = flat[:-1], flat[1:]
        keep = (parent[:-1] == parent[1:]) & (a != b)
        e = pd.DataFrame({"subj": np.concatenate([a[keep], b[keep]]),
                          "obj": np.concatenate([b[keep], a[keep]])}) \
            .drop_duplicates()
        return typed_table(e, subj=pa.string(), obj=pa.string())

    ranks = pagerank(docs.map_batches(edges, batch_format="pyarrow",
                                      batch_size=None)).to_pandas()
    got = dict(zip(ranks["node"], ranks["rank_mass"]))

    # reference integer iteration
    nodes = ["a", "b", "c"]
    ed = {("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")}
    out = {n: [o for (s, o) in ed if s == n] for n in nodes}
    scale = 10 ** 12
    r = {n: scale // 3 for n in nodes}
    for _ in range(3):
        inbox = {n: 0 for n in nodes}
        for s in nodes:
            share = r[s] // len(out[s])
            for o in out[s]:
                inbox[o] += share
        r = {n: (15 * scale) // (100 * 3) + (85 * inbox[n]) // 100
             for n in nodes}
    assert got == r


def test_perm_test_observed_row_and_pvalue():
    # 4 orders, 2 urgent with prices 30/40, rest 10/20: observed
    # |mean diff| = |35 - 15| = 20 dollars -> 2000 cents -> 2e7 e4
    sf = _mini_orders()
    import dug_ray.queries as q
    out = q.QUERIES["perm_test"](sf).to_pandas()
    assert len(out) == 65
    obs = out[out["perm"] == -1].iloc[0]
    assert obs["n1"] == 2 and obs["s1_cents"] == 7000
    assert obs["absdiff_e4"] == 20_000_000
    assert obs["ge_obs"] == 1  # observed always >= itself
    # p_milli consistent with the ge column
    ge = int(out[out["perm"] >= 0]["ge_obs"].sum())
    assert out["p_milli"].nunique() == 1
    assert int(out["p_milli"].iloc[0]) == (1000 * (ge + 1)) // 65
    # one perm replicated by hand from the md5 bit
    k = 5
    rows = {1: 1000, 2: 2000, 3: 3000, 4: 4000}
    n1 = s1 = 0
    for okey, cents in rows.items():
        h = int.from_bytes(
            hashlib.md5(f"pt:{okey}".encode()).digest()[:8], "big")
        if (h >> k) & 1:
            n1 += 1
            s1 += cents
    prow = out[out["perm"] == k].iloc[0]
    assert (int(prow["n1"]), int(prow["s1_cents"])) == (n1, s1)


def test_brier_decomposition_identity():
    # REL - RES + UNC == Brier (Murphy identity) within floor slack;
    # exact integer state replicated by hand
    sf = _mini_orders()
    import dug_ray.queries as q
    out = q.QUERIES["brier_decomp"](sf).to_pandas()
    # hand state
    state = {}
    ys = {1: 1, 2: 0, 3: 1, 4: 0}  # status F,O,F,O
    for okey, y in ys.items():
        p = int(hashlib.md5(f"br:{okey}".encode()).hexdigest()[:15],
                16) % 1001
        b = p // 100
        n, sy, sp, sse = state.get(b, (0, 0, 0, 0))
        state[b] = (n + 1, sy + y, sp + p, sse + (p - 1000 * y) ** 2)
    assert len(out) == len(state)
    for _, r in out.iterrows():
        assert state[int(r["bin"])] == (int(r["n"]), int(r["sum_y"]),
                                        int(r["sum_p_milli"]),
                                        int(r["sse"]))
    # Murphy identity in micro units (each term floored per bin -> the
    # recombination can drift by at most one micro per bin per term)
    tn = int(out["n"].sum())
    ty = int(out["sum_y"].sum())
    ybar = ty / tn
    unc_micro = 1_000_000 * ybar * (1 - ybar)
    brier = int(out["brier_micro"].sum())
    rel = int(out["rel_micro"].sum())
    res = int(out["res_micro"].sum())
    assert abs((rel - res + unc_micro) - brier) < 4 * len(out) + 2


def _mini_orders(_cache={}):
    import os
    import tempfile

    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s59_")
    pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4],
        "o_orderpriority": ["1-URGENT", "3-MEDIUM", "1-URGENT",
                            "5-LOW"],
        "o_totalprice": [30.0, 10.0, 40.0, 20.0],
        "o_orderstatus": ["F", "O", "F", "O"],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d
