"""Round-5 session-60: Mann-Kendall trend test, matrix-profile
discords, truncated Katz centrality — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _mini_orders(_cache={}):
    """9 orders in 1995 with daily counts [1, 2, 2, 3, 1]."""
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s60_")
    days = (["1995-03-01"] * 1 + ["1995-03-02"] * 2 + ["1995-03-03"] * 2
            + ["1995-03-04"] * 3 + ["1995-03-05"] * 1)
    pd.DataFrame({
        "o_orderkey": range(1, 10),
        "o_orderdate": pd.to_datetime(days).astype("datetime64[us]"),
        "o_totalprice": [100.0] * 9,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_mann_kendall_hand_pin():
    # counts [1,2,2,3,1]: S = +3 + 0 + 0 - 1 = 2; ties 1x2, 2x2 ->
    # tsum = 2*1*9 + 2*1*9 = 36; var18 = 5*4*15 - 36 = 264;
    # z = floor(1000*(2-1)/sqrt(264/18)) = 261
    import dug_ray.queries as q
    out = q.QUERIES["mann_kendall"](_mini_orders()).to_pandas() \
        .sort_values("yr").reset_index(drop=True)
    assert list(out["yr"]) == [0, 1995]
    for _, r in out.iterrows():
        assert int(r["n_days"]) == 5
        assert int(r["s_stat"]) == 2
        assert int(r["var18"]) == 264
        assert int(r["z_milli"]) == math.floor(
            1000.0 * 1 / math.sqrt(264 / 18.0)) == 261


def _mp_orders(_cache={}):
    """21 consecutive 1997 days, one order each; dollars form a flat
    series with one anomalous week."""
    if "dir" in _cache:
        return _cache["dir"], _cache["v"]
    d = tempfile.mkdtemp(prefix="s60mp_")
    v = [100] * 21
    for k in range(7, 14):       # days 7..13 are the discord week
        v[k] = 100 + 10 * (k - 6)
    days = pd.date_range("1997-05-01", periods=21, freq="D")
    pd.DataFrame({
        "o_orderkey": range(1, 22),
        "o_orderdate": days.astype("datetime64[us]"),
        "o_totalprice": [float(x) for x in v],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"], _cache["v"] = d, v
    return d, v


def test_matrix_profile_vs_bruteforce():
    import dug_ray.queries as q
    sf, v = _mp_orders()
    out = q.QUERIES["matrix_profile"](sf).to_pandas()
    assert len(out) == 5
    # brute-force reference profile
    w, dp = 7, 21 - 7 + 1
    vv = np.asarray(v, dtype=np.int64)
    ref = {}
    for i in range(dp):
        best = None
        for j in range(dp):
            if abs(i - j) < w:
                continue
            d2 = int(((vv[i:i + w] - vv[j:j + w]) ** 2).sum())
            if best is None or d2 < best[0] or (d2 == best[0]
                                                and j < best[1]):
                best = (d2, j)
        if best is not None:
            ref[i] = best
    top = sorted(ref.items(), key=lambda kv: (-kv[1][0], kv[0]))[:5]
    got = {int(r["idx"]): (int(r["dist2"]), int(r["nn_idx"]))
           for _, r in out.iterrows()}
    assert got == {i: b for i, b in top}
    # day column is the epoch-day of the start index
    day0 = int(pd.Timestamp("1997-05-01").value // 10 ** 9 // 86_400)
    for _, r in out.iterrows():
        assert int(r["day"]) == day0 + int(r["idx"])


def test_matrix_profile_short_series_empty():
    import dug_ray.queries as q

    d = tempfile.mkdtemp(prefix="s60sp_")
    pd.DataFrame({
        "o_orderkey": [1, 2],
        "o_orderdate": pd.to_datetime(["1997-01-01", "1997-01-02"])
        .astype("datetime64[us]"),
        "o_totalprice": [10.0, 20.0],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    ds = q.QUERIES["matrix_profile"](d)
    assert ds.count() == 0
    assert ds.schema().names == ["idx", "day", "nn_idx", "dist2"]


def test_katz_hand_iteration():
    # a->b, a->c, b->c; scale 1e9, attenuation //4, 3 hops:
    # t1 = {b: 250e6, c: 500e6}; t2 = {c: 62.5e6}; t3 = {}
    from dug_ray.stages.graph import katz_centrality

    triples = ray.data.from_arrow(pa.table({
        "subj": ["a", "a", "b"],
        "pred": ["p", "p", "p"],
        "obj": ["b", "c", "c"]}))
    out = katz_centrality(triples).to_pandas()
    got = dict(zip(out["node"], out["katz_mass"]))
    assert got == {"a": 0, "b": 250_000_000, "c": 562_500_000}


def test_katz_empty_graph():
    from dug_ray.stages.graph import katz_centrality

    triples = ray.data.from_arrow(pa.table({
        "subj": pa.array([], pa.string()),
        "pred": pa.array([], pa.string()),
        "obj": pa.array([], pa.string())}))
    ds = katz_centrality(triples)
    assert ds.count() == 0
    assert ds.schema().names == ["node", "katz_mass"]
