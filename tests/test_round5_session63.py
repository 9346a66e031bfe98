"""Round-5 session-63: Ljung-Box portmanteau, Count-Sketch estimator
eval, Gumbel block-maxima fit — hand-computed pins."""

from __future__ import annotations

import hashlib
import math
import os
import tempfile

import numpy as np
import pandas as pd


def _mini_orders(_cache={}):
    """4 observed days with counts [1, 2, 1, 2]."""
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s63_")
    days = (["1995-01-01"] + ["1995-01-02"] * 2 + ["1995-01-03"]
            + ["1995-01-04"] * 2)
    pd.DataFrame({
        "o_orderkey": range(1, 7),
        "o_orderdate": pd.to_datetime(days).astype("datetime64[us]"),
        "o_totalprice": [10.0] * 6,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_ljung_box_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["ljung_box"](_mini_orders()).to_pandas() \
        .sort_values("lag").reset_index(drop=True)
    # z = [-2, 2, -2, 2], g0 = 16; gamma = [-12, 8, -4, 0, 0, 0, 0]
    assert list(out["lag"]) == [1, 2, 3, 4, 5, 6, 7]
    assert list(out["gamma_n2"]) == [-12, 8, -4, 0, 0, 0, 0]
    assert list(out["term_micro"]) == [4_500_000, 3_000_000, 1_500_000,
                                       0, 0, 0, 0]
    assert out["q_micro"].nunique() == 1
    assert int(out["q_micro"].iloc[0]) == 9_000_000


def _mini_lineitem(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s63cs_")
    pd.DataFrame({
        "l_suppkey": [1, 1, 1, 2, 2, 3],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    _cache["dir"] = d
    return d


def test_count_sketch_hand_replay():
    import dug_ray.queries as q
    out = q.QUERIES["count_sketch"](_mini_lineitem()).to_pandas()
    true = {1: 3, 2: 2, 3: 1}
    regs = np.zeros((5, 128), dtype=np.int64)

    def hv(r, k):
        return int(hashlib.md5(f"cs{r}:{k}".encode()).hexdigest()[:15],
                   16)

    for k, n in true.items():
        for r in range(5):
            h = hv(r, k)
            regs[r, h % 128] += (1 - 2 * ((h // 128) % 2)) * n
    got = {int(r["suppkey"]): (int(r["true_n"]), int(r["est_median"]))
           for _, r in out.iterrows()}
    assert len(got) == 3
    for k, n in true.items():
        ests = sorted((1 - 2 * ((hv(r, k) // 128) % 2))
                      * int(regs[r, hv(r, k) % 128]) for r in range(5))
        assert got[k] == (n, ests[2])
    # with only 3 keys in 128 columns collisions are rare; the median
    # estimate should be exact for at least two of the three keys
    exact = sum(1 for k, (n, e) in got.items() if e == n)
    assert exact >= 2


def _mini_bm(_cache={}):
    """Two blocks: Jan-1995 daily revenues [100, 200], Feb-1995 [300]."""
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s63bm_")
    pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_orderdate": pd.to_datetime(
            ["1995-01-01", "1995-01-02", "1995-02-01"])
        .astype("datetime64[us]"),
        "o_totalprice": [100.0, 200.0, 300.0],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_block_maxima_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["block_maxima"](_mini_bm()).to_pandas().iloc[0]
    # maxima [200, 300]: n=2, S=500, q=130000, m2 = 2*130000 - 250000
    assert int(out["n_blocks"]) == 2
    assert int(out["sum_dollars"]) == 500
    assert int(out["m2_num"]) == 10_000
    beta = math.sqrt(10_000.0) / 2 * math.sqrt(6.0) / math.pi
    mu = 500.0 / 2 - 0.5772156649015329 * beta
    rl = mu - beta * math.log(-math.log(0.99))
    assert int(out["beta_fl"]) == math.floor(beta)
    assert int(out["mu_fl"]) == math.floor(mu)
    assert int(out["rl99_fl"]) == math.floor(rl)
