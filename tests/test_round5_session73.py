"""Round-5 session-73: newsvendor fractile, Horvitz-Thompson PPS
estimator, regression-to-the-mean audit — hand-computed pins."""

from __future__ import annotations

import hashlib
import os
import tempfile

import pandas as pd


def _mini_demand(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s73nv_")
    base = pd.Timestamp("2024-01-01")
    days = [0, 1, 1, 2, 2, 3, 3, 3]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=x) for x in days]
        ).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_newsvendor_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["newsvendor_q"](_mini_demand()).to_pandas().iloc[0]
    # demand levels {1:1, 2:2, 3:1}; F(2) = 3/4 hits the 3/4 fractile
    assert (int(out["n_days"]), int(out["q_opt"])) == (4, 2)
    assert int(out["sum_leftover"]) == 1    # day with demand 1
    assert int(out["sum_shortage"]) == 1    # day with demand 3


def _mini_ht(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s73ht_")
    pd.DataFrame({
        "o_orderkey": list(range(1, 201)),
        "o_totalprice": [1000.0 * (1 + i % 7) for i in range(200)],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_ht_estimator_reference_impl():
    import dug_ray.queries as q
    out = q.QUERIES["ht_estimator"](_mini_ht()).to_pandas().iloc[0]
    # independent reference: hashlib md5 loop
    n_s = 0
    ht = 0
    true_c = 0
    for i in range(1, 201):
        cents = int(round(1000.0 * (1 + (i - 1) % 7) * 100))
        true_c += cents
        thr = min(cents // 64, 2**32 - 1)
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        if 0 < thr and h < thr:
            n_s += 1
            ht += (1000 * cents * 2**32) // thr
    assert int(out["n"]) == 200
    assert int(out["n_sampled"]) == n_s
    assert int(out["true_cents"]) == true_c
    assert int(out["ht_cents"]) == ht // 1000
    assert int(out["ratio_milli"]) == (1000 * (ht // 1000)) // true_c


def _mini_rtm(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s73rtm_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": pd.array([0, 1], dtype="int32")}) \
        .to_parquet(os.path.join(d, "customer.parquet"))
    base = pd.Timestamp("2024-01-01")
    rows = [(1, 0, 3.00), (2, 1, 1.00), (1, 10, 1.00), (2, 9, 5.00)]
    pd.DataFrame({
        "o_custkey": [r[0] for r in rows],
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=r[1]) for r in rows]
        ).astype("datetime64[us]"),
        "o_totalprice": [r[2] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_regression_to_mean_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["regression_to_mean"](_mini_rtm()).to_pandas()
    m = {int(r["nation"]): (int(r["rank1"]), int(r["rank2"]),
                            int(r["drift"]))
         for _, r in out.iterrows()}
    # h1 (days<=5): n0=300 n1=100; h2: n0=100 n1=500
    assert m[0] == (1, 2, 1)
    assert m[1] == (2, 1, -1)
