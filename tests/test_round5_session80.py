"""Round-5 session-80: price-quantum GCD, Tukey-Kramer HSD, DDSketch
quantile eval — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def _mini_lineitem(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s80pq_")
    pd.DataFrame({
        "l_extendedprice": [5.00, 10.00, 2.50, 3.75],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    _cache["dir"] = d
    return d


def test_price_quantum_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["price_quantum"](_mini_lineitem()).to_pandas().iloc[0]
    # cents [500, 1000, 250, 375] -> gcd 125
    assert (int(out["n"]), int(out["gcd_cents"])) == (4, 125)
    assert (int(out["div5"]), int(out["div25"]), int(out["div50"]),
            int(out["div100"])) == (4, 4, 3, 2)


def _mini_tukey(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s80tk_")
    pd.DataFrame({
        "c_custkey": [1, 2],
        "c_nationkey": [0, 1],
    }).to_parquet(os.path.join(d, "customer.parquet"))
    pd.DataFrame({
        "o_custkey": [1, 1, 2, 2],
        "o_totalprice": [10.00, 20.00, 30.00, 50.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_tukey_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["tukey_hsd"](_mini_tukey()).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # nation0 v=[10,20], nation1 v=[30,50]: SSW = 50 + 200, df = 2
    # msw_milli = (1000*3900 - (450000 + 3200000)) // 2 = 125000
    # diff = |15000 - 40000| = 25000
    # se2 = (125000*4) // 8 = 62500; thr = floor(5.25*sqrt(62.5e6))
    thr = math.floor(5.25 * math.sqrt(62_500_000))
    assert (int(r["nation_a"]), int(r["nation_b"]), int(r["n_a"]),
            int(r["n_b"])) == (0, 1, 2, 2)
    assert int(r["diff_milli"]) == 25_000
    assert int(r["thr_milli"]) == thr
    assert int(r["significant"]) == (1 if 25_000 > thr else 0)


def _mini_dd(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s80dd_")
    pd.DataFrame({
        "o_totalprice": [1.00, 1.00, 1.02, 100.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_dd_sketch_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["dd_sketch"](_mini_dd()).to_pandas().set_index("q")
    # cents [100,100,102,10000]; buckets: 100->232, 102->233, 10000->465
    # q50: cum(232)=2, 100*2 >= 50*4 -> bucket 232, exact 100
    assert int(out.loc[50, "bucket"]) == 232
    assert int(out.loc[50, "exact_cents"]) == 100
    assert int(out.loc[50, "est_cents"]) == math.floor(1.02 ** 233)
    # q90: needs cum >= 3.6 -> bucket 465, exact 10000
    assert int(out.loc[90, "bucket"]) == 465
    assert int(out.loc[90, "exact_cents"]) == 10_000
    est = math.floor(1.02 ** 466)
    assert int(out.loc[90, "est_cents"]) == est
    assert int(out.loc[90, "relerr_ppm"]) == \
        (1_000_000 * abs(est - 10_000)) // 10_000
    # DDSketch guarantee: estimate within ~2% of exact at every q
    assert (out["relerr_ppm"] <= 21_000).all()
