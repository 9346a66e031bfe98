"""Round-5 session-79: Qini uplift deciles, split-conformal interval,
price-ending census — hand-computed pins.

md5 parities (hashlib, first 8 hex chars as int):
  custkey % 2: 1->0, 2->1, 3->0, 4->1
  orderkey % 3: 3,6 -> 0 (train); 1,8,12,13,15,21,23,24,25,27 -> 1
  (calibration); 2,4 -> 2 (test)
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def _mini_uplift(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s79qn_")
    pd.DataFrame({
        "c_custkey": [1, 2, 3, 4],
        "c_acctbal": [40.00, 30.00, 20.00, 10.00],
    }).to_parquet(os.path.join(d, "customer.parquet"))
    pd.DataFrame({
        "o_custkey": [1, 2, 3, 4],
        "o_totalprice": [1.00, 5.00, 2.00, 8.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_qini_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["qini_auc"](_mini_uplift()).to_pandas() \
        .set_index("decile")
    # score desc: c1(t=0,y=100) c2(t=1,500) c3(t=0,200) c4(t=1,800)
    # d1,d2 -> k=1: all-control head, qini = 0
    assert (int(out.loc[1, "k"]), int(out.loc[1, "qini_cents"])) == (1, 0)
    # d3-d5 -> k=2: y_t=500 y_c=100 n_t=n_c=1 -> 400
    assert (int(out.loc[4, "k"]), int(out.loc[4, "qini_cents"])) == (2, 400)
    # d6,d7 -> k=3: 500 - (300*1)//2 = 350
    assert (int(out.loc[6, "k"]), int(out.loc[6, "qini_cents"])) == (3, 350)
    # d8-d10 -> k=4: 1300 - 300 = 1000
    row = out.loc[10]
    assert (int(row["k"]), int(row["n_t"]), int(row["n_c"]),
            int(row["y_t_cents"]), int(row["y_c_cents"]),
            int(row["qini_cents"])) == (4, 2, 2, 1300, 300, 1000)


def _mini_conformal(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s79cf_")
    # train (3, 6): 10.00, 20.00 -> pred = 1500 cents
    # cal (10 keys): 15.00..24.00 -> residual dollars 0..9
    # test (2, 4): 5.00 (r=10, miss) and 24.99 (r=9, covered)
    cal_keys = [1, 8, 12, 13, 15, 21, 23, 24, 25, 27]
    rows = [(3, 10.00), (6, 20.00), (2, 5.00), (4, 24.99)]
    rows += [(k, 15.00 + i) for i, k in enumerate(cal_keys)]
    df = pd.DataFrame(rows, columns=["o_orderkey", "o_totalprice"])
    df["o_orderpriority"] = "1-URGENT"
    df.to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_conformal_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["conformal_q"](_mini_conformal()).to_pandas().iloc[0]
    # n_cal=10 -> k = ceil(0.9 * 11) = 10 -> radius = max cal r = 9
    assert (int(out["n_cal"]), int(out["k"]),
            int(out["radius_dollars"])) == (10, 10, 9)
    assert (int(out["n_test"]), int(out["n_cov"]),
            int(out["coverage_ppm"])) == (2, 1, 500_000)


def _mini_parts(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s79pe_")
    pd.DataFrame({
        "p_retailprice": [1.99, 2.99, 3.00, 4.50],
    }).to_parquet(os.path.join(d, "part.parquet"))
    _cache["dir"] = d
    return d


def test_price_endings_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["price_endings"](_mini_parts()).to_pandas().iloc[0]
    assert (int(out["n_total"]), int(out["n_00"]), int(out["n_50"]),
            int(out["n_99"])) == (4, 1, 1, 2)
    assert (int(out["top_ending"]), int(out["top_n"])) == (99, 2)
    # num = 2*(100-4)^2 + (200-4)^2 + 97*16 = 18432 + 38416 + 1552
    assert int(out["chi2_micro"]) == (1_000_000 * 58_400) // 400
