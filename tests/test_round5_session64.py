"""Round-5 session-64: McNemar paired test, Cochran's Q, negative-
binomial method-of-moments fit — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def _mini(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s64_")
    # y = F?: [1, 1, 0, 0]; A = price>150k: [1, 0, 1, 0];
    # B = prio urgent/high: [1, 1, 0, 0]
    pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4],
        "o_custkey": [1, 1, 1, 2],
        "o_orderstatus": ["F", "F", "O", "O"],
        "o_totalprice": [200000.0, 100.0, 200000.0, 100.0],
        "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_mcnemar_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["mcnemar_test"](_mini()).to_pandas().iloc[0]
    # a_ok = A==y: [1,0,0,1]; b_ok = B==y: [1,1,1,1]
    # both=2, only_a=0, only_b=2, neither=0
    assert (int(out["both_ok"]), int(out["only_a"]),
            int(out["only_b"]), int(out["neither"])) == (2, 0, 2, 0)
    # chi2 = (|0-2|-1)^2/(0+2) = 1/2 -> 500000 micro
    assert int(out["chi2_micro"]) == 500_000


def test_cochran_q_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["cochran_q"](_mini()).to_pandas().iloc[0]
    # t0=[1,1,0,0], t1=[1,0,1,0] (>100k), t2=[1,1,0,0]
    # G = [2, 2, 2]; L = [3, 2, 1, 0]; sl2 = 9+4+1 = 14
    assert (int(out["g0"]), int(out["g1"]), int(out["g2"])) == (2, 2, 2)
    assert int(out["sl2"]) == 14
    # num = 2*(3*12 - 36) = 0; den = 18-14 = 4 -> Q = 0
    assert int(out["q_micro"]) == 0


def test_negbin_fit_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["negbin_fit"](_mini()).to_pandas().iloc[0]
    # counts per cust: [3, 1]: n=2, S=4, Q=10
    assert (int(out["n_cust"]), int(out["sum_x"]),
            int(out["sum_x2"])) == (2, 4, 10)
    # mean = 2 -> 2e6; var_num = 20-16 = 4 -> var = 1 -> 1e6
    assert int(out["mean_micro"]) == 2_000_000
    assert int(out["var_micro"]) == 1_000_000
    # v <= m -> not overdispersed, sentinels
    assert int(out["overdispersed"]) == 0
    assert int(out["p_micro"]) == 0 and int(out["r_micro"]) == 0


def test_negbin_overdispersed_branch():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s64nb_")
    # counts [5, 1]: n=2, S=6, Q=26; var_num = 52-36 = 16 (v=4 > m=3)
    pd.DataFrame({
        "o_custkey": [1] * 5 + [2],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["negbin_fit"](d).to_pandas().iloc[0]
    assert int(out["overdispersed"]) == 1
    # p = m/v = 3/4 -> 750000; r = m^2/(v-m) = 9 -> 9e6
    assert int(out["p_micro"]) == 750_000
    assert int(out["r_micro"]) == 9_000_000
