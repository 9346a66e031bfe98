"""Round-5 session-103: split-half reliability, Deming regression,
Chao shared richness — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_split_half_reliability_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s103sh_")
    pd.DataFrame({"n_nationkey": [0, 1],
                  "n_name": ["A", "B"]}).to_parquet(
        os.path.join(d, "nation.parquet"))
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    # md5 parity: keys 1,3 -> half 0; keys 2,4 -> half 1
    pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4],
        "o_custkey": [1, 1, 2, 2],
        "o_totalprice": [10.00, 10.00, 1.00, 1.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["split_half_reliability"](d).to_pandas().iloc[0]
    # both halves rank nation0 first -> rho = sb = 1e6
    assert (int(out["n_nations"]), int(out["rho_ppm"]),
            int(out["sb_ppm"])) == (2, 1_000_000, 1_000_000)


def test_deming_slope_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s103dm_")
    pd.DataFrame({
        "o_orderkey": [1, 2],
        "o_totalprice": [10.00, 20.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    pd.DataFrame({
        "l_orderkey": [1, 1, 2],
        "l_extendedprice": [4.00, 6.00, 15.00],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["deming_slope"](d).to_pandas().iloc[0]
    # vx=100, vy=25, cxy=50: deming = (-75 + sqrt(15625)) / 100
    # = 0.5 exactly; OLS = 1000*50//100 = 500
    assert (int(out["n_orders"]), int(out["deming_slope_milli"]),
            int(out["ols_slope_milli"])) == (2, 500, 500)


def test_chao_shared_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s103cs_")
    df = pd.DataFrame({
        "doc_id": [1, 2],
        "lang": ["en", "fr"],
        "text": ["a b b c", "a b d d d d d"],
        "source": ["s", "s"],
    })
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(os.path.join(d, "documents.parquet"))
    out = q.QUERIES["chao_shared"](d).to_pandas().iloc[0]
    # en: a1 b2 c1; fr: a1 b1 d5; shared {a,b}: D12=2
    # f1p = {a} -> 1; fp1 = {a,b} -> 2; f11 = {a} -> 1
    # s_est = 2 + (1*2)//2 = 3
    assert (int(out["d12"]), int(out["f1p"]), int(out["fp1"]),
            int(out["f11"]), int(out["s_est"])) == (2, 1, 2, 1, 3)
