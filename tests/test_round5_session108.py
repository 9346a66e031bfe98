"""Round-5 session-108: Jarque-Bera, eta-squared, Bowley skew —
hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_jarque_bera_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s108jb_")
    pd.DataFrame({"o_totalprice": [1.00, 2.00, 3.00]}).to_parquet(
        os.path.join(d, "orders.parquet"))
    out = q.QUERIES["jarque_bera"](d).to_pandas().iloc[0]
    # d = [-1, 0, 1]: A2=2, A3=0, A4=2
    # s2 = 0; kurt = 3*(2/2)/2 = 1.5; jb = 1e6*0.5*(1.5-3)^2/4
    assert int(out["n"]) == 3
    assert int(out["skew2_micro"]) == 0
    assert int(out["kurt_micro"]) == 1_500_000
    assert int(out["jb_micro"]) == 281_250


def test_eta_squared_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s108es_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    pd.DataFrame({
        "o_custkey": [1, 1, 2, 2],
        "o_totalprice": [10.00, 20.00, 30.00, 50.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["eta_squared"](d).to_pandas().iloc[0]
    # SSB = 625e6 micro, SST = 875e6 micro -> 625/875 = 0.714285
    assert (int(out["n"]), int(out["k_nations"])) == (4, 2)
    assert int(out["eta2_ppm"]) == (1_000_000 * 625_000_000) \
        // 875_000_000


def test_bowley_skew_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s108bs_")
    pd.DataFrame({"o_totalprice": [1.00, 2.00, 10.00]}).to_parquet(
        os.path.join(d, "orders.parquet"))
    out = q.QUERIES["bowley_skew"](d).to_pandas().iloc[0]
    # quartiles 1/2/10: bowley = 1000*(1+10-4)//9 = 777
    assert (int(out["q1"]), int(out["q2"]), int(out["q3"])) \
        == (1, 2, 10)
    assert int(out["bowley_milli"]) == 777
