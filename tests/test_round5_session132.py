"""Round-5 session-132: SSD check, Pickands xi, bimodality —
hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_ssd_check_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s132sd_")
    pd.DataFrame({
        "o_orderstatus": ["F", "F", "O", "O"],
        "o_totalprice": [10.00, 20.00, 10.00, 30.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["ssd_check"](d).to_pandas().iloc[0]
    # I(20)=0, I(30)=20 > 0 -> O dominates (verdict 1), no flips
    assert (int(out["n_f"]), int(out["n_o"]), int(out["verdict"]),
            int(out["n_sign_changes"])) == (2, 2, 1, 0)


def test_pickands_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s132pk_")
    pd.DataFrame({
        "o_totalprice": [float(i) for i in range(1, 41)],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["pickands_xi"](d).to_pandas().iloc[0]
    # n=40, k=2: x_2=39, x_4=37, x_8=33
    assert (int(out["n"]), int(out["k"]), int(out["x_k"]),
            int(out["x_2k"]), int(out["x_4k"])) == (40, 2, 39, 37, 33)
    exp = math.floor(1000 * math.log(2 / 4) / math.log(2))
    assert int(out["xi_milli"]) == exp == -1000


def test_bimodality_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s132bc_")
    pd.DataFrame({"o_totalprice": [1.00, 2.00, 3.00]}).to_parquet(
        os.path.join(d, "orders.parquet"))
    out = q.QUERIES["bimodality_coeff"](d).to_pandas().iloc[0]
    # d=[-1,0,1]: skew2=0, kurt=1.5 -> bc = 1000*2e6//1.5e6 = 666
    assert (int(out["n"]), int(out["bc_milli"]),
            int(out["bimodal_suspect"])) == (3, 666, 1)
