"""Round-5 session-85: EOQ plan, Cliff's delta, Cpk capability —
hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_eoq_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s85eq_")
    pd.DataFrame({"p_partkey": [1], "p_brand": ["B1"]}).to_parquet(
        os.path.join(d, "part.parquet"))
    pd.DataFrame({"l_partkey": [1, 1], "l_quantity": [10.0, 10.0]}) \
        .to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["eoq_plan"](d).to_pandas().iloc[0]
    # D=20 -> eoq = floor(sqrt(1000)) = 31; ceil(20/31) = 1
    assert (out["brand"], int(out["demand"]), int(out["eoq"]),
            int(out["orders_per_cycle"])) == ("B1", 20, 31, 1)
    assert int(out["eoq"]) == math.floor(math.sqrt(1000.0))


def test_cliffs_delta_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s85cd_")
    pd.DataFrame({
        "o_orderstatus": ["F", "F", "O", "O", "P"],
        "o_totalprice": [10.00, 20.00, 10.00, 30.00, 99.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["cliffs_delta"](d).to_pandas().iloc[0]
    # F=[10,20], O=[10,30]: greater = 1 (20>10), less = 2
    # (10<30, 20<30); delta = -1e6 // 4 -> trunc(-250000)
    assert (int(out["n_f"]), int(out["n_o"]),
            int(out["delta_micro"])) == (2, 2, -250_000)


def test_cpk_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s85ck_")
    pd.DataFrame({"l_quantity": [10.0, 20.0, 30.0]}).to_parquet(
        os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["cpk_quantity"](d).to_pandas().iloc[0]
    # n=3 S=60 SS=1400: var_milli = 1000*600//6 = 100000
    # sigma = floor(sqrt(1e8)) = 10000; m = min(25000, 15000)
    # cpk = 15_000_000 // 30000 = 500
    assert (int(out["n"]), int(out["mean_milli"]),
            int(out["sigma_milli"]), int(out["cpk_milli"])) \
        == (3, 20_000, 10_000, 500)
