"""Round-5 session-140: Kish neff, FE discount slope, perfect-order
rate — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_kish_neff_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s140kn_")
    pd.DataFrame({
        "o_custkey": [1, 2],
        "o_totalprice": [1.00, 3.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["kish_neff"](d).to_pandas().iloc[0]
    # weights [1, 3]: neff = 1000*16//10 = 1600; deff = 1250
    assert (int(out["n_customers"]), int(out["neff_milli"]),
            int(out["deff_milli"])) == (2, 1600, 1250)


def test_fe_discount_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s140fe_")
    pd.DataFrame({"o_orderkey": [1, 2],
                  "o_custkey": [1, 2]}).to_parquet(
        os.path.join(d, "orders.parquet"))
    pd.DataFrame({
        "l_orderkey": [1, 1, 2, 2],
        "l_discount": [0.00, 0.10, 0.00, 0.10],
        "l_quantity": [10.0, 20.0, 30.0, 40.0],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["fe_discount_response"](d).to_pandas().iloc[0]
    # within both customers slope 0.1 qty/milli -> 100000 micro
    assert int(out["n_customers"]) == 2
    assert int(out["fe_slope_micro"]) == 100_000
    assert int(out["pooled_slope_micro"]) == 100_000


def test_perfect_order_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s140po_")
    base = pd.Timestamp("1994-01-01")
    pd.DataFrame({
        "o_orderkey": [1],
        "o_orderdate": pd.Series([base]).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "orders.parquet"))
    pd.DataFrame({
        "l_orderkey": [1, 1, 1],
        "l_shipdate": pd.Series(
            [base + pd.Timedelta(days=3), base + pd.Timedelta(days=20),
             base + pd.Timedelta(days=2)]).astype("datetime64[us]"),
        "l_returnflag": ["N", "N", "R"],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["perfect_order_rate"](d).to_pandas().iloc[0]
    # only line 1 ships fast AND unreturned
    assert (int(out["n_lines"]), int(out["n_perfect"]),
            int(out["perfect_ppm"])) == (3, 1, 333_333)
