"""Round-5 session-136: Gini by nation, demand classes, basket
diversity — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_gini_by_nation_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s136gn_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    pd.DataFrame({
        "o_custkey": [1, 1, 2, 2],
        "o_totalprice": [1.00, 1.00, 1.00, 3.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["gini_by_nation"](d).to_pandas() \
        .set_index("nation")
    # nation0 equal values -> 0; nation1 [1,3]: gini = 1/4
    assert int(out.loc[0, "gini_ppm"]) == 0
    assert int(out.loc[1, "gini_ppm"]) == 250_000


def test_demand_classes_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s136dc_")
    rows = [(1, 0, 5.0), (1, 1, 5.0), (1, 2, 5.0),
            (2, 0, 1.0), (2, 10, 9.0)]
    base = pd.Timestamp("1994-01-01")
    pd.DataFrame({
        "l_partkey": [r[0] for r in rows],
        "l_shipdate": pd.Series(
            [base + pd.Timedelta(days=r[1]) for r in rows]
        ).astype("datetime64[us]"),
        "l_quantity": [r[2] for r in rows],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["demand_classes"](d).to_pandas() \
        .set_index("cls")
    # p1: ADI 1000, cv2 0 -> smooth; p2: ADI 10000, cv2 640 -> lumpy
    assert (int(out.loc["smooth", "n_parts"]),
            int(out.loc["smooth", "share_ppm"])) == (1, 500_000)
    assert int(out.loc["lumpy", "n_parts"]) == 1


def test_basket_diversity_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s136bd_")
    pd.DataFrame({"p_partkey": [1, 2],
                  "p_brand": ["B1", "B2"]}).to_parquet(
        os.path.join(d, "part.parquet"))
    pd.DataFrame({
        "l_orderkey": [1, 1, 1, 2],
        "l_partkey": [1, 1, 2, 1],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["basket_diversity"](d).to_pandas().iloc[0]
    # order1: {B1,B2} k=2; order2: {B1} k=1
    assert (int(out["n_orders"]), int(out["mean_milli"]),
            int(out["p90"])) == (2, 1500, 2)
