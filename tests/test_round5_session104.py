"""Round-5 session-104: Bland-Altman, Taguchi loss, overlap
coefficient — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_bland_altman_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s104ba_")
    pd.DataFrame({
        "o_orderkey": [1, 2],
        "o_totalprice": [10.00, 20.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    pd.DataFrame({
        "l_orderkey": [1, 2],
        "l_extendedprice": [10.00, 15.00],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["bland_altman"](d).to_pandas().iloc[0]
    # diffs [0, 5]: mean 2500 milli, var_milli 12500
    sd = math.floor(math.sqrt(12_500_000.0))
    assert (int(out["n_orders"]), int(out["mean_milli"]),
            int(out["sd_milli"]), int(out["outside_ppm"])) \
        == (2, 2500, sd, 0)


def test_taguchi_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s104tg_")
    pd.DataFrame({"l_quantity": [20.0, 25.0, 30.0]}).to_parquet(
        os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["taguchi_loss"](d).to_pandas().iloc[0]
    # S=75 SS=1925: loss = 1000*50//3 = 16666; pop var same;
    # bias = 0 (on target)
    assert (int(out["n"]), int(out["loss_milli"]),
            int(out["var_milli"]), int(out["bias2_milli"])) \
        == (3, 16_666, 16_666, 0)


def test_overlap_coefficient_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s104ov_")
    rows = [("1994-05-01", 10.00), ("1994-06-01", 20.00),
            ("1995-05-01", 10.00), ("1995-06-01", 30.00)]
    pd.DataFrame({
        "o_orderdate": pd.Series([pd.Timestamp(r[0]) for r in rows]
                                 ).astype("datetime64[us]"),
        "o_totalprice": [r[1] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["overlap_coefficient"](d).to_pandas().iloc[0]
    # shared mass: only the $10 bin -> OVL = 1/2
    assert (int(out["n_y0"]), int(out["n_y1"]),
            int(out["ovl_ppm"])) == (2, 2, 500_000)
