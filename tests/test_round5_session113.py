"""Round-5 session-113: leave-one-out slope, interrupted TS, Theil
decomposition — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_leave_one_out_slope_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s113lo_")
    pd.DataFrame({"c_custkey": [1, 2, 3],
                  "c_nationkey": [0, 1, 2]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    # points (count, revenue$): n0 (1,1), n1 (2,2), n2 (3,6)
    pd.DataFrame({
        "o_custkey": [1, 2, 2, 3, 3, 3],
        "o_totalprice": [1.00, 1.00, 1.00, 2.00, 2.00, 2.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["leave_one_out_slope"](d).to_pandas() \
        .set_index("nation")
    # full slope 2500; LOO slopes 4000 / 2500 / 1000
    assert (int(out.loc[0, "slope_loo_milli"]),
            int(out.loc[0, "delta_milli"])) == (4000, 1500)
    assert (int(out.loc[1, "slope_loo_milli"]),
            int(out.loc[1, "delta_milli"])) == (2500, 0)
    assert (int(out.loc[2, "slope_loo_milli"]),
            int(out.loc[2, "delta_milli"])) == (1000, -1500)


def test_interrupted_ts_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s113it_")
    base = pd.Timestamp("1970-01-01")
    vals = [1.00, 2.00, 10.00, 20.00]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(4)]
        ).astype("datetime64[us]"),
        "o_totalprice": vals,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["interrupted_ts"](d).to_pandas().iloc[0]
    # seg1 (1,1000),(2,2000): slope 1000, ic 0
    # seg2 (3,10000),(4,20000): slope 10000, ic -20000
    # jump at x=3: (-20000+30000) - 3000 = 7000
    assert (int(out["n_days"]), int(out["m"])) == (4, 2)
    assert (int(out["slope1_milli"]), int(out["slope2_milli"]),
            int(out["jump_milli"])) == (1000, 10_000, 7000)


def test_theil_decomposition_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s113td_")
    base = pd.Timestamp("1970-01-01")
    vals = [1.00, 2.00, 4.00]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(3)]
        ).astype("datetime64[us]"),
        "o_totalprice": vals,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["theil_decomposition"](d).to_pandas().iloc[0]
    # e = [1,2]: um = 9e6 // 10 = 900000
    # sd_f = 0.5, sd_a = 1.0, mse = 2.5 -> us = 100000; uc = 0
    assert (int(out["n"]), int(out["um_ppm"]), int(out["us_ppm"]),
            int(out["uc_ppm"])) == (2, 900_000, 100_000, 0)
