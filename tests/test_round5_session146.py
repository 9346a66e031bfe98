"""Round-5 session-146: interquartile mean, urgency premium, ruin
bound — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_iqm_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s146iq_")
    pd.DataFrame({
        "o_totalprice": [float(i) for i in range(1, 9)],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["interquartile_mean"](d).to_pandas().iloc[0]
    # Q1=2, Q3=6; strict middle {3,4,5}: mean 4000
    assert (int(out["q1"]), int(out["q3"]), int(out["n_mid"])) \
        == (2, 6, 3)
    assert int(out["iqm_milli"]) == 4000


def test_urgency_premium_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s146up_")
    pd.DataFrame({
        "o_orderpriority": ["1-URGENT", "1-URGENT", "5-LOW"],
        "o_totalprice": [3.00, 5.00, 2.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["urgency_premium"](d).to_pandas() \
        .set_index("priority")
    assert int(out.loc["1-URGENT", "mean_milli"]) == 4000
    assert int(out.loc["1-URGENT", "premium_milli"]) == 2000
    assert int(out.loc["5-LOW", "premium_milli"]) == 0


def test_ruin_bound_mirror():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s146rb_")
    base = pd.Timestamp("1970-01-01")
    vals = [10.00, 11.00, 13.00, 16.00]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(4)]
        ).astype("datetime64[us]"),
        "o_totalprice": vals,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["ruin_bound"](d).to_pandas().iloc[0]
    # d=[1,2,3]: sd=6, n=3, var = 6/9; level = 50//4 = 12 -> b=1
    var_f = float(3 * 14 - 36) / 9
    exp = math.floor(1_000_000 * math.exp(-(2.0 * (6 / 3) * 1)
                                          / var_f))
    assert (int(out["n_changes"]), int(out["drift_d"]),
            int(out["buffer_d"])) == (3, 6, 1)
    assert int(out["ruin_ppm"]) == exp
