"""Round-5 session-82: Durbin-Watson, PACF lag-2, Christoffersen
breach-independence — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def _days(prices, prefix, _cache={}):
    key = (prefix, tuple(prices))
    if key in _cache:
        return _cache[key]
    d = tempfile.mkdtemp(prefix=prefix)
    base = pd.Timestamp("2024-01-01")
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(len(prices))]
        ).astype("datetime64[us]"),
        "o_totalprice": prices,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache[key] = d
    return d


def test_durbin_watson_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["durbin_watson"](
        _days([1.00, 2.00, 6.00], "s82dw_")).to_pandas().iloc[0]
    # cents [100,200,600]: sum d^2 = 100^2 + 400^2 = 170000
    # dw = (1000*3*170000) // (3*410000 - 810000) = 510e6 // 420000
    assert (int(out["n_days"]), int(out["dw_milli"])) == (3, 1214)


def test_pacf_lag2_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["pacf_lag2"](
        _days([1.00, 2.00, 3.00], "s82pf_")).to_pandas().iloc[0]
    # x=[1,2,3]: K0=18, K1=0, K2=-9 -> r1m=0, r2m=trunc(-9000/18)=-500
    # phi22 = trunc(1000*(-500000)/1000000) = -500
    assert (int(out["n_days"]), int(out["r1_milli"]),
            int(out["r2_milli"]), int(out["phi22_milli"])) \
        == (3, 0, -500, -500)


def test_var_breaches_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["var_breaches"](
        _days([1.00, 9.00, 1.00, 8.00, 1.00], "s82vb_")) \
        .to_pandas().iloc[0]
    # daily cents [100,900,100,800,100]; 20th pct threshold = 100
    # breaches [1,0,1,0,1]: n01=2, n10=2, n00=n11=0
    assert (int(out["n00"]), int(out["n01"]), int(out["n10"]),
            int(out["n11"])) == (0, 2, 2, 0)
    assert int(out["threshold_cents"]) == 100
    # ll1 = 0 (all conditional probs are 1); ll0 = 4*ln(1/2)
    exp = math.floor(1_000_000 * (2.0 * (
        (0.0 + 2 * math.log(2 / 4) * 0 + 0.0 + 0.0)
        - (2 * math.log(2 / 4) + 2 * math.log(2 / 4)))))
    assert int(out["lr_micro"]) == exp
    # lr = 2 * (0 - 4*ln(1/2)) = 8*ln(2)
    assert abs(int(out["lr_micro"])
               - math.floor(1_000_000 * 8 * math.log(2))) <= 1
