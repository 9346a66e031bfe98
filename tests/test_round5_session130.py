"""Round-5 session-130: rate change, Theil decomposition, regular
buyers — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_rate_change_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s130rc_")
    base = pd.Timestamp("1970-01-01")
    days = [0, 3, 3, 3]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in days]
        ).astype("datetime64[us]"),
        "o_totalprice": [1.00] * 4,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["rate_change"](d).to_pandas().iloc[0]
    # span 0..3, mid 1: d1=2 d2=2, n1=1 n2=3
    assert (int(out["n1"]), int(out["n2"]), int(out["d1"]),
            int(out["d2"])) == (1, 3, 2, 2)
    assert int(out["ratio_milli"]) == 3000
    # chi2 = 1e6*(4-8)^2 // (4*2*2*4) = 250000
    assert int(out["chi2_micro"]) == 250_000


def test_theil_within_between_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s130tw_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    pd.DataFrame({
        "o_custkey": [1, 2],
        "o_totalprice": [1.00, 3.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["theil_within_between"](d).to_pandas().iloc[0]
    s1 = math.floor(1_000_000 * 100 * math.log(200 / 400))
    s2 = math.floor(1_000_000 * 300 * math.log(600 / 400))
    t_total = (s1 + s2) // 400 if s1 + s2 >= 0 else None
    assert int(out["n_customers"]) == 2
    assert int(out["t_total_micro"]) == (s1 + s2) // 400
    # singleton nations: between == total
    assert int(out["t_between_micro"]) == int(out["t_total_micro"])
    assert int(out["between_share_ppm"]) == 1_000_000


def test_regular_buyers_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s130rb_")
    base = pd.Timestamp("1970-01-01")
    rows = [(1, 0), (1, 10), (1, 20), (2, 0), (2, 1), (2, 30)]
    pd.DataFrame({
        "o_custkey": [r[0] for r in rows],
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=r[1]) for r in rows]
        ).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["regular_buyers"](d).to_pandas().iloc[0]
    # c1 gaps [10,10]: cv 0 (regular); c2 gaps [1,29]:
    # cv = floor(1000*sqrt(2*842-900)/30) = floor(1000*28/30) = 933
    assert (int(out["n_custs"]), int(out["n_regular"])) == (2, 1)
    assert int(out["regular_share_ppm"]) == 500_000
    assert int(out["median_cv_milli"]) == 0
