"""Round-5 session-134: centroid accuracy, win-back census, status
mix trend — pins and mirrors."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_centroid_accuracy_sanity():
    import dug_ray.queries as q
    out = q.QUERIES["centroid_accuracy"]("/root/testdata/sf0.001") \
        .to_pandas().iloc[0]
    n = int(out["n_sample"])
    assert n > 0
    assert 0 <= int(out["n_correct"]) <= n
    assert int(out["acc_ppm"]) == (1_000_000
                                   * int(out["n_correct"])) // n


def test_winback_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s134wb_")
    base = pd.Timestamp("1970-01-01")
    rows = [(1, 0, 1.00), (1, 100, 3.00), (2, 0, 1.00),
            (2, 10, 1.00)]
    pd.DataFrame({
        "o_custkey": [r[0] for r in rows],
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=r[1]) for r in rows]
        ).astype("datetime64[us]"),
        "o_totalprice": [r[2] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["winback_census"](d).to_pandas().iloc[0]
    # c1: 100-day gap -> winback; pre mean 100000 milli, post 300000
    assert (int(out["n_repeat_custs"]), int(out["n_winback"]),
            int(out["winback_share_ppm"])) == (2, 1, 500_000)
    assert int(out["spend_ratio_milli"]) == 3000


def test_status_mix_trend_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s134sm_")
    rows = [("1994-01-05", "O"), ("1994-01-10", "F"),
            ("1994-02-05", "O"), ("1994-02-10", "O")]
    pd.DataFrame({
        "o_orderdate": pd.Series([pd.Timestamp(r[0]) for r in rows]
                                 ).astype("datetime64[us]"),
        "o_orderstatus": [r[1] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["status_mix_trend"](d).to_pandas().iloc[0]
    # shares 500000 then 1000000 in consecutive months
    assert int(out["k_months"]) == 2
    assert int(out["mean_share_ppm"]) == 750_000
    assert int(out["slope_milli"]) == 500_000_000
