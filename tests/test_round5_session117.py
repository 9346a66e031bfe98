"""Round-5 session-117: frequency-severity, prequential MAE, Sortino
— hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_freq_severity_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s117fs_")
    base = pd.Timestamp("1970-01-01")
    rows = [(0, 1.00), (0, 3.00), (1, 2.00)]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=r[0]) for r in rows]
        ).astype("datetime64[us]"),
        "o_totalprice": [r[1] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["freq_severity"](d).to_pandas().iloc[0]
    # N=[2,1]: mean 1500, var 250; X=[1,3,2]: mean 2000, var 666
    # c1 = 999, c2 = 1000; S=[4,2]: var_s = 1000
    assert (int(out["n_days"]), int(out["n_orders"])) == (2, 3)
    assert int(out["freq_share_ppm"]) == (1_000_000 * 999) // 1999
    assert int(out["compound_ratio_ppm"]) == \
        (1_000_000 * 1999) // 1_000_000


def test_prequential_mae_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s117pm_")
    base = pd.Timestamp("1970-01-01")
    vals = [1.00, 2.00, 4.00]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(3)]
        ).astype("datetime64[us]"),
        "o_totalprice": vals,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["prequential_mae"](d).to_pandas().iloc[0]
    # preds: 1 then 3//2=1 -> errors 1,3; naive errors 1,2
    assert (int(out["n_days"]), int(out["mae_runmean"]),
            int(out["mae_naive"])) == (3, 4, 3)
    assert int(out["ratio_milli"]) == 1333


def test_sortino_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s117sr_")
    base = pd.Timestamp("1970-01-01")
    vals = [1.00, 2.00, 0.00 + 0.01, 3.00]
    # use 0.01 to keep a positive price; dollars floor -> 0
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(4)]
        ).astype("datetime64[us]"),
        "o_totalprice": vals,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["sortino_ratio"](d).to_pandas().iloc[0]
    # y=[1,2,0,3]: d=[1,-2,3]; mean = 666; dd2 = 4
    dev = math.floor(math.sqrt((1_000_000 * 4) // 3))
    assert (int(out["n_changes"]), int(out["mean_milli"]),
            int(out["down_dev_milli"])) == (3, 666, dev)
    assert int(out["sortino_milli"]) == (1000 * 666) // dev
