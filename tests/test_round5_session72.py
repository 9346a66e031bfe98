"""Round-5 session-72: Siegel repeated medians, Cramer-von Mises
two-sample, integer Haar lifting — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def _mini_buckets(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s72bk_")
    base = pd.Timestamp("2024-01-01")
    dates = pd.Series([base + pd.Timedelta(days=30 * i)
                       for i in range(4)]).astype("datetime64[us]")
    pd.DataFrame({
        "o_orderdate": dates,
        "o_totalprice": [1.00, 2.00, 4.00, 3.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_siegel_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["siegel_slope"](_mini_buckets()).to_pandas().iloc[0]
    # y = [100,200,400,300]: per-i lower medians
    # [100000, 100000, 150000, 50000] -> lower median 100000
    assert int(out["n_buckets"]) == 4
    assert int(out["slope_milli"]) == 100_000
    assert int(out["min_med_milli"]) == 50_000
    assert int(out["max_med_milli"]) == 150_000


def _mini_week(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s72wk_")
    # 2024-01-01 Mon, 01-02 Tue (weekdays); 01-06 Sat, 01-07 Sun
    dates = pd.to_datetime(["2024-01-01", "2024-01-02",
                            "2024-01-06", "2024-01-07"]) \
        .astype("datetime64[us]")
    pd.DataFrame({
        "o_orderdate": dates,
        "o_totalprice": [1.00, 3.00, 2.00, 4.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_cvm_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["cvm_twosample"](_mini_week()).to_pandas().iloc[0]
    # pooled [100wd, 200we, 300wd, 400we]: d = [2,0,2,0], T_num = 8
    assert (int(out["n_weekday"]), int(out["n_weekend"])) == (2, 2)
    assert int(out["t_nano"]) == 125_000_000   # 8e9 // 64


def _mini_haar(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s72hr_")
    base = pd.Timestamp("2024-01-01")
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(16)]
        ).astype("datetime64[us]"),
        "o_totalprice": [float(i) for i in range(1, 17)],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_haar_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["haar_coeffs"](_mini_haar()).to_pandas()
    m = {(int(r["level"]), int(r["idx"]), r["kind"]): int(r["coeff"])
         for _, r in out.iterrows()}
    # ramp 100..1600: every level-0 detail -100, level-1 -200, etc.
    assert all(m[(0, i, "d")] == -100 for i in range(8))
    assert all(m[(1, i, "d")] == -200 for i in range(4))
    assert all(m[(2, i, "d")] == -400 for i in range(2))
    assert m[(3, 0, "d")] == -800
    assert m[(4, 0, "s")] == 850
    assert len(out) == 16
