"""Round-5 session-66: log-rank two-cohort survival test, Matthews
correlation, Brown-Forsythe variance homogeneity — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def _mini_events(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s66ev_")
    # user -> (first day, last day); m = 10, death = l < 8
    spans = {0: (0, 5), 1: (0, 3), 2: (0, 8), 3: (0, 9), 4: (0, 10),
             5: (0, 2)}
    base = pd.Timestamp("2024-01-01")
    rows = [(u, base + pd.Timedelta(days=dd))
            for u, (f, l) in spans.items() for dd in (f, l)]
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.Series([r[1] for r in rows]).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "events.parquet"))
    _cache["dir"] = d
    return d


def test_logrank_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["logrank_test"](_mini_events()).to_pandas().iloc[0]
    # deaths: u5 t=2 (g1), u1 t=3 (g1), u0 t=5 (g0); cens: u2/u3/u4
    # t=2: e1 += 1e6*3//6 = 500000, v += 45e6//180 = 250000
    # t=3: e1 += 1e6*3//5 = 600000, v += 24e6//100 = 240000
    # t=5: o1 = 1, e1 += 1e6*3//4 = 750000, v += 9e6//48 = 187500
    assert (int(out["users_g0"]), int(out["users_g1"])) == (3, 3)
    assert int(out["obs_g0"]) == 1
    assert int(out["exp_g0_micro"]) == 1_850_000
    assert int(out["var_micro"]) == 677_500
    # chi2 = 1000 * 850000^2 // (1e6 * 677500) = 1066
    assert int(out["chi2_milli"]) == 1066


def _mini_orders(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s66or_")
    pd.DataFrame({
        "o_totalprice": [300000.0, 300000.0, 100000.0, 100000.0,
                         260000.0],
        "o_orderstatus": ["F", "O", "F", "O", "F"],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_matthews_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["matthews_corr"](_mini_orders()).to_pandas().iloc[0]
    # pred = price >= 250000: tp=2 fp=1 fn=1 tn=1
    assert (int(out["tp"]), int(out["fp"]), int(out["fn"]),
            int(out["tn"])) == (2, 1, 1, 1)
    # num = 2*1 - 1*1 = 1; den = 3*3*2*2 = 36; 1000*1//36 = 27
    assert int(out["mcc_sq_milli"]) == 27


def _mini_lineitem(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s66li_")
    pd.DataFrame({
        "l_returnflag": ["A", "A", "A", "A", "B", "B", "B"],
        "l_quantity": [1.0, 3.0, 5.0, 7.0, 10.0, 10.0, 20.0],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    _cache["dir"] = d
    return d


def test_brown_forsythe_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["brown_forsythe"](_mini_lineitem()).to_pandas()
    m = {r["flag"]: (int(r["n"]), int(r["med2"]), int(r["s_z2"]),
                     int(r["ss_z2"]), int(r["w_milli"]))
         for _, r in out.iterrows()}
    # A: q=[1,3,5,7] med2=3+5=8, z2=[6,2,2,6] S=16 SS=80
    # B: q=[10,10,20] med2=20, z2=[0,0,20] S=20 SS=400
    # sg2f = 64e6 + 133333333 = 197333333
    # ssb = 197333333 - 1296e6//7(=185142857) = 12190476
    # ssw = 480e6 - 197333333 = 282666667
    # w = 5000*12190476 // 282666667 = 215
    assert m["A"] == (4, 8, 16, 80, 215)
    assert m["B"] == (3, 20, 20, 400, 215)
