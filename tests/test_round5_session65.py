"""Round-5 session-65: average precision (PR-AUC), RLE sort-layout
audit, Huber M-location — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def _mini(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s65_")
    # scores (dollars): 40, 30, 20, 10 with y = [1, 0, 1, 0]
    pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4],
        "o_orderstatus": ["F", "O", "F", "O"],
        "o_totalprice": [40.0, 30.0, 20.0, 10.0],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_pr_auc_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["pr_auc"](_mini()).to_pandas().iloc[0]
    assert (int(out["n"]), int(out["pos"]), int(out["n_bins"])) \
        == (4, 2, 4)
    # desc: 40(y=1): prec 1/1, 30(0), 20(y=1): prec 2/3, 10(0)
    # AP = 1/2 * 1 + 1/2 * 2/3; floored per bin:
    # term1 = (1e6*1*1)//(2*1) = 500000; term2 = (1e6*1*2)//(2*3) = 333333
    assert int(out["ap_micro"]) == 833_333


def _mini_li(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s65li_")
    pd.DataFrame({
        "l_returnflag": ["A", "A", "N", "N", "N"],
        "l_linestatus": ["F", "O", "O", "O", "O"],
        "l_shipdate": pd.to_datetime(
            ["1995-01-15", "1995-01-20", "1995-01-01", "1995-02-01",
             "1995-02-10"]).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    _cache["dir"] = d
    return d


def test_rle_layout_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["rle_layout"](_mini_li()).to_pandas()
    m = {r["col"]: (int(r["n_runs"]), int(r["plain_bytes"]),
                    int(r["rle_bytes"]), int(r["ratio_milli"]))
         for _, r in out.iterrows()}
    # distinct r = 2; (r,l) = {AF, AO, NO} = 3;
    # (r,l,m) = {AF-9501, AO-9501, NO-9501, NO-9502} = 4
    assert m["l_returnflag"] == (2, 40, 24, (1000 * 24) // 40)
    assert m["l_linestatus"] == (3, 40, 36, (1000 * 36) // 40)
    assert m["ship_month"] == (4, 40, 48, (1000 * 48) // 40)


def test_huber_location_hand_pin():
    import dug_ray.queries as q
    # dollars [10, 20, 30, 40]: mu0 = 25; all |x-mu| <= 10000 ->
    # shift = sum(x) - 4*mu; iter1: shift = 100-100 = 0 -> fixed point
    out = q.QUERIES["huber_location"](_mini()).to_pandas() \
        .sort_values("iter").reset_index(drop=True)
    assert list(out["iter"]) == [0, 1, 2, 3]
    assert list(out["mu"]) == [25, 25, 25, 25]
    assert list(out["shift_sum"]) == [0, 0, 0, 0]


def test_huber_clip_and_negative_floor():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s65hb_")
    # dollars [0, 0, 50000]: mu0 = 16666; clips: -10000, -10000, 10000
    # shift = -10000; floor(-10000/3) = -3334 -> mu1 = 13332
    pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_orderstatus": ["F", "F", "F"],
        "o_totalprice": [0.0, 0.0, 50000.0],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["huber_location"](d).to_pandas() \
        .sort_values("iter").reset_index(drop=True)
    assert int(out.loc[0, "mu"]) == 16666
    assert int(out.loc[1, "shift_sum"]) == -10000
    assert int(out.loc[1, "mu"]) == 16666 + math.floor(-10000 / 3.0)
