"""Round-5 session-71: Moran's I, semivariogram, SAX symbolization —
hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def _mini_spatial(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s71sp_")
    pd.DataFrame({"r_regionkey": [0, 1], "r_name": ["R0", "R1"]}) \
        .to_parquet(os.path.join(d, "region.parquet"))
    pd.DataFrame({"n_nationkey": pd.array([0, 1, 2], dtype="int32"),
                  "n_name": ["N0", "N1", "N2"],
                  "n_regionkey": pd.array([0, 0, 1], dtype="int32")}) \
        .to_parquet(os.path.join(d, "nation.parquet"))
    pd.DataFrame({"c_custkey": [1, 2, 3],
                  "c_nationkey": pd.array([0, 1, 2], dtype="int32")}) \
        .to_parquet(os.path.join(d, "customer.parquet"))
    pd.DataFrame({"o_custkey": [1, 2, 3],
                  "o_totalprice": [1.00, 3.00, 2.00]}) \
        .to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_moran_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["moran_i"](_mini_spatial()).to_pandas().iloc[0]
    # x = [100,300,200], zhat = [-300,300,0]; region 0 pair sum
    # (0)^2 - 180000 = -180000; W = 2; den = 2*180000
    assert (int(out["n_nations"]), int(out["w_sum"])) == (3, 2)
    assert int(out["i_milli"]) == -1500
    assert int(out["e_milli"]) == -500


def _mini_days(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s71dy_")
    base = pd.Timestamp("2024-01-01")
    days = [0, 1, 2, 4]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=x) for x in days]
        ).astype("datetime64[us]"),
        "o_totalprice": [1.00, 2.00, 4.00, 5.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_semivariogram_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["semivariogram"](_mini_days()).to_pandas()
    m = {int(r["lag"]): (int(r["n_pairs"]), int(r["gamma_cents2"]))
         for _, r in out.iterrows()}
    # cents [100,200,400,500] at days 0,1,2,4 (3 missing)
    assert m[1] == (2, 12_500)   # (100^2+200^2)//4
    assert m[2] == (2, 25_000)   # (300^2+100^2)//4
    assert m[3] == (1, 45_000)   # 300^2//2
    assert m[4] == (1, 80_000)   # 400^2//2
    assert m[5] == (0, 0)


def _mini_sax(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s71sx_")
    base = pd.Timestamp("2024-01-01")
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(4)]
        ).astype("datetime64[us]"),
        "o_totalprice": [3.00, 1.00, 2.00, 4.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_sax_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["sax_paa"](_mini_sax()).to_pandas()
    m = {int(r["seg"]): (int(r["paa_cents"]), int(r["symbol"]))
         for _, r in out.iterrows()}
    # 4 days -> segs 0,4,8,12 with paa [300,100,200,400]
    assert m == {0: (300, 2), 4: (100, 0), 8: (200, 1), 12: (400, 3)}
