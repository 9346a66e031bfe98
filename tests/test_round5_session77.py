"""Round-5 session-77: quantile treatment effects, intraclass
correlation, Borda aggregation — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def _mini_qte(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s77qte_")
    f_vals = [10.0 * i for i in range(1, 11)]
    o_vals = [10.0 * i - 5.0 for i in range(1, 11)]
    pd.DataFrame({
        "o_orderstatus": ["F"] * 10 + ["O"] * 10,
        "o_totalprice": f_vals + o_vals,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_qte_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["qte_deciles"](_mini_qte()).to_pandas()
    # F = 10..100 step 10, O = F - 5: every decile gap is exactly 5
    assert list(out["decile"]) == list(range(1, 10))
    assert list(out["q_f"]) == [10 * d for d in range(1, 10)]
    assert list(out["qte"]) == [5] * 9


def _mini_icc(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s77icc_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": pd.array([0, 1], dtype="int32")}) \
        .to_parquet(os.path.join(d, "customer.parquet"))
    pd.DataFrame({
        "o_custkey": [1, 1, 2, 2],
        "o_totalprice": [10.0, 20.0, 30.0, 40.0],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_icc_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["icc_nations"](_mini_icc()).to_pandas().iloc[0]
    # ssb = 4e8, ssw = 1e8; msb = 4e8, msw = 5e7; n0 = 2.000
    assert (int(out["n"]), int(out["k"])) == (4, 2)
    assert int(out["msb_micro"]) == 400_000_000
    assert int(out["msw_micro"]) == 50_000_000
    assert int(out["n0_milli"]) == 2000
    assert int(out["icc_milli"]) == 777   # 3.5e11 // 4.5e8


def _mini_borda(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s77bd_")
    pd.DataFrame({"n_nationkey": pd.array([0, 1], dtype="int32"),
                  "n_name": ["N0", "N1"],
                  "n_regionkey": pd.array([0, 0], dtype="int32")}) \
        .to_parquet(os.path.join(d, "nation.parquet"))
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": pd.array([0, 1], dtype="int32")}) \
        .to_parquet(os.path.join(d, "customer.parquet"))
    base = pd.Timestamp("2024-01-01")
    rows = [(1, 0, 1.00), (2, 0, 2.00), (1, 30, 3.00)]
    pd.DataFrame({
        "o_custkey": [r[0] for r in rows],
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=r[1]) for r in rows]
        ).astype("datetime64[us]"),
        "o_totalprice": [r[2] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_borda_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["borda_months"](_mini_borda()).to_pandas()
    m = {int(r["nation"]): (int(r["points"]), int(r["final_rank"]))
         for _, r in out.iterrows()}
    # bucket1: n1 wins (1pt); bucket2: n0 wins (1pt); tie -> n0 first
    assert m[0] == (1, 1)
    assert m[1] == (1, 2)
