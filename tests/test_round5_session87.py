"""Round-5 session-87: Lin concordance, Neyman allocation, Fano
factor — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_lin_ccc_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s87lc_")
    pd.DataFrame({
        "o_orderkey": [1, 2],
        "o_totalprice": [10.00, 20.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    pd.DataFrame({
        "l_orderkey": [1, 1, 2],
        "l_extendedprice": [4.00, 6.00, 15.00],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["lin_ccc"](d).to_pandas().iloc[0]
    # pairs (10,10), (20,15): num = 2*(2*400 - 750) = 100
    # den = (1000-900) + (650-625) + 25 = 150 -> 666666
    assert (int(out["n_orders"]), int(out["ccc_micro"])) \
        == (2, 666_666)


def test_neyman_alloc_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s87na_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    pd.DataFrame({
        "o_custkey": [1, 1, 2, 2],
        "o_totalprice": [10.00, 20.00, 30.00, 50.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["neyman_alloc"](d).to_pandas().set_index("nation")
    # nation0: var_milli 50000 -> sd = floor(sqrt(5e7)) = 7071
    # nation1: var_milli 200000 -> sd = floor(sqrt(2e8)) = 14142
    assert int(out.loc[0, "sd_milli"]) == 7_071
    assert int(out.loc[1, "sd_milli"]) == 14_142
    # weights 14142/28284, W=42426: bases 3333/6666, remainders
    # 14142/27684 -> leftover seat goes to nation1
    assert int(out.loc[0, "alloc"]) == 3_333
    assert int(out.loc[1, "alloc"]) == 6_667
    assert int(out["alloc"].sum()) == 10_000


def test_fano_factor_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s87ff_")
    base = pd.Timestamp("1970-01-01")
    days = [0, 1, 1, 1, 2, 3, 3, 3]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in days]
        ).astype("datetime64[us]"),
        "o_totalprice": [1.00] * len(days),
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["fano_factor"](d).to_pandas().set_index("w")
    # w=1: counts [1,3,1,3]: n=4 S=8 Q=20
    # fano = 1000*(80-64) // (3*8) = 666
    assert (int(out.loc[1, "n_windows"]),
            int(out.loc[1, "fano_milli"])) == (4, 666)
    # w=7 and w=28: single window -> guard 0
    assert (int(out.loc[7, "n_windows"]),
            int(out.loc[7, "fano_milli"])) == (1, 0)
    assert int(out.loc[28, "fano_milli"]) == 0
