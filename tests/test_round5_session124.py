"""Round-5 session-124: trade gravity, RCA, supplier balance —
hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_trade_gravity_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s124tg_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    pd.DataFrame({"s_suppkey": [1, 2],
                  "s_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "supplier.parquet"))
    pd.DataFrame({"o_orderkey": [1, 2],
                  "o_custkey": [1, 2]}).to_parquet(
        os.path.join(d, "orders.parquet"))
    # flows: (c0,s0)=100, (c0,s1)=100, (c1,s1)=200
    pd.DataFrame({
        "l_orderkey": [1, 1, 2],
        "l_suppkey": [1, 2, 2],
        "l_extendedprice": [1.00, 1.00, 2.00],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["trade_gravity"](d).to_pandas()
    m = {(int(r["cust_nation"]), int(r["supp_nation"])):
         int(r["gravity_milli"]) for _, r in out.iterrows()}
    # total 400; rows c0=200, c1=200; cols s0=100, s1=300
    assert m[(0, 0)] == (1000 * 100 * 400) // (200 * 100)
    assert m[(0, 1)] == (1000 * 100 * 400) // (200 * 300)
    assert m[(1, 1)] == (1000 * 200 * 400) // (200 * 300)


def test_rca_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s124rc_")
    pd.DataFrame({"s_suppkey": [1, 2],
                  "s_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "supplier.parquet"))
    pd.DataFrame({"p_partkey": [1, 2],
                  "p_brand": ["B1", "B2"]}).to_parquet(
        os.path.join(d, "part.parquet"))
    pd.DataFrame({
        "l_suppkey": [1, 1, 2],
        "l_partkey": [1, 2, 2],
        "l_extendedprice": [1.00, 1.00, 2.00],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["rca_brands"](d).to_pandas()
    m = {(int(r["supp_nation"]), r["brand"]): int(r["rca_milli"])
         for _, r in out.iterrows()}
    # total 400; rows n0=200 n1=200; cols B1=100 B2=300
    assert m[(0, "B1")] == (1000 * 100 * 400) // (200 * 100)
    assert m[(1, "B2")] == (1000 * 200 * 400) // (200 * 300)


def test_supplier_balance_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s124sb_")
    pd.DataFrame({
        "s_nationkey": [0, 0, 0, 0],
        "s_acctbal": [-5.00, 1.00, 2.00, 10.00],
    }).to_parquet(os.path.join(d, "supplier.parquet"))
    out = q.QUERIES["supplier_balance_profile"](d).to_pandas().iloc[0]
    # sorted cents [-500,100,200,1000]: p50 -> cum>=2 -> 100
    # p90 -> cum >= 3.6 -> 1000; 1 of 4 negative
    assert (int(out["nation"]), int(out["n_suppliers"])) == (0, 4)
    assert (int(out["median_cents"]), int(out["p90_cents"])) \
        == (100, 1000)
    assert int(out["in_debt_ppm"]) == 250_000
