"""Round-5 session-122: Buhlmann credibility, Erlang-B, knapsack
audit — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_buhlmann_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s122bz_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    pd.DataFrame({
        "o_custkey": [1, 1, 2, 2],
        "o_totalprice": [10.00, 20.00, 30.00, 50.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["buhlmann_z"](d).to_pandas().set_index("nation")
    # msb 625e6, msw 125e6, n0 2000 -> VHM 250e6, k 500
    # z = 2e6 // 2500 = 800; premiums 17500 / 37500
    assert (int(out.loc[0, "z_milli"]),
            int(out.loc[0, "premium_milli"])) == (800, 17_500)
    assert (int(out.loc[1, "z_milli"]),
            int(out.loc[1, "premium_milli"])) == (800, 37_500)


def test_erlang_b_mirror():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s122eb_")
    base = pd.Timestamp("1970-01-01")
    days = [0, 0, 1, 1]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in days]
        ).astype("datetime64[us]"),
        "o_totalprice": [1.00] * 4,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["erlang_b"](d).to_pandas().set_index("c")
    a = 2.0
    b = 1.0
    for c in range(1, 9):
        b = (a * b) / (c + a * b)
        assert int(out.loc[c, "blocking_ppm"]) == \
            math.floor(1_000_000 * b)
    # a=2: B1 = 2/3, B2 = 0.4
    assert int(out.loc[2, "blocking_ppm"]) == 400_000


def test_knapsack_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s122ka_")
    rows = [(1, 2.0, 6.00), (2, 5.0, 5.00), (3, 10.0, 1.00)]
    pd.DataFrame({
        "l_partkey": [r[0] for r in rows],
        "l_quantity": [r[1] for r in rows],
        "l_extendedprice": [r[2] for r in rows],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["knapsack_audit"](d).to_pandas().iloc[0]
    # weights 2/5/10 (total 17, budget 3); densities 3e5/1e5/1e4
    # prefix greedy: take p1 (w=2), stop at p2
    # bound = 600 + (1*500)//5 = 700
    assert (int(out["budget_w"]), int(out["n_taken"]),
            int(out["value_cents"]), int(out["bound_cents"])) \
        == (3, 1, 600, 700)
    assert int(out["gap_ppm"]) == (1_000_000 * 100) // 700
