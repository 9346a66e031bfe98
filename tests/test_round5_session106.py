"""Round-5 session-106: rank-biased overlap, trimmed-mean index,
HHI trend — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_rbo_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s106rb_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    pd.DataFrame({
        "o_custkey": [1, 1, 2],
        "o_totalprice": [10.00, 10.00, 1.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["rbo_rankings"](d).to_pandas().iloc[0]
    # identical rankings: X_d = d at every depth
    exp = sum(math.floor(100_000 * 0.9 ** (dd - 1) * dd / dd)
              for dd in (1, 2))
    assert (int(out["n"]), int(out["rbo_ppm"])) == (2, exp)


def test_trimmed_mean_index_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s106tm_")
    rows = []
    for pk, p1 in ((1, 1.00), (2, 2.00), (3, 3.00)):
        rows.append((pk, "1994-05-01", 1.00))
        rows.append((pk, "1995-05-01", p1))
    pd.DataFrame({
        "l_partkey": [r[0] for r in rows],
        "l_shipdate": pd.Series([pd.Timestamp(r[1]) for r in rows]
                                ).astype("datetime64[us]"),
        "l_quantity": [1.0] * len(rows),
        "l_extendedprice": [r[2] for r in rows],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["trimmed_mean_index"](d).to_pandas().iloc[0]
    # relatives 1000/2000/3000, equal weights 100: only the middle
    # part survives the 20% weight trim
    assert (int(out["n_parts"]), int(out["n_kept"]),
            int(out["index_milli"])) == (3, 1, 2000)


def test_hhi_trend_mirror():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s106ht_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    rows = [(1, "1994-01-05"), (1, "1994-01-20"),
            (1, "1994-02-05"), (2, "1994-02-20")]
    pd.DataFrame({
        "o_custkey": [r[0] for r in rows],
        "o_orderdate": pd.Series([pd.Timestamp(r[1]) for r in rows]
                                 ).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["hhi_trend"](d).to_pandas().iloc[0]
    # month 1: (2,0) -> hhi 1e6; month 2: (1,1) -> 5e5
    # consecutive months -> slope = -500000 * 1000
    assert int(out["k_months"]) == 2
    assert int(out["mean_hhi_ppm"]) == 750_000
    assert int(out["slope_milli"]) == -500_000_000
