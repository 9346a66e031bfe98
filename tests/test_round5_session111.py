"""Round-5 session-111: variance-change CUSUM, IPF raking, Shorrocks
mobility — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_variance_change_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s111vc_")
    base = pd.Timestamp("1970-01-01")
    vals = [1.00, 1.00, 5.00]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(3)]
        ).astype("datetime64[us]"),
        "o_totalprice": vals,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["variance_change"](d).to_pandas().iloc[0]
    # x=[1,1,5]: SS=27; D = [24, 48, 0] -> max at day 1
    assert (int(out["n_days"]), int(out["change_day"])) == (3, 1)
    assert int(out["stat_ppm"]) == (1_000_000 * 48) // 81


def test_ipf_rake_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s111ip_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    pd.DataFrame({
        "o_custkey": [1, 1, 2, 2],
        "o_orderpriority": ["1-URGENT", "1-URGENT",
                            "1-URGENT", "5-LOW"],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["ipf_rake"](d).to_pandas()
    m = {(int(r["nation"]), r["priority"]): int(r["raked_milli"])
         for _, r in out.iterrows()}
    # row pass: a(0,U)=2000, a(1,U)=1000, a(1,L)=1000
    # col pass: col_U=3000 -> b(0,U)=1333, b(1,U)=666; b(1,L)=2000
    assert m == {(0, "1-URGENT"): 1333, (1, "1-URGENT"): 666,
                 (1, "5-LOW"): 2000}


def test_shorrocks_mobility_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s111sm_")
    base = pd.Timestamp("1970-01-01")
    # H1 (day 0) totals A..D = 10/20/30/40;
    # H2 (day 10): A/B swap -> 20/10/30/40
    rows = [(1, 0, 10.0), (2, 0, 20.0), (3, 0, 30.0), (4, 0, 40.0),
            (1, 10, 20.0), (2, 10, 10.0), (3, 10, 30.0),
            (4, 10, 40.0)]
    pd.DataFrame({
        "o_custkey": [r[0] for r in rows],
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=r[1]) for r in rows]
        ).astype("datetime64[us]"),
        "o_totalprice": [r[2] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["shorrocks_mobility"](d).to_pandas().iloc[0]
    # quartile swaps for A/B: trace keeps only C and D -> 2000
    assert (int(out["n_customers"]), int(out["tr_milli"])) \
        == (4, 2000)
    assert int(out["m_milli"]) == (1000 * 2000) // 3000
