"""Round-5 session-97: Gibrat's law, shift-share, Duane plot —
hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def _ols_slope(pts):
    k = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    num = 1000 * (k * sxy - sx * sy)
    den = k * sxx - sx * sx
    return -((-num) // den) if num < 0 else num // den


def test_gibrat_mirror():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s97gb_")
    base = pd.Timestamp("1970-01-01")
    rows = [(1, 0, 1.00), (1, 10, 2.00), (2, 0, 4.00), (2, 10, 4.00)]
    pd.DataFrame({
        "o_custkey": [r[0] for r in rows],
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=r[1]) for r in rows]
        ).astype("datetime64[us]"),
        "o_totalprice": [r[2] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["gibrat_law"](d).to_pandas().iloc[0]
    # mid=5: cust1 r=(100,200), cust2 r=(400,400)
    pts = []
    for r1, r2 in ((100, 200), (400, 400)):
        x = math.floor(1000 * math.log(r1))
        pts.append((x, math.floor(1000 * math.log(r2)) - x))
    assert (int(out["k_customers"]),
            int(out["slope_milli"])) == (2, _ols_slope(pts))
    # small customer grew, big didn't -> negative slope
    assert int(out["slope_milli"]) < 0


def test_shift_share_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s97ss_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    pd.DataFrame({
        "o_custkey": [1, 2, 1, 2],
        "o_orderdate": pd.Series(
            [pd.Timestamp("1994-03-01"), pd.Timestamp("1994-04-01"),
             pd.Timestamp("1995-03-01"), pd.Timestamp("1995-04-01")]
        ).astype("datetime64[us]"),
        "o_totalprice": [1.00, 1.00, 2.00, 1.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["shift_share"](d).to_pandas().set_index("nation")
    # R0=200, R1=300: national growth 50%; n0: 100->200 (d=100,
    # exp 50, comp 50); n1: 100->100 (d=0, exp 50, comp -50)
    assert (int(out.loc[0, "d_cents"]),
            int(out.loc[0, "expected_cents"]),
            int(out.loc[0, "competitive_cents"])) == (100, 50, 50)
    assert (int(out.loc[1, "d_cents"]),
            int(out.loc[1, "expected_cents"]),
            int(out.loc[1, "competitive_cents"])) == (0, 50, -50)


def test_duane_mirror():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s97du_")
    base = pd.Timestamp("2024-01-01")
    days = [0, 0, 1, 3]
    pd.DataFrame({
        "event_type": ["error"] * 4,
        "ts": pd.Series([base + pd.Timedelta(days=i) for i in days]
                        ).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "events.parquet"))
    out = q.QUERIES["duane_plot"](d).to_pandas().iloc[0]
    # days 0 (cum 2), 1 (cum 3), 3 (cum 4); t_idx 1,2,4
    pts = [(0, math.floor(1000 * math.log(2))),
           (math.floor(1000 * math.log(2)),
            math.floor(1000 * math.log(3))),
           (math.floor(1000 * math.log(4)),
            math.floor(1000 * math.log(4)))]
    assert (int(out["k_days"]),
            int(out["slope_milli"])) == (3, _ols_slope(pts))
