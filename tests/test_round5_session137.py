"""Round-5 session-137: calendar eta, latency trend, dead stock —
hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_calendar_eta_sanity():
    import dug_ray.queries as q
    out = q.QUERIES["calendar_eta"]("/root/testdata/sf0.001") \
        .to_pandas().set_index("factor")
    assert set(out.index) == {"dow", "month", "year"}
    assert int(out.loc["dow", "k_groups"]) == 7
    assert int(out.loc["month", "k_groups"]) == 12
    for f in ("dow", "month", "year"):
        assert 0 <= int(out.loc[f, "eta2_ppm"]) <= 1_000_000


def test_latency_trend_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s137lt_")
    pd.DataFrame({
        "o_orderkey": [1, 2],
        "o_orderdate": pd.Series(
            [pd.Timestamp("1994-01-10"), pd.Timestamp("1994-02-10")]
        ).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "orders.parquet"))
    pd.DataFrame({
        "l_orderkey": [1, 2],
        "l_shipdate": pd.Series(
            [pd.Timestamp("1994-01-15"), pd.Timestamp("1994-02-25")]
        ).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["latency_trend"](d).to_pandas().iloc[0]
    # p90 latencies: month1 = 5, month2 = 15 -> slope 10*1000
    assert (int(out["k_months"]), int(out["p90_first"]),
            int(out["p90_last"])) == (2, 5, 15)
    assert int(out["slope_milli"]) == 10_000


def test_dead_stock_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s137ds_")
    base = pd.Timestamp("1994-01-01")
    rows = [(1, 0, 1.00), (2, 200, 3.00)]
    pd.DataFrame({
        "l_partkey": [r[0] for r in rows],
        "l_shipdate": pd.Series(
            [base + pd.Timedelta(days=r[1]) for r in rows]
        ).astype("datetime64[us]"),
        "l_extendedprice": [r[2] for r in rows],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["dead_stock"](d).to_pandas().iloc[0]
    # part1 last ship day 0 < 200-90 -> dead; revenue 100 of 400
    assert (int(out["n_parts"]), int(out["n_dead"])) == (2, 1)
    assert int(out["dead_share_ppm"]) == 500_000
    assert int(out["dead_revenue_ppm"]) == 250_000
