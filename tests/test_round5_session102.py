"""Round-5 session-102: deseasonalized DW, bathtub check, Fisher
index — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_deseasonalized_dw_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s102dd_")
    base = pd.Timestamp("1970-01-01")
    vals = [10.00, 1.00, 1.00, 1.00, 1.00, 1.00, 1.00, 20.00]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(8)]
        ).astype("datetime64[us]"),
        "o_totalprice": vals,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["deseasonalized_dw"](d).to_pandas().iloc[0]
    # dow of day0 and day7 coincide: residuals [-5000,0,...,0,5000]
    # sum d^2 = 2*25e6; n*srr - sr^2 = 8*5e7 -> dw = 1000
    assert int(out["n_days"]) == 8
    assert int(out["dw_deseason_milli"]) == 1000
    # raw series [10000,1000x6,20000]: d2 = 81e6+361e6 = 442e6
    # den = 8*506e6 - 36000^2 = 2752e6 -> 1284
    assert int(out["dw_raw_milli"]) == (1000 * 8 * 442_000_000) \
        // 2_752_000_000


def test_bathtub_mirror():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s102bt_")
    base = pd.Timestamp("1970-01-01")
    rows = [(1, 0), (1, 2), (2, 5), (2, 7), (3, 0),
            (4, 0), (4, 10), (5, 0), (5, 1)]
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.Series([base + pd.Timedelta(days=r[1])
                         for r in rows]).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "events.parquet"))
    out = q.QUERIES["bathtub_check"](d).to_pandas().iloc[0]
    # death times: t=0 (1/5), t=1 (1/4), t=2 (2/3)
    pts = [(0, math.floor(1000 * math.log(1 / 5))),
           (1, math.floor(1000 * math.log(1 / 4))),
           (2, math.floor(1000 * math.log(2 / 3)))]
    s0 = 3
    s1 = sum(x for x, _ in pts)
    s2 = sum(x * x for x, _ in pts)
    s3 = sum(x ** 3 for x, _ in pts)
    s4 = sum(x ** 4 for x, _ in pts)
    t0 = sum(y for _, y in pts)
    t1 = sum(x * y for x, y in pts)
    t2 = sum(x * x * y for x, y in pts)
    dd = (s0 * (s2 * s4 - s3 * s3) - s1 * (s1 * s4 - s3 * s2)
          + s2 * (s1 * s3 - s2 * s2))
    dc = (s0 * (s2 * t2 - t1 * s3) - s1 * (s1 * t2 - t1 * s2)
          + t0 * (s1 * s3 - s2 * s2))
    num = 1_000_000 * dc
    assert int(out["k_points"]) == 3
    # truncation-toward-zero division (DuckDB // semantics)
    sign = -1 if (num < 0) != (dd < 0) else 1
    tr = sign * (abs(num) // abs(dd))
    assert int(out["c_micro"]) == tr
    assert int(out["bathtub"]) == (1 if tr > 0 else 0)


def test_fisher_index_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s102fp_")
    pd.DataFrame({
        "l_partkey": [1, 1, 1],
        "l_shipdate": pd.Series(
            [pd.Timestamp("1994-05-01"), pd.Timestamp("1994-06-01"),
             pd.Timestamp("1995-05-01")]).astype("datetime64[us]"),
        "l_quantity": [1.0, 1.0, 1.0],
        "l_extendedprice": [1.00, 1.00, 1.50],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["fisher_price_index"](d).to_pandas().iloc[0]
    # y0: q=2 v=200; y1: q=1 v=150: L = 1000*300//200 = 1500
    # P = 1000*150//100 = 1500; F = 1500
    assert (int(out["n_parts"]), int(out["laspeyres_milli"]),
            int(out["paasche_milli"]), int(out["fisher_milli"])) \
        == (1, 1500, 1500, 1500)
