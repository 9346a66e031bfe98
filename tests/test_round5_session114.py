"""Round-5 session-114: synthetic control lite, BIC trend, ANCOVA —
hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_synthetic_control_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s114sc_")
    pd.DataFrame({"c_custkey": [1, 2, 3],
                  "c_nationkey": [0, 1, 2]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    rows = [(1, "1994-01-05", 5.00), (1, "1994-02-05", 5.00),
            (2, "1994-01-10", 1.50), (2, "1994-02-10", 1.00),
            (3, "1994-01-15", 1.00)]
    pd.DataFrame({
        "o_custkey": [r[0] for r in rows],
        "o_orderdate": pd.Series([pd.Timestamp(r[1]) for r in rows]
                                 ).astype("datetime64[us]"),
        "o_totalprice": [r[2] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["synthetic_control_lite"](d).to_pandas().iloc[0]
    # treated n0 (share path 500/500); n1 600/400 (pre-dist 100),
    # n2 1000/0 (pre-dist 500) -> control n1
    # DiD: (500-400) - (500-600) = 200
    assert (int(out["treated"]), int(out["control"]),
            int(out["dist_milli"]), int(out["effect_milli"])) \
        == (0, 1, 100, 200)


def test_bic_trend_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s114bt_")
    base = pd.Timestamp("1970-01-01")
    vals = [1.00, 2.00, 2.00]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(3)]
        ).astype("datetime64[us]"),
        "o_totalprice": vals,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["bic_trend"](d).to_pandas().iloc[0]
    # vy=2, vx=6, cxy=3: ratio = 3/12 = 0.25
    assert int(out["ratio_ppm"]) == 250_000
    exp = math.floor(1000 * (3 * math.log(3.0 / 12.0)
                             + math.log(3.0)))
    assert int(out["delta_bic_milli"]) == exp


def test_ancova_adjusted_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s114an_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    base = pd.Timestamp("1970-01-01")
    rows = [(1, 0, 10.0), (1, 2, 20.0), (2, 0, 30.0), (2, 2, 40.0)]
    pd.DataFrame({
        "o_custkey": [r[0] for r in rows],
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=r[1]) for r in rows]
        ).astype("datetime64[us]"),
        "o_totalprice": [r[2] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["ancova_adjusted"](d).to_pandas() \
        .set_index("nation")
    # balanced covariate means -> adjusted equals raw
    assert (int(out.loc[0, "raw_mean_milli"]),
            int(out.loc[0, "adjusted_mean_milli"])) \
        == (15_000, 15_000)
    assert (int(out.loc[1, "raw_mean_milli"]),
            int(out.loc[1, "adjusted_mean_milli"])) \
        == (35_000, 35_000)
