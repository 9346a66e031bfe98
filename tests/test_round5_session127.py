"""Round-5 session-127: median CI, alive probability, cohort quality
— hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_median_ci_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s127mc_")
    pd.DataFrame({
        "o_totalprice": [float(i) for i in range(1, 10)],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["median_ci"](d).to_pandas().iloc[0]
    # n=9, s=3: ranks lo=1, med=5, hi=8
    assert (int(out["n"]), int(out["lo_v"]), int(out["median_v"]),
            int(out["hi_v"])) == (9, 1, 5, 8)


def test_alive_probability_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s127ap_")
    base = pd.Timestamp("1970-01-01")
    rows = [(1, 0), (1, 10), (2, 20), (2, 30), (2, 40)]
    pd.DataFrame({
        "o_custkey": [r[0] for r in rows],
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=r[1]) for r in rows]
        ).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["alive_probability"](d).to_pandas().iloc[0]
    # T=40; c1: r = 1000*30*1//10 = 3000 (dead); c2: r = 0 (alive)
    assert (int(out["n_custs"]), int(out["n_dead"]),
            int(out["dead_share_ppm"])) == (2, 1, 500_000)
    assert int(out["median_r_milli"]) == 0


def test_cohort_quality_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s127cq_")
    rows = [(1, 1, "1994-01-10", 10.00), (1, 2, "1994-03-01", 99.0),
            (2, 3, "1994-02-10", 30.00)]
    pd.DataFrame({
        "o_custkey": [r[0] for r in rows],
        "o_orderkey": [r[1] for r in rows],
        "o_orderdate": pd.Series([pd.Timestamp(r[2]) for r in rows]
                                 ).astype("datetime64[us]"),
        "o_totalprice": [r[3] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["cohort_quality"](d).to_pandas().iloc[0]
    # cohorts: 1994-01 (c1, 1e6 milli-cents) and 1994-02 (c2, 3e6)
    # consecutive months -> slope_milli = 1000 * 2e6 = 2e9
    assert (int(out["k_months"]), int(out["n_customers"])) == (2, 2)
    assert int(out["slope_milli"]) == 2_000_000_000
