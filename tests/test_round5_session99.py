"""Round-5 session-99: Engel curve, box dimension, second-digit
Benford — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_engel_curve_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s99ec_")
    pd.DataFrame({
        "o_custkey": [1, 2],
        "o_orderpriority": ["1-URGENT", "3-MEDIUM"],
        "o_totalprice": [1.00, 3.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["engel_curve"](d).to_pandas().set_index("decile")
    # c1 (100c all urgent) -> decile 1; c2 (300c none) -> decile 6
    assert (int(out.loc[1, "n_cust"]),
            int(out.loc[1, "share_ppm"])) == (1, 1_000_000)
    assert (int(out.loc[6, "n_cust"]),
            int(out.loc[6, "share_ppm"])) == (1, 0)


def test_box_dimension_mirror():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s99bd_")
    base = pd.Timestamp("1970-01-01")
    days = [0, 3]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in days]
        ).astype("datetime64[us]"),
        "o_totalprice": [1.00] * len(days),
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["box_dimension"](d).to_pandas().iloc[0]
    # N(eps): 1->2, 2->2, 4..64 -> 1
    pts = []
    for eps in (1, 2, 4, 8, 16, 32, 64):
        n = len({dd // eps for dd in days})
        pts.append((math.floor(1000 * math.log(eps)),
                    math.floor(1000 * math.log(n))))
    k = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    num = 1000 * (k * sxy - sx * sy)
    den = k * sxx - sx * sx
    slope = -((-num) // den) if num < 0 else num // den
    assert (int(out["n_days"]), int(out["k_scales"]),
            int(out["dim_milli"])) == (2, 7, -slope)


def test_benford_second_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s99b2_")
    # cents: 12, 25, 19, 5 (5 excluded: single digit)
    pd.DataFrame({"o_totalprice": [0.12, 0.25, 0.19, 0.05]}) \
        .to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["benford_second"](d).to_pandas().set_index("d")
    assert int(out["obs_n"].sum()) == 3
    assert (int(out.loc[2, "obs_n"]), int(out.loc[5, "obs_n"]),
            int(out.loc[9, "obs_n"])) == (1, 1, 1)
    assert int(out.loc[2, "obs_ppm"]) == 333_333
    exp0 = sum(math.floor(1_000_000 * math.log(1 + 1 / (10 * k))
                          / math.log(10)) for k in range(1, 10))
    assert int(out.loc[0, "exp_ppm"]) == exp0
    # second-digit law: P(0) ~ 0.1197
    assert 115_000 < exp0 < 121_000
