"""Round-5 session-88: Lorenz asymmetry, Taylor's law, sigma clipping
— hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_lorenz_asymmetry_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s88la_")
    pd.DataFrame({"o_totalprice": [1.00, 2.00, 6.00]}).to_parquet(
        os.path.join(d, "orders.parquet"))
    out = q.QUERIES["lorenz_asymmetry"](d).to_pandas().iloc[0]
    # cents [100,200,600], mean 300: below = {100,200}
    assert (int(out["n"]), int(out["n_below"])) == (3, 2)
    assert int(out["f_ppm"]) == 666_666
    assert int(out["l_ppm"]) == 333_333
    assert int(out["s_ppm"]) == 999_999


def test_taylor_law_mirror():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s88tl_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    pd.DataFrame({
        "o_custkey": [1, 1, 2, 2],
        "o_totalprice": [10.00, 20.00, 30.00, 50.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["taylor_law"](d).to_pandas().iloc[0]
    # spec mirror: nation0 mean 15 var 50; nation1 mean 40 var 200
    xs = [math.floor(1000 * math.log(15.0)),
          math.floor(1000 * math.log(40.0))]
    ys = [math.floor(1000 * math.log(50.0)),
          math.floor(1000 * math.log(200.0))]
    k = 2
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (1000 * (k * sxy - sx * sy)) // (k * sxx - sx * sx)
    intercept = 1000 * sy - slope * sx
    intercept = -((-intercept) // (1000 * k)) if intercept < 0 \
        else intercept // (1000 * k)
    assert (int(out["k"]), int(out["slope_milli"]),
            int(out["intercept_milli"])) == (2, slope, intercept)
    assert int(out["slope_milli"]) > 0


def test_sigma_clip_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s88sc_")
    pd.DataFrame({
        "o_totalprice": [10.00] * 20 + [1000.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["sigma_clip"](d).to_pandas().iloc[0]
    # round 1: mean0 = 1200000 // 21 = 57142; the 1000-dollar
    # outlier sits beyond 3 sigma and is clipped; round 2 removes
    # nothing (all-equal survivors)
    assert (int(out["n0"]), int(out["removed1"]),
            int(out["removed2"])) == (21, 1, 0)
    assert int(out["mean0_milli"]) == 57_142
    assert int(out["mean_final_milli"]) == 10_000
