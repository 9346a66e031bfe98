"""Round-5 session-123: Weibull shape, two-means split, MDE power —
hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_weibull_shape_mirror():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s123wb_")
    base = pd.Timestamp("1970-01-01")
    # deaths at t=1 (u1) and t=2 (u2, u3); u4 censored (l=10)
    rows = [(1, 0), (1, 1), (2, 0), (2, 2), (3, 5), (3, 7),
            (4, 0), (4, 10)]
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.Series([base + pd.Timedelta(days=r[1])
                         for r in rows]).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "events.parquet"))
    out = q.QUERIES["weibull_shape"](d).to_pandas().iloc[0]
    n = 3
    pts = []
    for t, cum in ((1, 1), (2, 3)):
        a = 10 * (n - cum) + 7
        b = 10 * n + 4
        pts.append((math.floor(1000 * math.log(t)),
                    math.floor(1000 * math.log(-math.log(a / b)))))
    k = 2
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] ** 2 for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    num = 1000 * (k * sxy - sx * sy)
    den = k * sxx - sx * sx
    sign = -1 if (num < 0) != (den < 0) else 1
    beta = sign * (abs(num) // abs(den))
    assert (int(out["n_deaths"]), int(out["k_points"]),
            int(out["beta_milli"])) == (3, 2, beta)
    assert beta > 0


def test_two_means_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s123tm_")
    pd.DataFrame({
        "o_totalprice": [1.00, 2.00, 10.00, 11.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["two_means_split"](d).to_pandas().iloc[0]
    # split {1,2} | {10,11}: ssw = 5e5 + 5e5 = 1e6
    # total ssw = (1e6 * 328) // 4 = 82e6
    assert (int(out["n"]), int(out["threshold_v"])) == (4, 2)
    assert int(out["reduction_ppm"]) == \
        1_000_000 - (1_000_000 * 1_000_000) // 82_000_000


def test_mde_power_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s123mp_")
    # md5 parity: keys 1,3 -> arm 0 ([10,30]); keys 2,4 -> arm 1
    pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4],
        "o_totalprice": [10.00, 20.00, 30.00, 40.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["mde_power"](d).to_pandas().iloc[0]
    # pooled var_milli = (1000*(4*3000-10000))//12 = 166666
    mde = math.floor(3 * math.sqrt(2000.0 * 166_666 / 2))
    assert (int(out["n_a"]), int(out["n_b"])) == (2, 2)
    assert int(out["mde_milli"]) == mde
    assert int(out["obs_diff_milli"]) == 10_000
    assert int(out["detectable"]) == (1 if 10_000 >= mde else 0)
