"""Round-5 session-90: zero-inflation score test, 1-D Ripley K,
price elasticity — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_zero_inflation_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s90zi_")
    base = pd.Timestamp("1970-01-01")
    days = [0, 1, 14]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in days]
        ).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["zero_inflation"](d).to_pandas().iloc[0]
    # weeks 0 (2 orders) and 2 (1 order); week 1 empty
    assert (int(out["n_weeks"]), int(out["n_zero"]),
            int(out["m"])) == (3, 1, 3)
    p0 = math.exp(-1.0)
    d0 = 1 - 3 * p0
    den = 3 * p0 * (1 - p0) - 3 * 1.0 * p0 * p0
    assert int(out["s_micro"]) == math.floor(
        1_000_000 * (d0 * d0) / den)


def test_ripley_k_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s90rk_")
    base = pd.Timestamp("1970-01-01")
    days = [0, 0, 1, 5]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in days]
        ).astype("datetime64[us]"),
        "o_totalprice": [1.00] * len(days),
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["ripley_k"](d).to_pandas().set_index("t")
    # n=4, span=5; t=1: 1 same-day pair + 2 cross -> 3 pairs
    # denom = 6*(10-1) = 54; ratio = 75e6 // 54
    assert int(out.loc[1, "pairs"]) == 3
    assert int(out.loc[1, "ratio_ppm"]) == (1_000_000 * 3 * 25) // 54
    # t=3: still 3 pairs; denom = 6*(30-9) = 126
    assert int(out.loc[3, "pairs"]) == 3
    assert int(out.loc[3, "ratio_ppm"]) == (1_000_000 * 3 * 25) // 126
    # t=7: all pairs = C(4,2) = 6; denom = 6*(70-49) = 126
    assert int(out.loc[7, "pairs"]) == 6
    assert int(out.loc[7, "ratio_ppm"]) == (1_000_000 * 6 * 25) // 126


def test_price_elasticity_mirror():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s90pe_")
    pd.DataFrame({"p_partkey": [1, 2],
                  "p_retailprice": [1.00, 2.00]}).to_parquet(
        os.path.join(d, "part.parquet"))
    pd.DataFrame({"l_partkey": [1] * 8 + [2] * 2,
                  "l_quantity": [1.0] * 10}).to_parquet(
        os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["price_elasticity"](d).to_pandas().iloc[0]
    # part1: price 100c qty 8; part2: price 200c qty 2
    xs = [math.floor(1000 * math.log(100)),
          math.floor(1000 * math.log(200))]
    ys = [math.floor(1000 * math.log(8)),
          math.floor(1000 * math.log(2))]
    k, sx, sy = 2, sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    num = 1000 * (k * sxy - sx * sy)
    den = k * sxx - sx * sx
    slope = -((-num) // den) if num < 0 else num // den
    assert (int(out["k"]), int(out["slope_milli"])) == (2, slope)
    # doubling price cuts demand 4x -> elasticity ~ -2
    assert -2100 < slope < -1900
