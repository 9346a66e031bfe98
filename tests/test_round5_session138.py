"""Round-5 session-138: brand return rates, James-Stein, activation
rate — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_return_rate_brands_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s138rr_")
    pd.DataFrame({"p_partkey": [1], "p_brand": ["B1"]}).to_parquet(
        os.path.join(d, "part.parquet"))
    pd.DataFrame({
        "l_partkey": [1, 1],
        "l_returnflag": ["R", "N"],
        "l_extendedprice": [1.00, 2.00],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["return_rate_brands"](d).to_pandas().iloc[0]
    assert (out["brand"], int(out["n"]), int(out["r"])) \
        == ("B1", 2, 1)
    assert int(out["rate_ppm"]) == 500_000
    assert int(out["value_rate_ppm"]) == (1_000_000 * 100) // 300


def test_james_stein_sanity():
    import dug_ray.queries as q
    out = q.QUERIES["james_stein"]("/root/testdata/sf0.001") \
        .to_pandas().iloc[0]
    assert int(out["k"]) == 25
    assert 0 <= int(out["factor_milli"]) <= 1000
    assert int(out["max_change_milli"]) >= 0


def test_activation_rate_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s138ar_")
    base = pd.Timestamp("1970-01-01")
    rows = [(1, 1, 0), (1, 2, 10), (2, 3, 0), (2, 4, 50),
            (3, 5, 0), (4, 6, 100)]
    pd.DataFrame({
        "o_custkey": [r[0] for r in rows],
        "o_orderkey": [r[1] for r in rows],
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=r[2]) for r in rows]
        ).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["activation_rate"](d).to_pandas().iloc[0]
    # eligible: first <= 70 -> c1, c2, c3; activated: c1 (gap 10)
    assert (int(out["n_eligible"]), int(out["n_activated"])) \
        == (3, 1)
    assert int(out["rate_ppm"]) == 333_333
    assert int(out["median_days"]) == 10
