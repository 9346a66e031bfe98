"""Round-5 session-120: cure fraction, duplicate payments, safety
stock — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_cure_fraction_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s120cf_")
    base = pd.Timestamp("1970-01-01")
    rows = [(1, 0), (1, 2), (2, 5), (2, 7), (3, 0),
            (4, 0), (4, 10)]
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.Series([base + pd.Timedelta(days=r[1])
                         for r in rows]).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "events.parquet"))
    out = q.QUERIES["cure_fraction"](d).to_pandas().iloc[0]
    lg = (math.floor(math.log(3 / 4) * 1_000_000)
          + math.floor(math.log(1 / 3) * 1_000_000))
    assert (int(out["n_users"]), int(out["n_deaths"])) == (4, 3)
    assert int(out["plateau_milli"]) == math.floor(
        1000 * math.exp(lg / 1_000_000.0))
    assert int(out["censored_ppm"]) == 250_000


def test_duplicate_payments_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s120dp_")
    base = pd.Timestamp("1970-01-01")
    rows = [(1, 1, 0, 1.00), (2, 1, 3, 1.00), (3, 1, 20, 1.00),
            (4, 1, 4, 2.00)]
    pd.DataFrame({
        "o_orderkey": [r[0] for r in rows],
        "o_custkey": [r[1] for r in rows],
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=r[2]) for r in rows]
        ).astype("datetime64[us]"),
        "o_totalprice": [r[3] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["duplicate_payments"](d).to_pandas().iloc[0]
    # only orders 1 & 2 match (100c, 3 days apart)
    assert (int(out["n_pairs"]), int(out["n_custs"]),
            int(out["at_risk_cents"])) == (1, 1, 100)


def test_safety_stock_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s120ss_")
    pd.DataFrame({"p_partkey": [1], "p_brand": ["B1"]}).to_parquet(
        os.path.join(d, "part.parquet"))
    pd.DataFrame({
        "l_partkey": [1, 1],
        "l_shipdate": pd.Series(
            [pd.Timestamp("1994-01-01"), pd.Timestamp("1994-01-02")]
        ).astype("datetime64[us]"),
        "l_quantity": [2.0, 4.0],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["safety_stock"](d).to_pandas().iloc[0]
    # daily q [2,4]: mean 3000, pop var_milli = 1000
    ss = math.floor(2 * math.sqrt(7000.0 * 1000))
    assert (out["brand"], int(out["n_days"]),
            int(out["mean_milli"])) == ("B1", 2, 3000)
    assert int(out["ss_milli"]) == ss
    assert int(out["rop_milli"]) == 21_000 + ss
