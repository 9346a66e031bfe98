"""Round-5 session-139: user surprisal, price level, consolidation —
hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_user_surprisal_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s139us_")
    base = pd.Timestamp("2024-01-01")
    # transitions: u1 view->click; u2 view->click; u3 view->error
    rows = [(1, "view"), (1, "click"), (2, "view"), (2, "click"),
            (3, "view"), (3, "error")]
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "event_id": list(range(len(rows))),
        "ts": pd.Series([base + pd.Timedelta(minutes=i)
                         for i in range(len(rows))]
                        ).astype("datetime64[us]"),
        "event_type": [r[1] for r in rows],
    }).to_parquet(os.path.join(d, "events.parquet"))
    out = q.QUERIES["user_surprisal"](d).to_pandas().iloc[0]
    s_click = math.floor(1_000_000 * math.log(3 / 2))
    s_error = math.floor(1_000_000 * math.log(3 / 1))
    # means: u1=u2=s_click, u3=s_error
    assert int(out["n_users"]) == 3
    assert int(out["p10_micro"]) == s_click
    assert int(out["p50_micro"]) == s_click
    assert int(out["p90_micro"]) == s_error


def test_price_level_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s139pl_")
    pd.DataFrame({"s_suppkey": [1, 2],
                  "s_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "supplier.parquet"))
    pd.DataFrame({
        "l_suppkey": [1, 2],
        "l_quantity": [1.0, 1.0],
        "l_extendedprice": [1.00, 3.00],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["price_level_index"](d).to_pandas() \
        .set_index("nation")
    # unit values 100 vs 300; global 200: indices 500 / 1500
    assert int(out.loc[0, "index_milli"]) == 500
    assert int(out.loc[1, "index_milli"]) == 1500


def test_order_consolidation_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s139oc_")
    base = pd.Timestamp("1970-01-01")
    rows = [(1, 0), (1, 0), (1, 5), (2, 0)]
    pd.DataFrame({
        "o_custkey": [r[0] for r in rows],
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=r[1]) for r in rows]
        ).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["order_consolidation"](d).to_pandas().iloc[0]
    # c1 day0 has 2 orders -> 2 of 4 orders consolidated
    assert (int(out["n_orders"]), int(out["n_in_multi"]),
            int(out["share_ppm"]), int(out["max_same_day"])) \
        == (4, 2, 500_000, 2)
