"""Round-5 session-144: revenue bridge, menu cost, whale curve —
hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def _lineitems(rows, prefix):
    d = tempfile.mkdtemp(prefix=prefix)
    pd.DataFrame({
        "l_partkey": [r[0] for r in rows],
        "l_shipdate": pd.Series([pd.Timestamp(r[1]) for r in rows]
                                ).astype("datetime64[us]"),
        "l_quantity": [r[2] for r in rows],
        "l_extendedprice": [r[3] for r in rows],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    return d


def test_revenue_bridge_hand_pin():
    import dug_ray.queries as q
    rows = [(1, "1994-05-01", 2.0, 2.00),
            (1, "1995-05-01", 3.0, 3.60),
            (2, "1994-06-01", 1.0, 0.50),
            (3, "1995-06-01", 1.0, 0.80)]
    out = q.QUERIES["revenue_bridge"](
        _lineitems(rows, "s144rb_")).to_pandas().iloc[0]
    # delta = 440-250 = 190; vol = 1*100; price = 3*20
    # new = 80; exit = -50; residual 0
    assert (int(out["delta_cents"]), int(out["volume_cents"]),
            int(out["price_cents"]), int(out["new_cents"]),
            int(out["exit_cents"]), int(out["residual_cents"])) \
        == (190, 100, 60, 80, -50, 0)


def test_menu_cost_hand_pin():
    import dug_ray.queries as q
    rows = [(1, "1994-05-01", 1.0, 1.00),
            (1, "1995-05-01", 1.0, 1.20),
            (2, "1994-06-01", 1.0, 1.00),
            (2, "1995-06-01", 1.0, 1.00)]
    out = q.QUERIES["menu_cost"](
        _lineitems(rows, "s144mc_")).to_pandas().iloc[0]
    # p1 moved 20% (20c); p2 flat
    assert (int(out["n_shared"]), int(out["n_changed"]),
            int(out["changed_ppm"])) == (2, 1, 500_000)
    assert int(out["mean_abs_change_milli"]) == 20_000


def test_whale_curve_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s144wc_")
    pd.DataFrame({
        "o_custkey": [1, 2, 3, 4],
        "o_totalprice": [4.00, 3.00, 2.00, 1.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["whale_curve"](d).to_pandas().iloc[0]
    # ranks 1..4 of 4: top10% -> rank1 (400/1000)
    # top20% -> rank1; top50% -> rank2 (700/1000)
    assert int(out["n_customers"]) == 4
    assert int(out["top10_ppm"]) == 400_000
    assert int(out["top20_ppm"]) == 400_000
    assert int(out["top50_ppm"]) == 700_000
