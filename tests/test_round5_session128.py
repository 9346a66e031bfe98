"""Round-5 session-128: conformance, price waterfall, discount
response — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_conformance_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s128cc_")
    base = pd.Timestamp("2024-01-01")
    rows = [(1, "signup"), (1, "view"), (1, "click"),
            (1, "purchase"), (2, "view"), (2, "error")]
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "event_id": list(range(len(rows))),
        "ts": pd.Series([base + pd.Timedelta(minutes=i)
                         for i in range(len(rows))]
                        ).astype("datetime64[us]"),
        "event_type": [r[1] for r in rows],
    }).to_parquet(os.path.join(d, "events.parquet"))
    out = q.QUERIES["conformance_check"](d).to_pandas().iloc[0]
    assert (int(out["n_trans"]), int(out["n_conforming"])) == (4, 3)
    assert int(out["fitness_ppm"]) == 750_000
    assert (out["top_bad_src"], out["top_bad_dst"],
            int(out["top_bad_n"])) == ("view", "error", 1)


def test_price_waterfall_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s128pw_")
    pd.DataFrame({
        "l_extendedprice": [10.00, 5.00],
        "l_discount": [0.05, 0.00],
        "l_tax": [0.10, 0.00],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["price_waterfall"](d).to_pandas().iloc[0]
    # line1: leak 50, net 950, tax 95; line2: 0/500/0
    assert (int(out["gross_cents"]), int(out["discount_leak_cents"]),
            int(out["net_cents"]), int(out["tax_cents"])) \
        == (1500, 50, 1450, 95)
    assert int(out["leak_ppm"]) == (1_000_000 * 50) // 1500


def test_discount_response_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s128dr_")
    pd.DataFrame({
        "l_discount": [0.00, 0.10],
        "l_quantity": [10.0, 20.0],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["discount_response"](d).to_pandas().iloc[0]
    # slope = 10 qty per 100 milli-disc = 0.1 -> 100000 micro
    # intercept = 10 qty -> 10000 milli
    assert (int(out["n_lines"]), int(out["slope_micro"]),
            int(out["intercept_milli"])) == (2, 100_000, 10_000)
