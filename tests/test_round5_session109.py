"""Round-5 session-109: record gaps, irreversibility, Lorenz
crossing — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def _orders_days(prices, prefix):
    d = tempfile.mkdtemp(prefix=prefix)
    base = pd.Timestamp("1970-01-01")
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(len(prices))]
        ).astype("datetime64[us]"),
        "o_totalprice": prices,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    return d


def test_record_gaps_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["record_gaps"](
        _orders_days([1.00, 0.50, 2.00, 3.00], "s109rg_")) \
        .to_pandas().set_index("idx")
    # records at days 0 (100c), 2 (200c), 3 (300c)
    assert len(out) == 3
    assert (int(out.loc[1, "day"]), int(out.loc[1, "gap_days"])) \
        == (0, 0)
    assert (int(out.loc[2, "day"]), int(out.loc[2, "gap_days"])) \
        == (2, 2)
    assert (int(out.loc[3, "day"]), int(out.loc[3, "gap_days"])) \
        == (3, 1)


def test_irreversibility_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["irreversibility"](
        _orders_days([1.00, 2.00, 3.00, 4.00, 1.00], "s109ir_")) \
        .to_pandas().iloc[0]
    # triples: up-up, up-up, (4,1 drop) -> n_up=2, n_down=0
    assert (int(out["n_triples"]), int(out["n_up2"]),
            int(out["n_down2"]), int(out["phi_milli"])) \
        == (3, 2, 0, 1000)


def test_lorenz_crossing_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s109lc_")
    pd.DataFrame({
        "o_orderstatus": ["F", "F", "O", "O"],
        "o_totalprice": [1.00, 100.00, 40.00, 40.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["lorenz_crossing"](d).to_pandas().iloc[0]
    # diff signs: +, -, 0 -> exactly one crossing at v=40
    assert (int(out["n_crossings"]),
            int(out["first_crossing_v"])) == (1, 40)
