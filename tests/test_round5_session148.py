"""Round-5 session-148: price bunching, chain drift, surcharge
census — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_price_bunching_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s148pb_")
    pd.DataFrame({
        "o_totalprice": [95.00, 99.00, 103.00, 199.00, 150.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["price_bunching"](d).to_pandas().iloc[0]
    # residues 95,99,3,99,50: below 3, above 1
    assert (int(out["n_below"]), int(out["n_above"])) == (3, 1)
    assert int(out["ratio_milli"]) == 3000
    assert int(out["chi2_micro"]) == (1_000_000 * 4) // 4


def test_chain_drift_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s148cd_")
    rows = [(1, "1994-05-01", 1.00), (1, "1995-05-01", 1.15),
            (1, "1996-05-01", 1.33)]
    pd.DataFrame({
        "l_partkey": [r[0] for r in rows],
        "l_shipdate": pd.Series([pd.Timestamp(r[1]) for r in rows]
                                ).astype("datetime64[us]"),
        "l_quantity": [1.0] * 3,
        "l_extendedprice": [r[2] for r in rows],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["chain_drift"](d).to_pandas().iloc[0]
    # L01=1150, L12=1156, chained=1329; direct 1330 -> drift -1
    assert (int(out["y0"]), int(out["ym"]), int(out["y1"])) \
        == (1994, 1995, 1996)
    assert (int(out["l_direct"]), int(out["l_chained"]),
            int(out["drift_milli"])) == (1330, 1329, -1)


def test_surcharge_census_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s148sc_")
    rows = [(1, 1.0, 1.00), (1, 2.0, 2.40),
            (2, 1.0, 1.00), (2, 2.0, 1.60)]
    pd.DataFrame({
        "l_partkey": [r[0] for r in rows],
        "l_quantity": [r[1] for r in rows],
        "l_extendedprice": [r[2] for r in rows],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["surcharge_census"](d).to_pandas().iloc[0]
    # p1 unit 100->120 (surcharge); p2 unit 100->80 (discount)
    assert (int(out["n_parts_eval"]), int(out["n_surcharge"]),
            int(out["surcharge_ppm"])) == (2, 1, 500_000)
