"""Round-5 session-93: reserve price, ABC-XYZ, monetary-unit
sampling — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_reserve_price_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s93rp_")
    pd.DataFrame({"o_totalprice": [1.00, 2.00, 3.00]}).to_parquet(
        os.path.join(d, "orders.parquet"))
    out = q.QUERIES["reserve_price"](d).to_pandas().iloc[0]
    # revenue: 300*1=300, 200*2=400, 100*3=300 -> reserve 200
    assert (int(out["n"]), int(out["reserve_cents"]),
            int(out["revenue_cents"])) == (3, 200, 400)
    assert int(out["capture_ppm"]) == (1_000_000 * 400) // 600


def test_abc_xyz_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s93ax_")
    pd.DataFrame({
        "l_partkey": [1, 1, 2],
        "l_quantity": [10.0, 10.0, 5.0],
        "l_extendedprice": [40.00, 40.00, 1.00],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["abc_xyz"](d).to_pandas()
    m = {(r["class_abc"], r["class_xyz"]):
         (int(r["n_parts"]), int(r["revenue_cents"]))
         for _, r in out.iterrows()}
    # p1 (8000c, zero-variance demand) -> A/X; p2 (100c, single
    # line) -> C/X
    assert m == {("A", "X"): (1, 8000), ("C", "X"): (1, 100)}


def test_mus_sampling_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s93mu_")
    base = pd.Timestamp("1970-01-01")
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(3)]
        ).astype("datetime64[us]"),
        "o_totalprice": [1.00, 2.00, 3.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["mus_sampling"](d).to_pandas().iloc[0]
    # S=600, I=12: every day straddles a multiple -> all selected
    assert (int(out["n_days"]), int(out["interval_cents"]),
            int(out["n_selected"])) == (3, 12, 3)
    assert (int(out["selected_cents"]),
            int(out["coverage_ppm"])) == (600, 1_000_000)
