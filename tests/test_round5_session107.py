"""Round-5 session-107: delimiter balance, lead-lag, circular dow —
hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_delimiter_balance_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s107db_")
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["(a) b", "(c", 'say "hi"', '"x'],
        "lang": ["en"] * 4, "source": ["s"] * 4})
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(os.path.join(d, "documents.parquet"))
    out = q.QUERIES["delimiter_balance"](d).to_pandas().iloc[0]
    assert (int(out["n_docs"]), int(out["n_balanced"]),
            int(out["n_imbalanced"]), int(out["total_excess"])) \
        == (4, 2, 2, 2)


def test_lead_lag_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s107ll_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    # nation0 (bigger): monthly dollars 10,20,10,20
    # nation1: 5,10,20,10 (= nation0 shifted one month)
    rows = []
    for i, v in enumerate([10.0, 20.0, 10.0, 20.0]):
        rows.append((1, f"1994-{i+1:02d}-05", v))
    for i, v in enumerate([5.0, 10.0, 20.0, 10.0]):
        rows.append((2, f"1994-{i+1:02d}-10", v))
    pd.DataFrame({
        "o_custkey": [r[0] for r in rows],
        "o_orderdate": pd.Series([pd.Timestamp(r[1]) for r in rows]
                                 ).astype("datetime64[us]"),
        "o_totalprice": [r[2] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["lead_lag"](d).to_pandas().iloc[0]
    assert (int(out["nation_a"]), int(out["nation_b"])) == (0, 1)
    # dA = [10,-10,10]; dB = [5,10,-10]
    # lag +1 pairs: (10,10), (-10,-10) -> perfect correlation
    assert int(out["r_pos1_milli"]) == 1000
    # contemporaneous pairs (10,5),(-10,10),(10,-10) -> negative
    assert int(out["r_0_milli"]) < 0


def test_circular_dow_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s107cd_")
    base = pd.Timestamp("1970-01-01")
    # all orders on epoch day 0 -> dow (0+3)%7 = 3
    pd.DataFrame({
        "o_orderdate": pd.Series([base] * 3).astype("datetime64[us]"),
        "o_totalprice": [1.00] * 3,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["circular_dow"](d).to_pandas().iloc[0]
    c = math.floor(1_000_000 * 3 * math.cos(2 * math.pi * 3 / 7))
    s = math.floor(1_000_000 * 3 * math.sin(2 * math.pi * 3 / 7))
    r = math.floor(1000 * math.sqrt(float(c * c + s * s))
                   / (1_000_000.0 * 3))
    assert (int(out["n"]), int(out["modal_dow"]),
            int(out["modal_n"])) == (3, 3, 3)
    assert int(out["r_milli"]) == r
    assert 999 <= r <= 1000
