"""Round-5 session-70: isotonic minimax regression, Jonckheere trend,
capture-recapture — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def _mini_orders(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s70or_")
    base = pd.Timestamp("2024-01-01")
    dates = pd.Series([base + pd.Timedelta(days=30 * i)
                       for i in range(4)]).astype("datetime64[us]")
    pd.DataFrame({
        "o_orderdate": dates,
        "o_totalprice": [3.00, 1.00, 2.00, 4.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_isotonic_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["isotonic_fit"](_mini_orders()).to_pandas() \
        .sort_values("bucket").reset_index(drop=True)
    # y = [300,100,200,400] cents -> PAVA pools the first three to 200
    assert list(out["cents"]) == [300, 100, 200, 400]
    assert list(out["fit_cents"]) == [200, 200, 200, 400]
    # monotone by construction
    assert (out["fit_cents"].diff().dropna() >= 0).all()


def _mini_lineitem(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s70li_")
    pd.DataFrame({
        "l_returnflag": ["A", "A", "B", "B"],
        "l_quantity": [1.0, 2.0, 2.0, 3.0],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    _cache["dir"] = d
    return d


def test_jonckheere_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["jonckheere_trend"](_mini_lineitem()) \
        .to_pandas().iloc[0]
    # A=[1,2] vs B=[2,3]: gt pairs (1,2),(1,3),(2,3) -> 6; tie (2,2) -> 1
    assert (int(out["n_total"]), int(out["k_groups"])) == (4, 2)
    assert int(out["j2"]) == 7
    assert int(out["e2"]) == 4        # (16 - 8) // 2
    assert int(out["diff2"]) == 3


def _mini_events(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s70ev_")
    base = pd.Timestamp("2024-01-01")
    rows = [(1, 0), (1, 10), (2, 2), (3, 7), (4, 3), (4, 8)]
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.Series([base + pd.Timedelta(days=r[1])
                         for r in rows]).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "events.parquet"))
    _cache["dir"] = d
    return d


def test_capture_recapture_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["capture_recapture"](_mini_events()) \
        .to_pandas().iloc[0]
    # mid = 5: s1 = {u1,u2,u4}, s2 = {u1,u3,u4}, overlap = {u1,u4}
    assert (int(out["n1"]), int(out["n2"]), int(out["overlap"])) \
        == (3, 3, 2)
    assert int(out["true_n"]) == 4
    assert int(out["nhat"]) == 4      # 9 // 2
    assert int(out["chapman"]) == 4   # 16 // 3 - 1
