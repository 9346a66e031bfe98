"""Round-5 session-83: tail dependence, extremal index, permutation
entropy — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def _orders(rows, prefix, _cache={}):
    key = (prefix, tuple(rows))
    if key in _cache:
        return _cache[key]
    d = tempfile.mkdtemp(prefix=prefix)
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(rows, columns=["day", "o_totalprice"])
    df["o_orderdate"] = (base + pd.to_timedelta(df.pop("day"), unit="D")) \
        .astype("datetime64[us]")
    df.to_parquet(os.path.join(d, "orders.parquet"))
    _cache[key] = d
    return d


def test_tail_dependence_hand_pin():
    import dug_ray.queries as q
    rows = [(0, 1.00), (1, 2.00), (2, 3.00), (3, 4.00),
            (4, 2.50), (4, 2.50)]
    out = q.QUERIES["tail_dependence"](
        _orders(rows, "s83td_")).to_pandas().iloc[0]
    # daily cents [100,200,300,400,500], cnt [1,1,1,1,2]; n=5
    # 90th pct thresholds: cents 500, cnt 2 -> top sets both = {day4}
    assert (int(out["n_days"]), int(out["n_rev_top"]),
            int(out["n_cnt_top"]), int(out["n_both"])) == (5, 1, 1, 1)
    assert int(out["lambda_ppm"]) == 1_000_000
    assert int(out["indep_ppm"]) == 200_000


def test_extremal_index_hand_pin():
    import dug_ray.queries as q
    vals = [9.00, 8.00, 1.00, 1.00, 1.00, 7.00, 1.00, 1.00, 1.00, 1.00]
    rows = [(i, v) for i, v in enumerate(vals)]
    out = q.QUERIES["extremal_index"](
        _orders(rows, "s83ei_")).to_pandas().iloc[0]
    # sorted cents [100x7,700,800,900]; thr: 10*cum >= 90 -> 9th = 800
    # exceed days {0, 1}; gap 1 <= 2 -> one cluster
    assert (int(out["n_exceed"]), int(out["n_clusters"]),
            int(out["threshold_cents"])) == (2, 1, 800)
    assert int(out["theta_milli"]) == 500


def test_perm_entropy_hand_pin():
    import dug_ray.queries as q
    rows = [(0, 1.00), (1, 2.00), (2, 1.50), (3, 3.00)]
    out = q.QUERIES["perm_entropy"](
        _orders(rows, "s83pe_")).to_pandas().iloc[0]
    # triples (100,200,150) -> pat 4+2+0=6; (200,150,300) -> 0+2+1=3
    # s = 2 * floor(1e6 * ln(1/2)) = 2 * (-693148); h = 1386296 // 2
    assert (int(out["n_triples"]), int(out["top_pattern"]),
            int(out["top_n"])) == (2, 3, 1)
    assert int(out["h_micro"]) == -math.floor(1_000_000 * math.log(0.5))
