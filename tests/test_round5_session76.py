"""Round-5 session-76: Allen interval census, two-way ANOVA ledger,
pinball-loss forecast eval — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def _mini_events(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s76ev_")
    # window = [8, 12] (lo=0, hi=20 -> mid=10)
    spans = {1: (0, 20), 2: (0, 5), 3: (0, 8), 4: (8, 12), 5: (9, 11),
             6: (9, 15), 7: (12, 20), 8: (14, 20)}
    base = pd.Timestamp("2024-01-01")
    rows = [(u, base + pd.Timedelta(days=dd))
            for u, (f, l) in spans.items() for dd in (f, l)]
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.Series([r[1] for r in rows]).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "events.parquet"))
    _cache["dir"] = d
    return d


def test_allen_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["allen_relations"](_mini_events()).to_pandas()
    m = dict(zip(out["relation"], out["n_users"].astype(int)))
    assert m["contains"] == 1      # (0,20)
    assert m["before"] == 1        # (0,5)
    assert m["meets"] == 1         # (0,8)
    assert m["equals"] == 1        # (8,12)
    assert m["during"] == 1        # (9,11)
    assert m["overlapped_by"] == 1  # (9,15)
    assert m["met_by"] == 1        # (12,20)
    assert m["after"] == 1         # (14,20)
    assert sum(m.values()) == 8 and len(m) == 13


def _mini_lineitem(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s76li_")
    rows = [("A", "F", 1.0), ("A", "F", 3.0), ("A", "O", 2.0),
            ("B", "F", 5.0), ("B", "O", 4.0), ("B", "O", 6.0)]
    pd.DataFrame({
        "l_returnflag": [r[0] for r in rows],
        "l_linestatus": [r[1] for r in rows],
        "l_quantity": [r[2] for r in rows],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    _cache["dir"] = d
    return d


def test_anova_twoway_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["anova_twoway"](_mini_lineitem()).to_pandas().iloc[0]
    # SSA = 87e6-73.5e6, SSB = 75e6-73.5e6, SST = 91e6-73.5e6
    assert (int(out["n"]), int(out["levels_a"]),
            int(out["levels_b"])) == (6, 2, 2)
    assert int(out["ssa_micro"]) == 13_500_000
    assert int(out["ssb_micro"]) == 1_500_000
    assert int(out["sst_micro"]) == 17_500_000
    assert int(out["eta_a_milli"]) == 771
    assert int(out["eta_b_milli"]) == 85


def _mini_days(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s76pb_")
    base = pd.Timestamp("2024-01-01")
    days = [0, 1, 7, 8]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=x) for x in days]
        ).astype("datetime64[us]"),
        "o_totalprice": [1.00, 2.00, 3.00, 1.50],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_pinball_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["pinball_loss"](_mini_days()).to_pandas()
    m = {int(r["tau10"]): (int(r["n_days"]), int(r["loss_cents"]),
                           int(r["mean_loss_cents"]))
         for _, r in out.iterrows()}
    # diffs: +200 (day7 vs 0), -50 (day8 vs 1)
    assert m[5] == (2, 125, 62)    # 100 + 25
    assert m[9] == (2, 185, 92)    # 180 + 5
