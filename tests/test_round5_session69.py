"""Round-5 session-69: Greenwood variance ledger, POT/GPD moment fit,
embargoed blocked CV audit — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def _mini_events(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s69ev_")
    spans = {0: (0, 5), 1: (0, 3), 2: (0, 8), 3: (0, 9), 4: (0, 10),
             5: (0, 2)}
    base = pd.Timestamp("2024-01-01")
    rows = [(u, base + pd.Timedelta(days=dd))
            for u, (f, l) in spans.items() for dd in (f, l)]
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.Series([r[1] for r in rows]).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "events.parquet"))
    _cache["dir"] = d
    return d


def test_greenwood_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["greenwood_var"](_mini_events()).to_pandas()
    m = {int(r["t"]): (int(r["n_at_risk"]), int(r["deaths"]),
                       int(r["censored"]), int(r["greenwood_pico"]))
         for _, r in out.iterrows()}
    # deaths at t=2 (n=6), t=3 (n=5), t=5 (n=4); cens at 8/9/10
    # terms: 1e12//30, 1e12//20, 1e12//12
    assert m[2] == (6, 1, 0, 33_333_333_333)
    assert m[3] == (5, 1, 0, 83_333_333_333)
    assert m[5] == (4, 1, 0, 166_666_666_666)
    assert m[8] == (3, 0, 1, 166_666_666_666)
    assert m[10] == (1, 0, 1, 166_666_666_666)


def _mini_orders(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s69or_")
    pd.DataFrame({
        "o_totalprice": [400010.0, 400020.0, 400030.0, 100.0],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_pot_gpd_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["pot_gpd"](_mini_orders()).to_pandas().iloc[0]
    # excesses [10,20,30]: m=20 s2=100 -> xi=(1-4)/2=-1.5, sigma=50
    assert (int(out["n_exceed"]), int(out["sum_excess"]),
            int(out["sumsq_excess"])) == (3, 60, 1400)
    assert int(out["xi_micro"]) == -1_500_000
    assert int(out["sigma_milli"]) == 50_000


def _mini_days(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s69cv_")
    days = pd.to_datetime(
        [pd.Timestamp("2024-01-01") + pd.Timedelta(days=i)
         for i in range(8)]).astype("datetime64[us]")
    pd.DataFrame({"o_orderdate": days}).to_parquet(
        os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_embargo_cv_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["embargo_cv"](_mini_days()).to_pandas()
    m = {int(r["fold"]): (int(r["n_test"]), int(r["n_embargo"]),
                          int(r["n_train"]))
         for _, r in out.iterrows()}
    # 8 days, one row each; folds = day//2; embargo 3 days each side
    assert m[0] == (2, 3, 3)
    assert m[1] == (2, 5, 1)
    assert m[2] == (2, 5, 1)
    assert m[3] == (2, 3, 3)
