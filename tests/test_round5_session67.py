"""Round-5 session-67: Friedman rank test, Bartlett log-variance test,
Youden-J threshold sweep — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def _mini_events(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s67ev_")
    # u0: a=3 b=1 c=2; u1: a=2 b=2 c=0 (zero-fill exercises the grid)
    rows = [(0, "a")] * 3 + [(0, "b")] + [(0, "c")] * 2 \
        + [(1, "a")] * 2 + [(1, "b")] * 2
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "event_type": [r[1] for r in rows],
    }).to_parquet(os.path.join(d, "events.parquet"))
    _cache["dir"] = d
    return d


def test_friedman_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["friedman_test"](_mini_events()).to_pandas()
    m = {r["event_type"]: int(r["rank_sum2"]) for _, r in out.iterrows()}
    # u0 ranks (doubled): a=6 b=2 c=4; u1: c=2, a=b tied -> 5 each
    assert m == {"a": 11, "b": 7, "c": 6}
    assert set(out["n_blocks"]) == {2}
    # q = (3000*(121+49+36)) // (2*3*4) - 3000*2*4 = 25750 - 24000
    assert set(out["q_milli"]) == {1750}


def _mini_lineitem(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s67li_")
    pd.DataFrame({
        "l_returnflag": ["A"] * 6 + ["B"] * 4,
        "l_quantity": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0,
                       2.0, 4.0, 6.0, 8.0],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    _cache["dir"] = d
    return d


def test_bartlett_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["bartlett_test"](_mini_lineitem()).to_pandas()
    m = {r["flag"]: r for _, r in out.iterrows()}
    # A: n=6 S=21 SS=91 -> var = 1e6*105//30 = 3500000
    # B: n=4 S=20 SS=120 -> var = 1e6*80//12 = 6666666
    assert int(m["A"]["var_micro"]) == 3_500_000
    assert int(m["B"]["var_micro"]) == 6_666_666
    ln_a = math.floor(math.log(3_500_000 / 1_000_000) * 1_000_000)
    ln_b = math.floor(math.log(6_666_666 / 1_000_000) * 1_000_000)
    assert int(m["A"]["ln_var_micro"]) == ln_a
    assert int(m["B"]["ln_var_micro"]) == ln_b
    # w = (91e6 - 73.5e6) + (120e6 - 100e6) = 37.5e6; sp2 = //8
    sp2 = 37_500_000 // 8
    assert set(out["sp2_micro"]) == {sp2}
    ln_p = math.floor(math.log(sp2 / 1_000_000) * 1_000_000)
    assert set(out["t_micro"]) == {8 * ln_p - (5 * ln_a + 3 * ln_b)}


def _mini_orders(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s67or_")
    pd.DataFrame({
        "o_totalprice": [400.0, 300.0, 200.0, 100.0],
        "o_orderstatus": ["F", "O", "F", "O"],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_youden_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["youden_j"](_mini_orders()).to_pandas().iloc[0]
    # J(400)=500000 (tp1 fp0); J(200)=500000 (tp2 fp1) -> tie,
    # highest threshold wins
    assert int(out["thr"]) == 400
    assert (int(out["tp"]), int(out["fp"])) == (1, 0)
    assert (int(out["pos"]), int(out["neg"])) == (2, 2)
    assert int(out["j_micro"]) == 500_000
