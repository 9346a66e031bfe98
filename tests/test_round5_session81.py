"""Round-5 session-81: Anderson-Darling two-sample, Bowker symmetry,
Grubbs outlier — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def _mini_ad(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s81ad_")
    pd.DataFrame({
        "o_orderstatus": ["F", "F", "O", "O", "P"],
        "o_totalprice": [10.00, 20.00, 10.00, 30.00, 99.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_anderson_darling_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["anderson_darling"](_mini_ad()).to_pandas().iloc[0]
    # F=[10,20], O=[10,30] (P row excluded); N=4, n_f=n_o=2
    # v=10: m=2, M=1, i=2 -> d = 4*1-2*2 = 0 -> 0
    # v=20: m=1, M=2, i=3 -> d = 8-6 = 2 -> 1e6*4 // (3*1) = 1333333
    # v=30: i=N, excluded.  s=1333333; ad = s // 4 = 333333
    assert (int(out["n_f"]), int(out["n_o"]),
            int(out["ad_micro"])) == (2, 2, 333_333)


def _mini_bowker(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s81bw_")
    base = pd.Timestamp("2024-01-01")
    m = pd.Timedelta(minutes=1)
    pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [1, 1, 1, 1],
        "ts": pd.Series([base, base + m, base + 2 * m, base + 3 * m]
                        ).astype("datetime64[us]"),
        "event_type": ["A", "B", "A", "C"],
    }).to_parquet(os.path.join(d, "events.parquet"))
    _cache["dir"] = d
    return d


def test_bowker_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["bowker_symmetry"](_mini_bowker()).to_pandas().iloc[0]
    # transitions A->B, B->A, A->C: pair {A,B} balanced -> 0,
    # pair {A,C}: (1-0)^2*1e6 // 1 = 1e6; df counts both pairs
    assert (int(out["n_trans"]), int(out["n_pairs"]),
            int(out["chi2_micro"])) == (3, 2, 1_000_000)


def _mini_grubbs(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s81gr_")
    base = pd.Timestamp("2024-01-01")
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(3)]
        ).astype("datetime64[us]"),
        "o_totalprice": [1.00, 2.00, 6.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_grubbs_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["grubbs_test"](_mini_grubbs()).to_pandas().iloc[0]
    # daily cents [100, 200, 600]: n=3, S=900, SS=410000
    # dev2 max at day 2: (1800-900)^2 = 810000
    # g2_nano = (1e9 * 2 * 810000) // (3 * (1230000 - 810000))
    assert (int(out["n_days"]), int(out["cents"])) == (3, 600)
    assert int(out["g2_nano"]) == (2 * 810_000 * 10 ** 9) // 1_260_000
