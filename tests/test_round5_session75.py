"""Round-5 session-75: Cochran-Mantel-Haenszel, Goodman-Kruskal lambda,
Somers' D — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def _mini_cmh(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s75cmh_")
    rows = [("A", 300000.0, "F"), ("A", 300000.0, "F"),
            ("A", 300000.0, "O"), ("A", 100000.0, "F"),
            ("A", 100000.0, "O"), ("A", 100000.0, "O"),
            ("B", 300000.0, "F"), ("B", 100000.0, "O")]
    pd.DataFrame({
        "o_orderpriority": [r[0] for r in rows],
        "o_totalprice": [r[1] for r in rows],
        "o_orderstatus": [r[2] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_cmh_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["cmh_test"](_mini_cmh()).to_pandas().iloc[0]
    # A: a=2 E=1.5e6 V=450000; B: a=1 E=0.5e6 V=250000
    assert int(out["k_strata"]) == 2
    assert int(out["sum_a"]) == 3
    assert int(out["e_micro"]) == 2_000_000
    assert int(out["v_micro"]) == 700_000
    assert int(out["chi2_milli"]) == 1428   # 1e15 // 7e11


def _mini_lambda(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s75gk_")
    rows = [("A", "F")] * 4 + [("A", "O")] + [("B", "O")] * 3 \
        + [("B", "P")] * 2
    pd.DataFrame({
        "o_orderpriority": [r[0] for r in rows],
        "o_orderstatus": [r[1] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_gk_lambda_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["gk_lambda"](_mini_lambda()).to_pandas().iloc[0]
    # row modals 4 + 3 = 7; column modal max(4,4,2) = 4; N = 10
    assert int(out["n"]) == 10
    assert int(out["modal_status"]) == 4
    assert int(out["sum_row_modal"]) == 7
    assert int(out["lambda_milli"]) == 500  # 3000 // 6


def _mini_somers(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s75sd_")
    pd.DataFrame({
        "l_discount": [0.00, 0.00, 0.01, 0.01],
        "l_quantity": [1.0, 1.0, 2.0, 1.0],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    _cache["dir"] = d
    return d


def test_somers_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["somers_d"](_mini_somers()).to_pandas().iloc[0]
    # C = 2 (the two x=0,y=1 rows vs x=1,y=2); D = 0
    # den = 16 - (4 + 4) = 8; d = 2000*2 // 8
    assert (int(out["concordant"]), int(out["discordant"])) == (2, 0)
    assert int(out["n"]) == 4
    assert int(out["d_milli"]) == 500
