"""Round-5 session-68: cuckoo-filter bucket census, turning-points
randomness test, inspection-paradox audit — hand-computed pins."""

from __future__ import annotations

import hashlib
import os
import tempfile

import pandas as pd


def _mini_docs(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s68doc_")
    pd.DataFrame({"doc_id": list(range(1, 9))}).to_parquet(
        os.path.join(d, "documents.parquet"))
    _cache["dir"] = d
    return d


def test_cuckoo_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["cuckoo_audit"](_mini_docs()).to_pandas()
    # independent reference: hashlib md5 over the decimal doc_id string
    exp_p, exp_a = {}, {}
    for i in range(1, 9):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        fp = h % 251 + 1
        i1 = h % 64
        i2 = i1 ^ ((fp * 101) % 64)
        exp_p[i1] = exp_p.get(i1, 0) + 1
        exp_a[i2] = exp_a.get(i2, 0) + 1
    got_p = {int(r["bucket"]): int(r["n_primary"])
             for _, r in out.iterrows() if r["n_primary"]}
    got_a = {int(r["bucket"]): int(r["n_alt"])
             for _, r in out.iterrows() if r["n_alt"]}
    assert got_p == exp_p and got_a == exp_a
    assert (out["n_candidates"] == out["n_primary"] + out["n_alt"]).all()
    assert int(out["over_capacity"].sum()) == sum(
        1 for v in exp_p.values() if v > 4)


def _mini_orders(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s68or_")
    days = pd.to_datetime(
        ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
         "2024-01-05", "2024-01-06"]).astype("datetime64[us]")
    pd.DataFrame({
        "o_orderdate": days,
        "o_totalprice": [0.10, 0.30, 0.20, 0.20, 0.40, 0.10],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_turning_points_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["turning_points"](_mini_orders()).to_pandas().iloc[0]
    # series 10,30,20,20,40,10: peaks at 30 and 40 only (ties break
    # the strict pattern at positions 2 and 3) -> T=2, n=6
    assert (int(out["n_days"]), int(out["t_points"])) == (6, 2)
    # D = 3*2 - 2*4 = -2; z2 = 10000*4 // 67 = 597
    assert int(out["z2_milli"]) == 597


def _mini_events(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s68ev_")
    base = pd.Timestamp("2024-01-01")
    rows = [(1, 0), (1, 10), (1, 40), (2, 0), (2, 5)]
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.Series([base + pd.Timedelta(seconds=r[1])
                         for r in rows]).astype("datetime64[us]"),
        "event_id": list(range(len(rows))),
    }).to_parquet(os.path.join(d, "events.parquet"))
    _cache["dir"] = d
    return d


def test_length_bias_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["length_bias"](_mini_events()).to_pandas().iloc[0]
    # gaps: u1 -> 10, 30; u2 -> 5. n=3 S=45 Q=1025
    assert (int(out["n_gaps"]), int(out["sum_gap_s"])) == (3, 45)
    assert int(out["mean_gap_s"]) == 15
    assert int(out["biased_mean_s"]) == 22          # 1025 // 45
    assert int(out["bias_milli"]) == 1518           # 3075000 // 2025
