"""Round-5 session-78: records process, charset census, exponential
goodness-of-fit — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def _mini_days(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s78rc_")
    base = pd.Timestamp("2024-01-01")
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(4)]
        ).astype("datetime64[us]"),
        "o_totalprice": [1.00, 3.00, 2.00, 4.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_records_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["records_process"](_mini_days()).to_pandas().iloc[0]
    # [100,300,200,400]: records at days 1, 2, 4
    assert (int(out["n_days"]), int(out["n_records"])) == (4, 3)
    assert int(out["expected_micro"]) == 2_083_333


def _mini_docs(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s78cs_")
    pd.DataFrame({
        "lang": ["en", "en", "fr"],
        "text": ["aab", "ba", "ccdd"],
    }).to_parquet(os.path.join(d, "documents.parquet"))
    _cache["dir"] = d
    return d


def test_charset_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["charset_census"](_mini_docs()).to_pandas()
    m = {r["lang"]: (int(r["n_distinct_chars"]), int(r["total_chars"]),
                     r["top_char"], int(r["top_count"]))
         for _, r in out.iterrows()}
    assert m["en"] == (2, 5, "a", 3)
    assert m["fr"] == (2, 4, "c", 2)   # c/d tie -> lexicographic


def _mini_events(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s78ev_")
    base = pd.Timestamp("2024-01-01")
    secs = [0, 10, 20, 50]
    pd.DataFrame({
        "user_id": [1] * 4,
        "ts": pd.Series([base + pd.Timedelta(seconds=s) for s in secs]
                        ).astype("datetime64[us]"),
        "event_id": list(range(4)),
    }).to_parquet(os.path.join(d, "events.parquet"))
    _cache["dir"] = d
    return d


def test_exp_gof_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["exp_gof"](_mini_events()).to_pandas().iloc[0]
    # gaps [10,10,30]: n=3 S=50
    assert (int(out["n_gaps"]), int(out["sum_gap_s"])) == (3, 50)
    f10 = math.floor(1_000_000 * (1 - math.exp(-(3 * 10) / 50)))
    f30 = math.floor(1_000_000 * (1 - math.exp(-(3 * 30) / 50)))
    d10 = abs(2_000_000 // 3 - f10)
    d30 = abs(1_000_000 - f30)
    assert int(out["d_micro"]) == max(d10, d30)
    assert int(out["argmax_gap_s"]) == (10 if d10 >= d30 else 30)
