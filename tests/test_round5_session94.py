"""Round-5 session-94: restricted mean survival, Kendall's W, gap
memory — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_rmst_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s94rm_")
    base = pd.Timestamp("1970-01-01")
    # A: 0->2 (death t=2), B: 5->7 (death t=2), C: 0 (death t=0),
    # D: 0->10 (censored, l >= m-2)
    rows = [(1, 0), (1, 2), (2, 5), (2, 7), (3, 0),
            (4, 0), (4, 10)]
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.Series([base + pd.Timedelta(days=r[1])
                         for r in rows]).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "events.parquet"))
    out = q.QUERIES["rmst"](d).to_pandas().iloc[0]
    assert (int(out["n_users"]), int(out["n_steps"])) == (4, 2)
    # ledger: t=0 at-risk 4 d=1; t=2 at-risk 3 d=2
    lg0 = math.floor(math.log(3 / 4) * 1_000_000)
    lg2 = lg0 + math.floor(math.log(1 / 3) * 1_000_000)
    s0 = math.floor(1000 * math.exp(lg0 / 1_000_000.0))
    s2 = math.floor(1000 * math.exp(lg2 / 1_000_000.0))
    exp = 1000 * 0 + s0 * (2 - 0) + s2 * (28 - 2)
    assert int(out["rmst_milli_days"]) == exp


def test_kendall_w_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s94kw_")
    pd.DataFrame({"n_nationkey": [0, 1],
                  "n_name": ["A", "B"]}).to_parquet(
        os.path.join(d, "nation.parquet"))
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    pd.DataFrame({
        "o_custkey": [1, 2, 1, 2],
        "o_orderdate": pd.Series(
            [pd.Timestamp("1994-06-01"), pd.Timestamp("1994-07-01"),
             pd.Timestamp("1995-06-01"), pd.Timestamp("1995-07-01")]
        ).astype("datetime64[us]"),
        "o_totalprice": [2.00, 1.00, 3.00, 0.50],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["kendall_w"](d).to_pandas().iloc[0]
    # both years rank nation0 first -> perfect concordance
    assert (int(out["k_years"]), int(out["n_nations"]),
            int(out["w_ppm"])) == (2, 2, 1_000_000)


def test_gap_memory_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s94gm_")
    base = pd.Timestamp("2024-01-01")
    secs = [0, 10, 30, 70]
    pd.DataFrame({
        "user_id": [1] * 4,
        "event_id": list(range(4)),
        "ts": pd.Series([base + pd.Timedelta(seconds=s) for s in secs]
                        ).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "events.parquet"))
    out = q.QUERIES["gap_memory"](d).to_pandas().iloc[0]
    # gaps [10,20,40]; pairs (10,20),(20,40): perfect memory
    assert (int(out["n_pairs"]), int(out["m_milli"])) == (2, 1000)
