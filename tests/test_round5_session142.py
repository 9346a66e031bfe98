"""Round-5 session-142: spikiness league, omega ratio, latency by
size — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_spikiness_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s142sp_")
    rows = [("1994-01-01", 1.00), ("1994-01-02", 1.00),
            ("1994-01-03", 5.00), ("1994-02-01", 2.00),
            ("1994-02-02", 2.00)]
    pd.DataFrame({
        "o_orderdate": pd.Series([pd.Timestamp(r[0]) for r in rows]
                                 ).astype("datetime64[us]"),
        "o_totalprice": [r[1] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["spikiness_league"](d).to_pandas()
    m = {int(r["ym"]): (int(r["max_cents"]), int(r["median_cents"]),
                        int(r["ratio_milli"]))
         for _, r in out.iterrows()}
    jan = 1994 * 12 + 0
    feb = 1994 * 12 + 1
    # jan: daily [100,100,500], median 100, ratio 5000
    assert m[jan] == (500, 100, 5000)
    assert m[feb] == (200, 200, 1000)


def test_omega_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s142om_")
    base = pd.Timestamp("1970-01-01")
    vals = [1.00, 3.00, 2.00, 5.00]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(4)]
        ).astype("datetime64[us]"),
        "o_totalprice": vals,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["omega_ratio"](d).to_pandas().iloc[0]
    # d = [2,-1,3]: gains 5, losses 1, ups 2 of 3
    assert (int(out["n_changes"]), int(out["gains_d"]),
            int(out["losses_d"])) == (3, 5, 1)
    assert int(out["omega_milli"]) == 5000
    assert int(out["up_share_ppm"]) == 666_666


def test_latency_by_size_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s142ls_")
    base = pd.Timestamp("1994-01-01")
    pd.DataFrame({
        "o_orderkey": [1],
        "o_orderdate": pd.Series([base]).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "orders.parquet"))
    pd.DataFrame({
        "l_orderkey": [1, 1, 1],
        "l_shipdate": pd.Series(
            [base + pd.Timedelta(days=2), base + pd.Timedelta(days=9),
             base + pd.Timedelta(days=30)]).astype("datetime64[us]"),
        "l_quantity": [5.0, 20.0, 40.0],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["latency_by_size"](d).to_pandas() \
        .set_index("band")
    assert int(out.loc["small", "p90"]) == 2
    assert int(out.loc["mid", "p90"]) == 9
    assert int(out.loc["large", "p90"]) == 30
