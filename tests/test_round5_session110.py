"""Round-5 session-110: revenue pace, recovery time, tail-bound
audit — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_revenue_pace_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s110rp_")
    rows = [("1994-02-01", 1.00), ("1994-02-02", 1.00),
            ("1994-02-03", 1.00), ("1994-02-04", 1.00)]
    pd.DataFrame({
        "o_orderdate": pd.Series([pd.Timestamp(r[0]) for r in rows]
                                 ).astype("datetime64[us]"),
        "o_totalprice": [r[1] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["revenue_pace"](d).to_pandas()
    m = {(int(r["yr"]), int(r["q"])): int(r["pace_days"])
         for _, r in out.iterrows()}
    assert m == {(1994, 25): 0, (1994, 50): 1, (1994, 75): 2}


def test_recovery_time_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s110rt_")
    base = pd.Timestamp("1970-01-01")
    vals = [1.00, 0.50, 0.60, 2.00, 1.50]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(len(vals))]
        ).astype("datetime64[us]"),
        "o_totalprice": vals,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["recovery_time"](d).to_pandas().iloc[0]
    # records at positions 1 and 4: one completed spell of 2 days,
    # one trailing day underwater
    assert (int(out["n_days"]), int(out["n_records"]),
            int(out["n_spells"]), int(out["max_spell_days"]),
            int(out["trailing_days"])) == (5, 2, 2, 2, 1)


def test_tail_bound_audit_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s110tb_")
    pd.DataFrame({
        "o_totalprice": [10.00] * 4 + [100.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["tail_bound_audit"](d).to_pandas().set_index("k")
    # sd ~ 40.2 dollars: nothing beyond 2 or 3 sigma here
    assert (int(out.loc[2, "obs_ppm"]),
            int(out.loc[3, "obs_ppm"])) == (0, 0)
    assert int(out.loc[2, "chebyshev_ppm"]) == 250_000
    assert int(out.loc[2, "cantelli_ppm"]) == 200_000
    assert int(out.loc[3, "chebyshev_ppm"]) == 111_111
    assert int(out.loc[3, "cantelli_ppm"]) == 100_000
