"""Round-5 session-89: checkpoint plan, Poisson line-count fit,
retention half-life — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_checkpoint_plan_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s89cp_")
    base = pd.Timestamp("2024-01-01")
    pd.DataFrame({
        "event_type": ["error", "view", "error", "error"],
        "ts": pd.Series([base, base + pd.Timedelta(seconds=30),
                         base + pd.Timedelta(seconds=60),
                         base + pd.Timedelta(seconds=240)]
                        ).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "events.parquet"))
    out = q.QUERIES["checkpoint_plan"](d).to_pandas().iloc[0]
    # errors at 0/60/240 s: span 240, 2 gaps, MTBF 120
    # tau = floor(sqrt(120*240/2)) = floor(sqrt(14400)) = 120
    assert (int(out["n_errors"]), int(out["n_gaps"]),
            int(out["sum_gap_s"]), int(out["tau_s"])) == (3, 2, 240, 120)
    assert int(out["overhead_ppm"]) == 500_000


def test_poisson_fit_lines_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s89pf_")
    pd.DataFrame({"l_orderkey": [1, 2, 3, 3]}).to_parquet(
        os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["poisson_fit_lines"](d).to_pandas() \
        .set_index("k")
    # orders 1,2 have k=1; order 3 has k=2: n=3, m=4, lambda=4/3
    lam = 4 / 3
    e1 = math.floor(1_000_000 * math.exp(-lam) * lam ** 1 / 1)
    e2 = math.floor(1_000_000 * math.exp(-lam) * lam ** 2 / 2)
    assert (int(out.loc[1, "obs"]), int(out.loc[1, "exp_micro"])) \
        == (2, e1)
    assert (int(out.loc[2, "obs"]), int(out.loc[2, "exp_micro"])) \
        == (1, e2)


def test_retention_halflife_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s89rh_")
    base = pd.Timestamp("1970-01-01")
    rows = [("A", 0), ("A", 7), ("A", 14), ("B", 0), ("C", 14)]
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.Series([base + pd.Timedelta(days=r[1])
                         for r in rows]).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "events.parquet"))
    out = q.QUERIES["retention_halflife"](d).to_pandas().iloc[0]
    # cohorts: w0 = {A,B}, w2 = {C}; maxw = 2
    # k=1: active {A}, eligible {A,B} -> r = 1/2; k=2 same
    # two equal points -> slope 0, no decay measurable
    assert (int(out["k_points"]), int(out["slope_milli"]),
            int(out["halflife_milli_weeks"])) == (2, 0, 0)
    assert int(out["r1_ppm"]) == 500_000
