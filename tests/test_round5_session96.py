"""Round-5 session-96: brevity law, chain-ladder factors, hazard
slope — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_brevity_law_mirror():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s96bl_")
    df = pd.DataFrame({
        "doc_id": [1], "text": ["aa aa b"], "lang": ["en"],
        "source": ["s"], "n_chars": [7]})
    df.to_parquet(os.path.join(d, "documents.parquet"))
    out = q.QUERIES["brevity_law"](d).to_pandas().iloc[0]
    # terms: 'aa' f=2 len2, 'b' f=1 len1
    xs = [math.floor(1000 * math.log(2)), 0]
    ys = [2000, 1000]
    k, sx, sy = 2, sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (1000 * (k * sxy - sx * sy)) // (k * sxx - sx * sx)
    assert (int(out["k_terms"]), int(out["slope_milli"])) == (2, slope)
    # frequent term is LONGER here -> positive slope
    assert slope > 0


def test_chain_ladder_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s96cl_")
    pd.DataFrame({
        "o_orderkey": [1, 2],
        "o_orderdate": pd.Series(
            [pd.Timestamp("1994-01-15"), pd.Timestamp("1994-02-10")]
        ).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "orders.parquet"))
    pd.DataFrame({
        "l_orderkey": [1, 1, 2],
        "l_shipdate": pd.Series(
            [pd.Timestamp("1994-01-20"), pd.Timestamp("1994-02-05"),
             pd.Timestamp("1994-02-20")]).astype("datetime64[us]"),
        "l_extendedprice": [1.00, 0.50, 2.00],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["chain_ladder"](d).to_pandas()
    # cohort Jan: cum a0=100, a1=150; cohort Feb: a0=200 (too young)
    # age 0 factor over eligible {Jan}: 1000*150//100 = 1500
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r["age"]), int(r["n_cohorts"]),
            int(r["f_milli"])) == (0, 1, 1500)


def test_hazard_slope_mirror():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s96hs_")
    base = pd.Timestamp("1970-01-01")
    rows = [(1, 0), (1, 2), (2, 5), (2, 7), (3, 0),
            (4, 0), (4, 10)]
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.Series([base + pd.Timedelta(days=r[1])
                         for r in rows]).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "events.parquet"))
    out = q.QUERIES["hazard_slope"](d).to_pandas().iloc[0]
    # deaths: t=0 (1 of 4), t=2 (2 of 3)
    pts = [(0, math.floor(1000 * math.log(1 / 4))),
           (2, math.floor(1000 * math.log(2 / 3)))]
    k = 2
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] ** 2 for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    num = 1000 * (k * sxy - sx * sy)
    den = k * sxx - sx * sx
    slope = -((-num) // den) if num < 0 else num // den
    assert (int(out["k_points"]), int(out["slope_milli"])) == (2, slope)
    # hazard RISES from 1/4 to 2/3 -> positive slope
    assert slope > 0
