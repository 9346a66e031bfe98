"""Round-5 session-143: ACF half-life, brand substitution, down
streak — pins and mirrors."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_acf_halflife_mirror():
    import dug_ray.queries as q
    from dug_ray.queries import _acf_k, _tdiv, _daily_cents
    sf = "/root/testdata/sf0.001"
    out = q.QUERIES["acf_halflife"](sf).to_pandas().iloc[0]
    h = _daily_cents(sf)
    x = [int(v) // 100 for v in h["cents"]]
    k0 = _acf_k(x, 0)
    r1 = _tdiv(1000 * _acf_k(x, 1), k0)
    assert int(out["r1_milli"]) == r1
    assert 0 <= int(out["halflife_lag"]) <= 20


def test_brand_substitution_sanity():
    import dug_ray.queries as q
    out = q.QUERIES["brand_substitution"]("/root/testdata/sf0.001") \
        .to_pandas().iloc[0]
    assert out["brand_a"] != out["brand_b"]
    assert -1000 <= int(out["r_milli"]) <= 1000
    assert int(out["k_months"]) > 0


def test_down_streak_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s143ds_")
    base = pd.Timestamp("1970-01-01")
    vals = [5.00, 4.00, 2.00, 5.00, 4.00]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(5)]
        ).astype("datetime64[us]"),
        "o_totalprice": vals,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["down_streak"](d).to_pandas().iloc[0]
    # d = [-1,-2,3,-1]: max down streak 2; downs 3 of 4
    assert (int(out["n_changes"]), int(out["max_down_streak"])) \
        == (4, 2)
    assert int(out["down_share_ppm"]) == 750_000
    exp = math.floor(1000 * math.log(4.0) / math.log(4 / 3.0))
    assert int(out["expected_milli"]) == exp
