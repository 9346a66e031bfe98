"""Round-5 session-145: region rollup, Bass diffusion, home bias —
pins and mirrors."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_region_rollup_sanity():
    import dug_ray.queries as q
    out = q.QUERIES["region_rollup"]("/root/testdata/sf0.001") \
        .to_pandas()
    assert len(out) == 5
    assert int(out["n_nations"].sum()) == 25
    assert int(out["revenue_cents"].sum()) > 0
    assert (out["n_customers"] >= 0).all()


def test_bass_diffusion_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s145bd_")
    base = pd.Timestamp("1970-01-01")
    # weekly adopters: w0: 2, w1: 1, w2: 1 (m=4)
    rows = [(1, 0), (2, 0), (3, 7), (4, 14)]
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.Series([base + pd.Timedelta(days=r[1])
                         for r in rows]).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "events.parquet"))
    out = q.QUERIES["bass_diffusion"](d).to_pandas().iloc[0]
    # points: x=0 y=5e5; x=2 y=5e5; x=3 y=1e6
    pts = [(0, 500_000), (2, 500_000), (3, 1_000_000)]
    k = 3
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] ** 2 for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    den = k * sxx - sx * sx
    num = k * sxy - sx * sy
    q_micro = (4 * num) // den
    p_micro = (den * sy - num * sx) // (k * den)
    assert (int(out["m_users"]), int(out["k_weeks"])) == (4, 3)
    assert int(out["q_micro"]) == q_micro
    assert int(out["p_micro"]) == p_micro


def test_home_bias_sanity():
    import dug_ray.queries as q
    out = q.QUERIES["home_bias"]("/root/testdata/sf0.001") \
        .to_pandas().iloc[0]
    assert 0 <= int(out["intra_ppm"]) <= 1_000_000
    assert 0 < int(out["expected_ppm"]) <= 1_000_000
    assert int(out["bias_milli"]) > 0
