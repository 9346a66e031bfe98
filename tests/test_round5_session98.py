"""Round-5 session-98: Lotka's law, Bradford zones, logistic
adoption — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_lotka_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s98lk_")
    keys = [1, 2, 3, 3, 4, 4, 4, 4]
    pd.DataFrame({"o_custkey": keys}).to_parquet(
        os.path.join(d, "orders.parquet"))
    out = q.QUERIES["lotka_law"](d).to_pandas().set_index("n_orders")
    # f1=2, f2=1, f4=1
    assert (int(out.loc[1, "f_obs"]), int(out.loc[1, "lotka_ppm"])) \
        == (2, 1_000_000)
    assert (int(out.loc[2, "f_obs"]), int(out.loc[2, "lotka_ppm"])) \
        == (1, 2_000_000)
    assert (int(out.loc[4, "f_obs"]), int(out.loc[4, "lotka_ppm"])) \
        == (1, 8_000_000)


def test_bradford_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s98bz_")
    srcs = ["s1"] * 6 + ["s2"] * 2 + ["s3"] * 2 + ["s4"] * 2
    df = pd.DataFrame({
        "doc_id": range(len(srcs)), "source": srcs})
    df["text"] = "x"
    df["lang"] = "en"
    df["n_chars"] = 1
    df.to_parquet(os.path.join(d, "documents.parquet"))
    out = q.QUERIES["bradford_zones"](d).to_pandas().set_index("zone")
    # N=12: zone1={s1}(6), zone2={s2}(2), zone3={s3,s4}(4)
    assert (int(out.loc[1, "n_sources"]), int(out.loc[1, "n_docs"])) \
        == (1, 6)
    assert (int(out.loc[2, "n_sources"]), int(out.loc[2, "n_docs"])) \
        == (1, 2)
    assert (int(out.loc[3, "n_sources"]), int(out.loc[3, "n_docs"])) \
        == (2, 4)
    assert int(out.loc[3, "ratio_milli"]) == 2000


def test_logistic_adoption_mirror():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s98la_")
    base = pd.Timestamp("1970-01-01")
    # first days: u1@0, u2@1, u3@1, u4@2
    rows = [(1, 0), (1, 5), (2, 1), (3, 1), (4, 2)]
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.Series([base + pd.Timedelta(days=r[1])
                         for r in rows]).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "events.parquet"))
    out = q.QUERIES["logistic_adoption"](d).to_pandas().iloc[0]
    # cum: day0=1, day1=3 (day2 -> cum=4=U excluded)
    pts = [(0, math.floor(1000 * math.log(1 / 3))),
           (1, math.floor(1000 * math.log(3 / 1)))]
    k, sx = 2, 1
    sy = pts[0][1] + pts[1][1]
    sxx = 1
    sxy = pts[1][1]
    num = 1000 * (k * sxy - sx * sy)
    den = k * sxx - sx * sx
    slope = -((-num) // den) if num < 0 else num // den
    assert (int(out["n_users"]), int(out["k_points"]),
            int(out["slope_milli"])) == (4, 2, slope)
    assert slope > 0
