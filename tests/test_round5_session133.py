"""Round-5 session-133: competing risks, casing profile, bin advisor
— hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_competing_risks_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s133cr_")
    base = pd.Timestamp("1970-01-01")
    # u1 dies day2 via error; u2 dies day1 via view; u3 censored
    rows = [(1, 0, "view"), (1, 2, "error"),
            (2, 0, "click"), (2, 1, "view"),
            (3, 0, "view"), (3, 10, "view")]
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "event_id": list(range(len(rows))),
        "ts": pd.Series([base + pd.Timedelta(days=r[1])
                         for r in rows]).astype("datetime64[us]"),
        "event_type": [r[2] for r in rows],
    }).to_parquet(os.path.join(d, "events.parquet"))
    out = q.QUERIES["competing_risks"](d).to_pandas() \
        .set_index("cause")
    assert (int(out.loc["error", "n_deaths"]),
            int(out.loc["error", "share_ppm"]),
            int(out.loc["error", "early_ppm"])) \
        == (1, 500_000, 1_000_000)
    assert int(out.loc["view", "n_deaths"]) == 1
    assert (int(out.loc["_all", "n_deaths"]),
            int(out.loc["_all", "share_ppm"])) == (2, 1_000_000)


def test_casing_profile_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s133cp_")
    df = pd.DataFrame({
        "doc_id": [1], "source": ["s1"],
        "text": ["HELLO World lower 123"], "lang": ["en"]})
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(os.path.join(d, "documents.parquet"))
    out = q.QUERIES["casing_profile"](d).to_pandas() \
        .set_index("cls")
    assert int(out.loc["upper", "n"]) == 1
    assert int(out.loc["title", "n"]) == 1
    assert int(out.loc["lower", "n"]) == 1
    assert int(out.loc["other", "n"]) == 1
    assert int(out.loc["upper", "share_ppm"]) == 250_000


def test_bin_advisor_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s133ba_")
    pd.DataFrame({
        "o_totalprice": [float(i) for i in range(1, 9)],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["bin_advisor"](d).to_pandas().iloc[0]
    # n=8: sturges = 4; rice = floor(2*2) = 4
    # quartiles: q1 -> 4*cum>=8 -> v=2; q3 -> >=24 -> v=6; iqr=4
    # fd = floor(7 * 2 / 8) = 1; median(4,4,1) = 4
    cbrt = 8.0 ** (1.0 / 3.0)
    assert (int(out["n"]), int(out["sturges"])) == (8, 4)
    assert int(out["rice"]) == math.floor(2 * cbrt)
    assert int(out["fd"]) == math.floor(7 * cbrt / 8)
    assert int(out["recommended"]) == sorted(
        [4, math.floor(2 * cbrt), math.floor(7 * cbrt / 8)])[1]
