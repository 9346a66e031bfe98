"""Round-5 session-116: Markov removal effect, path-length
conversion, next-step odds — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def _events(rows, prefix):
    d = tempfile.mkdtemp(prefix=prefix)
    base = pd.Timestamp("2024-01-01")
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "event_id": list(range(len(rows))),
        "ts": pd.Series([base + pd.Timedelta(minutes=i)
                         for i in range(len(rows))]
                        ).astype("datetime64[us]"),
        "event_type": [r[1] for r in rows],
    }).to_parquet(os.path.join(d, "events.parquet"))
    return d


def test_removal_effect_hand_pin():
    import dug_ray.queries as q
    rows = [(1, "view"), (1, "purchase"),
            (2, "view"), (2, "error"),
            (3, "click"), (3, "purchase")]
    out = q.QUERIES["removal_effect"](
        _events(rows, "s116re_")).to_pandas().set_index("channel")
    # v(view)=5e5, v(click)=1e6; base = (2*5e5 + 1e6)//3 = 666666
    assert int(out.loc["view", "base_micro"]) == 666_666
    # removing view: conv = 1e6//3 = 333333 -> effect 500000
    assert int(out.loc["view", "removed_micro"]) == 333_333
    assert int(out.loc["view", "effect_ppm"]) == 500_000
    # removing click: conv = (2*5e5)//3 = 333333 -> 500000
    assert int(out.loc["click", "effect_ppm"]) == 500_000
    # signup never occurs: removal changes nothing
    assert int(out.loc["signup", "effect_ppm"]) == 0


def test_conversion_by_path_length_hand_pin():
    import dug_ray.queries as q
    rows = [(1, "view"), (1, "purchase"),
            (2, "view"), (2, "error"),
            (3, "view")]
    out = q.QUERIES["conversion_by_path_length"](
        _events(rows, "s116cp_")).to_pandas().set_index("k")
    # k=1: user3 (no conv); k=2: users 1 (conv) and 2 (no)
    assert (int(out.loc[1, "n_users"]),
            int(out.loc[1, "n_conv"])) == (1, 0)
    assert (int(out.loc[2, "n_users"]), int(out.loc[2, "n_conv"]),
            int(out.loc[2, "conv_ppm"])) == (2, 1, 500_000)


def test_next_step_odds_hand_pin():
    import dug_ray.queries as q
    rows = [(1, "view"), (1, "purchase"),
            (2, "view"), (2, "error"),
            (3, "click"), (3, "purchase")]
    out = q.QUERIES["next_step_odds"](
        _events(rows, "s116ns_")).to_pandas().set_index("src")
    assert (int(out.loc["view", "n_win"]),
            int(out.loc["view", "n_loss"]),
            int(out.loc["view", "odds_milli"])) == (1, 1, 1000)
    assert (int(out.loc["click", "n_win"]),
            int(out.loc["click", "n_loss"]),
            int(out.loc["click", "odds_milli"])) == (1, 0, 1000)
