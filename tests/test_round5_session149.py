"""Round-5 session-149: n-back repeat spectrum, Calmar ratio,
vowel ratio — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_nback_repeat_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s149nb_")
    base = pd.Timestamp("2024-01-01")
    seq = ["view", "click", "view", "click", "view"]
    pd.DataFrame({
        "user_id": [1] * 5,
        "event_id": list(range(5)),
        "ts": pd.Series([base + pd.Timedelta(minutes=i)
                         for i in range(5)]
                        ).astype("datetime64[us]"),
        "event_type": seq,
    }).to_parquet(os.path.join(d, "events.parquet"))
    out = q.QUERIES["nback_repeat"](d).to_pandas() \
        .set_index("k")
    # base = (1e6*9)//25 + (1e6*4)//25 = 520000
    assert int(out.loc[1, "n_pairs"]) == 4
    assert int(out.loc[1, "rate_ppm"]) == 0
    assert int(out.loc[2, "n_pairs"]) == 3
    assert int(out.loc[2, "rate_ppm"]) == 1_000_000
    assert int(out.loc[2, "lift_milli"]) \
        == (1000 * 1_000_000) // 520_000
    assert int(out.loc[3, "rate_ppm"]) == 0
    assert int(out.loc[4, "n_pairs"]) == 1
    assert int(out.loc[4, "rate_ppm"]) == 1_000_000


def test_calmar_ratio_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s149cr_")
    base = pd.Timestamp("1970-01-01")
    vals = [10.00, 8.00, 9.00, 13.00]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(4)]
        ).astype("datetime64[us]"),
        "o_totalprice": vals,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["calmar_ratio"](d).to_pandas().iloc[0]
    # runmax 10,10,10,13 -> max_dd 2; net 3 -> calmar 1500
    assert (int(out["net_d"]), int(out["max_dd_d"])) == (3, 2)
    assert int(out["calmar_milli"]) == 1500


def test_vowel_ratio_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s149vr_")
    pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["Hello", "bcd!", "aA bB"],
        "lang": ["en", "xx", "en"],
    }).to_parquet(os.path.join(d, "documents.parquet"))
    out = q.QUERIES["vowel_ratio"](d).to_pandas() \
        .set_index("lang")
    # en: letters 5+4=9, vowels 2+2=4; xx: letters 3, vowels 0
    assert int(out.loc["en", "le"]) == 9
    assert int(out.loc["en", "vowel_ppm"]) == (1_000_000 * 4) // 9
    assert int(out.loc["xx", "le"]) == 3
    assert int(out.loc["xx", "vowel_ppm"]) == 0
