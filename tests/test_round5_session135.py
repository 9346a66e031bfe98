"""Round-5 session-135: familiarity, expected shortfall, Erlang-C —
pins and mirrors."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_familiarity_sanity_and_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s135fa_")
    df = pd.DataFrame({
        "doc_id": [1, 2], "text": ["a a b", "c c"],
        "lang": ["en"] * 2, "source": ["s"] * 2})
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(os.path.join(d, "documents.parquet"))
    out = q.QUERIES["familiarity_score"](d).to_pandas().iloc[0]
    # tiny vocab: every term is in the top-1000 -> all scores 1000
    assert (int(out["n_docs"]), int(out["p10_milli"]),
            int(out["p50_milli"]), int(out["p90_milli"])) \
        == (2, 1000, 1000, 1000)
    real = q.QUERIES["familiarity_score"]("/root/testdata/sf0.001") \
        .to_pandas().iloc[0]
    assert int(real["p10_milli"]) <= int(real["p50_milli"]) \
        <= int(real["p90_milli"]) <= 1000


def test_expected_shortfall_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s135es_")
    pd.DataFrame({
        "o_totalprice": [float(i) for i in range(1, 101)],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["expected_shortfall"](d).to_pandas().iloc[0]
    # var95 = 95; tail 95..100: mean 97.5 -> 97500 milli
    assert (int(out["n"]), int(out["var95_v"]),
            int(out["n_tail"])) == (100, 95, 6)
    assert int(out["es_milli"]) == 97_500
    assert int(out["es_ratio_milli"]) == 97_500 // 95


def test_erlang_c_mirror():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s135ec_")
    base = pd.Timestamp("1970-01-01")
    days = [0, 0, 1, 1]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in days]
        ).astype("datetime64[us]"),
        "o_totalprice": [1.00] * 4,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["erlang_c"](d).to_pandas().set_index("c")
    a = 2.0
    b = 1.0
    for c in range(1, 9):
        b = (a * b) / (c + a * b)
        if a < c:
            exp = math.floor(1_000_000 * (b / (1 - (a / c)
                                               * (1 - b))))
        else:
            exp = 1_000_000
        assert int(out.loc[c, "wait_ppm"]) == exp
    # unstable at c <= 2 -> pinned
    assert int(out.loc[1, "wait_ppm"]) == 1_000_000
    assert int(out.loc[2, "wait_ppm"]) == 1_000_000
