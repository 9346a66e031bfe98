"""Round-5 session-141: branching entropy, brand loyalty, stutter
census — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_branching_entropy_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s141be_")
    base = pd.Timestamp("2024-01-01")
    rows = [(1, "view"), (1, "click"), (2, "view"), (2, "click"),
            (3, "view"), (3, "error")]
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "event_id": list(range(len(rows))),
        "ts": pd.Series([base + pd.Timedelta(minutes=i)
                         for i in range(len(rows))]
                        ).astype("datetime64[us]"),
        "event_type": [r[1] for r in rows],
    }).to_parquet(os.path.join(d, "events.parquet"))
    out = q.QUERIES["branching_entropy"](d).to_pandas() \
        .set_index("src")
    s = (math.floor(1_000_000 * 2 * math.log(2 / 3))
         + math.floor(1_000_000 * math.log(1 / 3)))
    h = (-s) // 3
    assert int(out.loc["view", "k_out"]) == 2
    assert int(out.loc["view", "h_micro"]) == h
    assert int(out.loc["view", "perplexity_milli"]) == \
        math.floor(1000 * math.exp(h / 1_000_000.0))


def test_brand_loyalty_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s141bl_")
    pd.DataFrame({"p_partkey": [1, 2],
                  "p_brand": ["B1", "B2"]}).to_parquet(
        os.path.join(d, "part.parquet"))
    pd.DataFrame({"o_orderkey": [1, 2],
                  "o_custkey": [1, 2]}).to_parquet(
        os.path.join(d, "orders.parquet"))
    pd.DataFrame({
        "l_orderkey": [1, 2, 2],
        "l_partkey": [1, 1, 2],
        "l_extendedprice": [3.00, 1.00, 1.00],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["brand_loyalty"](d).to_pandas().iloc[0]
    # c1 all-B1 (share 1000), c2 split 500/500 (top 500)
    assert (int(out["n_custs"]), int(out["p50_milli"]),
            int(out["p90_milli"])) == (2, 500, 1000)
    assert int(out["single_brand_ppm"]) == 500_000


def test_stutter_census_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s141st_")
    df = pd.DataFrame({
        "doc_id": [1, 2], "text": ["a a a b", "a b"],
        "lang": ["en"] * 2, "source": ["s"] * 2})
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(os.path.join(d, "documents.parquet"))
    out = q.QUERIES["stutter_census"](d).to_pandas().iloc[0]
    assert (int(out["n_docs"]), int(out["n_stutter"]),
            int(out["stutter_ppm"]), int(out["max_run"])) \
        == (2, 1, 500_000, 3)
