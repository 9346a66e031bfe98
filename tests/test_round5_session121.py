"""Round-5 session-121: SIR, capture ratios, source redundancy —
hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_sir_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s121si_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    pd.DataFrame({
        "o_custkey": [1, 1, 2, 2],
        "o_orderdate": pd.Series([pd.Timestamp("1994-06-01")] * 4
                                 ).astype("datetime64[us]"),
        "o_orderpriority": ["1-URGENT", "1-URGENT",
                            "3-MEDIUM", "3-MEDIUM"],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["sir_nations"](d).to_pandas().set_index("nation")
    # global rate 50%: expected 1 each; obs 2 / 0
    assert (int(out.loc[0, "observed"]), int(out.loc[0, "expected"]),
            int(out.loc[0, "sir_milli"])) == (2, 1, 2000)
    assert (int(out.loc[1, "observed"]),
            int(out.loc[1, "sir_milli"])) == (0, 0)


def test_capture_ratio_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s121cr_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    # monthly dollars: n0 = [1,3,2], n1 = [1,1,1]
    rows = [(1, "1994-01-05", 1.0), (1, "1994-02-05", 3.0),
            (1, "1994-03-05", 2.0),
            (2, "1994-01-10", 1.0), (2, "1994-02-10", 1.0),
            (2, "1994-03-10", 1.0)]
    pd.DataFrame({
        "o_custkey": [r[0] for r in rows],
        "o_orderdate": pd.Series([pd.Timestamp(r[1]) for r in rows]
                                 ).astype("datetime64[us]"),
        "o_totalprice": [r[2] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["capture_ratio"](d).to_pandas() \
        .set_index("nation")
    # global [2,4,3]: up dG=2, down dG=-1; n0 dd=[2,-1], n1=[0,0]
    assert (int(out.loc[0, "up_milli"]),
            int(out.loc[0, "down_milli"])) == (1000, 1000)
    assert (int(out.loc[1, "up_milli"]),
            int(out.loc[1, "down_milli"])) == (0, 0)


def test_redundancy_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s121rd_")
    df = pd.DataFrame({
        "doc_id": [1], "source": ["s1"], "text": ["aab"],
        "lang": ["en"]})
    df["n_chars"] = 3
    df.to_parquet(os.path.join(d, "documents.parquet"))
    out = q.QUERIES["redundancy_index"](d).to_pandas().iloc[0]
    s = (math.floor(1_000_000 * 2 * math.log(2 / 3))
         + math.floor(1_000_000 * math.log(1 / 3)))
    h = (-s) // 3
    hmax = math.floor(1_000_000 * math.log(2))
    assert (out["source"], int(out["n_chars"]),
            int(out["alphabet"])) == ("s1", 3, 2)
    assert int(out["h_micro"]) == h
    assert int(out["redundancy_milli"]) == 1000 - (1000 * h) // hmax
