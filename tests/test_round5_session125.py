"""Round-5 session-125: join plan, day-of-year effects, encoding
advisor — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_join_plan_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s125jp_")
    pd.DataFrame({"o_orderkey": [1, 2]}).to_parquet(
        os.path.join(d, "orders.parquet"))
    pd.DataFrame({"l_orderkey": [1, 1, 1, 2]}).to_parquet(
        os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["join_plan"](d).to_pandas().iloc[0]
    # orders 2*32=64 < lineitem 4*24=96: broadcast = 64*32 = 2048
    # shuffle = 64+96 = 160 -> shuffle wins
    assert (int(out["n_orders"]), int(out["n_lineitem"])) == (2, 4)
    assert (int(out["broadcast_cost"]), int(out["shuffle_cost"]),
            int(out["use_broadcast"])) == (2048, 160, 0)
    # skew: max 3 of 4 rows over 2 keys -> 1500
    assert int(out["skew_milli"]) == (1000 * 3 * 2) // 4


def test_day_of_year_effect_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s125dy_")
    rows = [("1994-01-15", 10.00), ("1995-01-15", 20.00),
            ("1994-03-01", 1.00), ("1995-03-01", 1.00)]
    pd.DataFrame({
        "o_orderdate": pd.Series([pd.Timestamp(r[0]) for r in rows]
                                 ).astype("datetime64[us]"),
        "o_totalprice": [r[1] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["day_of_year_effect"](d).to_pandas()
    # grand = 1000*(1+10+20+1)//4 = 8000
    # doy 15: mean 15000 (dev 7000); doy 60: mean 1000 (dev -7000)
    m = {int(r["doy"]): (int(r["mean_milli"]), int(r["dev_milli"]))
         for _, r in out.iterrows()}
    assert m[15] == (15_000, 7000)
    assert m[60] == (1000, -7000)


def test_encoding_advisor_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s125ea_")
    pd.DataFrame({
        "o_orderpriority": ["1-URGENT"] * 3 + ["5-LOW"],
        "o_orderstatus": ["F", "O", "F", "O"],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["encoding_advisor"](d).to_pandas() \
        .set_index("col")
    # priority: plain = 3*8 + 5 = 29; dict = 13 + (4*1+7)//8 = 14
    r = out.loc["o_orderpriority"]
    assert (int(r["n"]), int(r["k_distinct"])) == (4, 2)
    assert (int(r["plain_bytes"]), int(r["dict_bytes"]),
            int(r["recommend_dict"])) == (29, 14, 1)
    # status: plain = 4; dict = 2 + (4+7)//8 = 3 -> dict still wins
    r = out.loc["o_orderstatus"]
    assert (int(r["plain_bytes"]), int(r["dict_bytes"]),
            int(r["recommend_dict"])) == (4, 3, 1)
