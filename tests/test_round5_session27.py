"""Round-5 session-27: Q10 returns, balanced sample."""

from __future__ import annotations

import hashlib
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_q10_returns_filters_and_ranks():
    import dug_ray.queries as q
    li = pd.DataFrame({
        "l_orderkey": [1, 1, 2, 3],
        "l_returnflag": ["R", "N", "R", "R"],
        "l_extendedprice": [100.0, 999.0, 50.0, 10.0],
        "l_discount": [0.0, 0.0, 0.0, 0.1]})
    od = pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_custkey": [7, 8, 7],
        "o_orderdate": [pd.Timestamp("1996-02-01"),
                        pd.Timestamp("1996-03-01"),
                        pd.Timestamp("1995-12-31")]})  # out of window
    cu = pd.DataFrame({"c_custkey": [7, 8],
                       "c_name": ["seven", "eight"],
                       "c_nationkey": [1, 2]})
    with tempfile.TemporaryDirectory() as d:
        for n, f in (("lineitem", li), ("orders", od), ("customer", cu)):
            pq.write_table(pa.Table.from_pandas(f),
                           os.path.join(d, f"{n}.parquet"))
        out = (q.QUERIES["q10_returns"](d).to_pandas()
               .set_index("c_custkey"))
    # cust 7: only order 1's returned line (100.00, no discount);
    # order 3 is outside the quarter; the 'N' line never counts
    assert out.loc[7, "revenue_cents"] == 10000 * 10000
    # cust 8: order 2's returned line 50.00
    assert out.loc[8, "revenue_cents"] == 5000 * 10000
    assert list(out.index) == [7, 8]  # revenue-desc order


def test_balanced_sample_exact_quota_and_rank():
    import dug_ray.queries as q
    df = pd.DataFrame({
        "doc_id": range(60), "text": [""] * 60,
        "lang": ["en"] * 30 + ["fr"] * 25 + ["zz"] * 5,
        "source": ["s"] * 60, "n_chars": [0] * 60})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        out = q.QUERIES["balanced_sample"](d).to_pandas()
    sizes = out.groupby("lang").size()
    assert sizes["en"] == 20 and sizes["fr"] == 20
    assert sizes["zz"] == 5  # smaller group keeps everything
    # rank 1 = smallest md5 within the group
    en_ids = df.loc[df["lang"] == "en", "doc_id"]
    exp_first = min(en_ids, key=lambda i: (int(hashlib.md5(
        str(i).encode()).hexdigest()[:8], 16), i))
    got_first = out[(out["lang"] == "en") & (out["rank"] == 1)]
    assert got_first.iloc[0]["doc_id"] == exp_first


def test_burst_score_sliding_hour():
    import dug_ray.queries as q
    t0 = pd.Timestamp("2024-01-01")
    m = pd.Timedelta(minutes=1)
    rows = [
        # user 1: 3 events within 10 min, then one 2h later
        (1, 1, t0), (2, 1, t0 + 5 * m), (3, 1, t0 + 10 * m),
        (4, 1, t0 + 130 * m),
        # user 2: two events exactly 60 min apart (half-open: burst 1)
        (5, 2, t0), (6, 2, t0 + 60 * m),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    df["event_type"] = "v"
    df["value"] = 0.0
    df["props"] = ""
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "events.parquet"))
        out = (q.QUERIES["burst_score"](d).to_pandas()
               .set_index("user_id"))
    assert out.loc[1, "max_burst"] == 3 and out.loc[1, "n_events"] == 4
    assert out.loc[2, "max_burst"] == 1  # [t, t+1h) excludes the +60min
