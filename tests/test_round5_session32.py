"""Round-5 session-32: ship-latency SLO, integer FIR average, and the
ceil-division regression (DuckDB // truncates; Python // floors)."""

from __future__ import annotations

import os
import tempfile

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_ceil_k_expression_matches_python_ceil():
    # the (q*n + 999) // 1000 form must equal true ceil for awkward n —
    # the negated-floor trick silently truncates in DuckDB (regression
    # caught on priority groups with n = 1147)
    for n in (1147, 1149, 1244, 1, 999, 1000, 1001):
        for q in (500, 950, 990):
            exp = -(-q * n // 1000)  # python ceil
            got = duckdb.sql(f"SELECT ({q}*{n} + 999) // 1000").fetchone()[0]
            assert got == exp, (n, q)


def test_wma_value_fixed_weights():
    import dug_ray.queries as q
    t0 = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    vals = [1.0, 2.0, 3.0, 4.0, 5.0]  # cents 100..500
    rows = [(i, 1, t0 + i * s, "v", v) for i, v in enumerate(vals)]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type", "value"])
    df["props"] = ""
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "events.parquet"))
        out = (q.QUERIES["wma_value"](d).to_pandas()
               .set_index("event_id"))
    # only events with >= 3 predecessors: ids 3 and 4
    assert sorted(out.index) == [3, 4]
    # id 3: (8*400 + 4*300 + 2*200 + 100) * 1000 // 15
    assert out.loc[3, "wma_milli"] == (8 * 400 + 4 * 300 + 2 * 200
                                       + 100) * 1000 // 15
    assert out.loc[4, "wma_milli"] == (8 * 500 + 4 * 400 + 2 * 300
                                       + 200) * 1000 // 15


def test_ship_latency_slo_discrete_quantiles():
    import dug_ray.queries as q
    # one priority, latencies 1..7 days -> p50 = 4th value, p95 = 7th
    od = pd.DataFrame({
        "o_orderkey": range(1, 8),
        "o_orderdate": [pd.Timestamp("1996-01-01")] * 7,
        "o_orderpriority": ["1-URGENT"] * 7})
    li = pd.DataFrame({
        "l_orderkey": range(1, 8),
        "l_shipdate": [pd.Timestamp("1996-01-01")
                       + pd.Timedelta(days=d) for d in range(1, 8)]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(od),
                       os.path.join(d, "orders.parquet"))
        pq.write_table(pa.Table.from_pandas(li),
                       os.path.join(d, "lineitem.parquet"))
        out = q.QUERIES["ship_latency_slo"](d).to_pandas().iloc[0]
    assert out["n_lines"] == 7
    assert out["p50_days"] == 4   # ceil(0.5*7) = 4
    assert out["p95_days"] == 7   # ceil(0.95*7) = 7


def test_dup_rate_per_source():
    import dug_ray.queries as q
    df = pd.DataFrame({
        "doc_id": range(6),
        "text": ["same", "same", "same", "x", "y", "y"],
        "lang": ["en"] * 6,
        "source": ["a", "a", "a", "a", "b", "b"],
        "n_chars": [4, 4, 4, 1, 1, 1]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        out = (q.QUERIES["dup_rate"](d).to_pandas()
               .set_index("source"))
    # source a: 4 docs, 2 distinct texts -> 2 dups -> 500000 ppm
    assert out.loc["a", "n_docs"] == 4
    assert out.loc["a", "n_distinct"] == 2
    assert out.loc["a", "dup_ppm"] == 500_000
    # source b: 2 docs, 1 distinct
    assert out.loc["b", "dup_ppm"] == 500_000


def test_conversion_latency_firsts_and_quantiles():
    import dug_ray.queries as q
    t0 = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    rows = [
        # user 1: view@0, purchase@10 -> gap 10
        (1, 1, t0, "view"), (2, 1, t0 + 10 * s, "purchase"),
        # user 2: purchase BEFORE view -> not a converter
        (3, 2, t0, "purchase"), (4, 2, t0 + 5 * s, "view"),
        # user 3: view@0, purchases @100 and @50 -> first purchase 50
        (5, 3, t0, "view"), (6, 3, t0 + 100 * s, "purchase"),
        (7, 3, t0 + 50 * s, "purchase"),
        # user 4: view only
        (8, 4, t0, "view"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type"])
    df["value"] = 0.0
    df["props"] = ""
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "events.parquet"))
        out = q.QUERIES["conversion_latency"](d).to_pandas().iloc[0]
    assert out["n_converters"] == 2
    assert out["p50_gap_s"] == 10   # ceil(0.5*2)=1st of sorted [10, 50]
    assert out["p90_gap_s"] == 50
