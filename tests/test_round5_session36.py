"""Round-5 session-36: TPC-H-shaped join/agg patterns (Q4/Q6/Q13/Q14
analogues) — hand-computed value pins for each new oracle-checked query."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import dug_ray.queries as q


def _write_orders(d, rows):
    df = pd.DataFrame(rows, columns=["o_orderkey", "o_custkey",
                                     "o_orderdate", "o_orderpriority"])
    df["o_orderstatus"] = "O"
    df["o_totalprice"] = 100.0
    df["o_orderdate"] = pd.to_datetime(df["o_orderdate"])
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "orders.parquet"))


def _write_lineitem(d, rows):
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey",
                                     "l_shipdate", "l_quantity",
                                     "l_extendedprice", "l_discount"])
    df["l_suppkey"] = 1
    df["l_linenumber"] = 1
    df["l_tax"] = 0.0
    df["l_returnflag"] = "N"
    df["l_linestatus"] = "O"
    df["l_shipdate"] = pd.to_datetime(df["l_shipdate"])
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "lineitem.parquet"))


def _write_customer(d, custkeys):
    df = pd.DataFrame({"c_custkey": custkeys})
    df["c_name"] = "c"
    df["c_nationkey"] = 0
    df["c_acctbal"] = 0.0
    df["c_mktsegment"] = "BUILDING"
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "customer.parquet"))


def _write_part(d, rows):
    df = pd.DataFrame(rows, columns=["p_partkey", "p_type"])
    df["p_name"] = "widget"
    df["p_brand"] = "Brand#1"
    df["p_size"] = 1
    df["p_retailprice"] = 10.0
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "part.parquet"))


def test_q4_priority_exists_semantics():
    # order 1 in-quarter, ONE late line among two (EXISTS => counted);
    # order 2 in-quarter, no late line; order 3 out-of-quarter but late
    orders = [(1, 1, "1996-07-10", "1-URGENT"),
              (2, 1, "1996-08-01", "1-URGENT"),
              (3, 1, "1996-03-01", "2-HIGH")]
    lines = [(1, 1, "1996-07-15", 1.0, 1.00, 0.0),   # +5d: not late
             (1, 1, "1996-09-01", 1.0, 1.00, 0.0),   # +53d: late
             (2, 1, "1996-08-20", 1.0, 1.00, 0.0),   # +19d: not late
             (3, 1, "1996-06-01", 1.0, 1.00, 0.0)]   # late but out of window
    with tempfile.TemporaryDirectory() as d:
        _write_orders(d, orders)
        _write_lineitem(d, lines)
        out = q.QUERIES["q4_priority"](d).to_pandas()
    assert out.set_index("o_orderpriority")["order_count"].to_dict() == {
        "1-URGENT": 1}


def test_q6_forecast_band_and_quantity():
    # in: 1996 ship, disc 0.05, qty 10 -> 200.00 * 0.05 = 20000c*500bp
    # out: disc 0.04 (below band); out: qty 24 (not < 24); out: 1997
    lines = [(1, 1, "1996-05-01", 10.0, 200.00, 0.05),
             (1, 1, "1996-05-02", 10.0, 200.00, 0.04),
             (1, 1, "1996-05-03", 24.0, 200.00, 0.06),
             (1, 1, "1997-05-01", 10.0, 200.00, 0.06)]
    with tempfile.TemporaryDirectory() as d:
        _write_lineitem(d, lines)
        out = q.QUERIES["q6_forecast"](d).to_pandas()
    assert out["revenue_cbp"].to_list() == [20000 * 500]


def test_q13_zero_order_customers_counted():
    # customers 1..3; orders only for 1 (x2) and 2 (x1); customer 3 -> 0
    orders = [(1, 1, "1996-01-01", "3-MEDIUM"),
              (2, 1, "1996-01-02", "3-MEDIUM"),
              (3, 2, "1996-01-03", "3-MEDIUM")]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(d, orders)
        _write_customer(d, [1, 2, 3])
        out = q.QUERIES["q13_custdist"](d).to_pandas()
    assert out.set_index("c_count")["custdist"].to_dict() == {
        0: 1, 1: 1, 2: 1}


def test_q14_promo_share_exact_ppm():
    # month 199601: part 1 PROMO rev 100.00 no disc -> 10000c * 10000bp;
    # part 2 STANDARD rev 300.00 -> share = 1e6 * 1 // 4 = 250000
    lines = [(1, 1, "1996-01-05", 1.0, 100.00, 0.0),
             (1, 2, "1996-01-06", 1.0, 300.00, 0.0)]
    with tempfile.TemporaryDirectory() as d:
        _write_lineitem(d, lines)
        _write_part(d, [(1, "PROMO"), (2, "STANDARD")])
        out = q.QUERIES["q14_promo"](d).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["month"] == 199601
    assert r["promo_cbp"] == 10000 * 10000
    assert r["total_cbp"] == 40000 * 10000
    assert r["promo_ppm"] == 250_000
