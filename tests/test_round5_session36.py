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


def _write_lineitem_supp(d, rows):
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_suppkey",
                                     "l_shipdate", "l_quantity",
                                     "l_extendedprice"])
    df["l_partkey"] = 1
    df["l_linenumber"] = 1
    df["l_discount"] = 0.0
    df["l_tax"] = 0.0
    df["l_returnflag"] = "N"
    df["l_linestatus"] = "O"
    df["l_shipdate"] = pd.to_datetime(df["l_shipdate"])
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "lineitem.parquet"))


def _write_supplier(d, rows):
    df = pd.DataFrame(rows, columns=["s_suppkey", "s_name"])
    df["s_nationkey"] = 0
    df["s_acctbal"] = 0.0
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "supplier.parquet"))


def _write_customer_bal(d, rows):
    df = pd.DataFrame(rows, columns=["c_custkey", "c_nationkey",
                                     "c_acctbal"])
    df["c_name"] = "c"
    df["c_mktsegment"] = "BUILDING"
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "customer.parquet"))


def test_q17_small_qty_cross_multiplication():
    # Brand#12 = part 1 in this fixture via a custom part table
    part = pd.DataFrame({"p_partkey": [1, 2], "p_type": "STANDARD",
                         "p_name": "widget",
                         "p_brand": ["Brand#12", "Brand#1"],
                         "p_size": 1, "p_retailprice": 10.0})
    # part 1 qtys: 1,10,10,10,10 (sum 41, cnt 5): qty 1 passes
    # (5*1*5=25 < 41), qty 10 fails; part 2 line must be ignored
    lines = [(1, 1, "1996-01-01", 1.0, 5.00, 0.0),
             (1, 1, "1996-01-02", 10.0, 7.00, 0.0),
             (1, 1, "1996-01-03", 10.0, 7.00, 0.0),
             (1, 1, "1996-01-04", 10.0, 7.00, 0.0),
             (1, 1, "1996-01-05", 10.0, 7.00, 0.0),
             (2, 2, "1996-01-06", 1.0, 9.00, 0.0)]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(part),
                       os.path.join(d, "part.parquet"))
        _write_lineitem(d, lines)
        out = q.QUERIES["q17_small_qty"](d).to_pandas()
    assert out["small_qty_cents"].to_list() == [500]
    assert out["n_lines"].to_list() == [1]


def test_q18_having_over_order_total():
    # order 1: 100+60 = 160 > 150 qualifies; order 2: 100 does not
    lines = [(1, 1, "1996-01-01", 100.0, 1.00, 0.0),
             (1, 1, "1996-01-02", 60.0, 1.00, 0.0),
             (2, 1, "1996-01-03", 100.0, 1.00, 0.0)]
    orders = [(1, 7, "1996-01-01", "3-MEDIUM"),
              (2, 7, "1996-01-02", "3-MEDIUM")]
    with tempfile.TemporaryDirectory() as d:
        _write_lineitem(d, lines)
        # q18 reads o_totalprice: _write_orders fixes it at 100.0
        _write_orders(d, orders)
        out = q.QUERIES["q18_large_orders"](d).to_pandas()
    assert out["o_orderkey"].to_list() == [1]
    assert out["sum_qty_c"].to_list() == [16000]
    assert out["o_custkey"].to_list() == [7]
    assert out["total_cents"].to_list() == [10000]


def test_q21_sole_late_supplier():
    # order 1 (placed d0): supp 1 ships d+40 (late), supp 2 d+5 -> supp 1
    # is the sole late supplier in a multi-supplier order: counted.
    # order 2: both late -> excluded. order 3: single-supplier late ->
    # excluded (needs n_supp > 1).
    orders = [(1, 1, "1996-01-01", "3-MEDIUM"),
              (2, 1, "1996-01-01", "3-MEDIUM"),
              (3, 1, "1996-01-01", "3-MEDIUM")]
    lines = [(1, 1, "1996-02-10", 1.0, 1.00),
             (1, 2, "1996-01-06", 1.0, 1.00),
             (2, 1, "1996-02-10", 1.0, 1.00),
             (2, 2, "1996-02-11", 1.0, 1.00),
             (3, 1, "1996-02-10", 1.0, 1.00)]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(d, orders)
        _write_lineitem_supp(d, lines)
        _write_supplier(d, [(1, "Supplier#1"), (2, "Supplier#2")])
        out = q.QUERIES["q21_waiting"](d).to_pandas()
    assert out[["s_suppkey", "numwait"]].values.tolist() == [[1, 1]]
    assert out["s_name"].to_list() == ["Supplier#1"]


def test_q22_above_avg_and_inactive():
    # positive balances: 100, 200, 300 -> avg 200; eligible needs
    # bal > 200 strictly AND no order since 2000: cust 3 (300, inactive)
    # qualifies; cust 2 (200) not above avg; cust 4 (250) has a recent
    # order; cust 5 (-50) never in the average
    cust = [(1, 0, 100.0), (2, 0, 200.0), (3, 1, 300.0),
            (4, 1, 250.0), (5, 0, -50.0)]
    orders = [(1, 4, "2001-05-01", "3-MEDIUM"),
              (2, 3, "1999-05-01", "3-MEDIUM")]
    with tempfile.TemporaryDirectory() as d:
        _write_customer_bal(d, cust)
        _write_orders(d, orders)
        out = q.QUERIES["q22_opportunity"](d).to_pandas()
    assert out[["c_nationkey", "numcust", "totacctbal_cents"]] \
        .values.tolist() == [[1, 1, 30000]]


def _write_nation(d):
    df = pd.DataFrame({"n_nationkey": list(range(25)),
                       "n_name": [f"NATION_{i}" for i in range(25)],
                       "n_regionkey": [i % 5 for i in range(25)]})
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "nation.parquet"))


def test_q7_volume_bilateral():
    # supp 1 in NATION_3 ships to cust 1 in NATION_8 (1996, 100.00);
    # supp 2 in NATION_8 ships to cust 2 in NATION_3 (1997, 50.00);
    # supp 1 -> cust 2 is intra-pair but same-nation? no: 3 vs 3 via
    # cust 2 -> EXCLUDED (cross-nation filter)
    with tempfile.TemporaryDirectory() as d:
        _write_nation(d)
        sup = pd.DataFrame({"s_suppkey": [1, 2], "s_name": "s",
                            "s_nationkey": [3, 8], "s_acctbal": 0.0})
        pq.write_table(pa.Table.from_pandas(sup),
                       os.path.join(d, "supplier.parquet"))
        _write_customer_bal(d, [(1, 8, 0.0), (2, 3, 0.0)])
        _write_orders(d, [(1, 1, "1996-02-01", "3-MEDIUM"),
                          (2, 2, "1997-02-01", "3-MEDIUM"),
                          (3, 2, "1996-03-01", "3-MEDIUM")])
        lines = [(1, 1, "1996-02-10", 1.0, 100.00),
                 (2, 2, "1997-02-10", 1.0, 50.00),
                 (3, 1, "1996-03-10", 1.0, 70.00)]  # supp n3 -> cust n3
        _write_lineitem_supp(d, lines)
        out = q.QUERIES["q7_volume"](d).to_pandas() \
            .sort_values("l_year").reset_index(drop=True)
    assert out[["supp_nation", "cust_nation", "l_year"]].values.tolist() \
        == [["NATION_3", "NATION_8", 1996], ["NATION_8", "NATION_3", 1997]]
    assert out["revenue_cbp"].to_list() == [10000 * 10000, 5000 * 10000]


def test_q19_disjunctive_branches():
    part = pd.DataFrame({
        "p_partkey": [1, 2, 3], "p_name": "widget", "p_type": "STANDARD",
        "p_brand": ["Brand#12", "Brand#23", "Brand#34"],
        "p_size": [3, 20, 10], "p_retailprice": 10.0})
    # part 1: size 3 in [1,5], qty 5 in [1,11] -> HIT (20.00)
    # part 2: size 20 out of [1,10] -> miss even with qty 15
    # part 3: size 10 in [1,15], qty 25 in [20,30] -> HIT (30.00)
    lines = [(1, 1, "1996-01-01", 5.0, 20.00, 0.0),
             (1, 2, "1996-01-02", 15.0, 40.00, 0.0),
             (1, 3, "1996-01-03", 25.0, 30.00, 0.0)]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(part),
                       os.path.join(d, "part.parquet"))
        _write_lineitem(d, lines)
        out = q.QUERIES["q19_disjunctive"](d).to_pandas()
    assert out["revenue_cbp"].to_list() == [(2000 + 3000) * 10000]
    assert out["n_lines"].to_list() == [2]


def _write_region(d):
    df = pd.DataFrame({"r_regionkey": list(range(5)),
                       "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE",
                                  "MIDDLE EAST"]})
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "region.parquet"))


def _write_supplier_nat(d, rows):
    df = pd.DataFrame(rows, columns=["s_suppkey", "s_nationkey",
                                     "s_acctbal"])
    df["s_name"] = "s" + df["s_suppkey"].astype(str)
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "supplier.parquet"))


def _write_part_full(d, rows):
    df = pd.DataFrame(rows, columns=["p_partkey", "p_name", "p_brand",
                                     "p_size", "p_retailprice"])
    df["p_type"] = "STANDARD"
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "part.parquet"))


def test_q9_profit_cost_model():
    # widget part 1 retail 10.00; line: qty 2, price 30.00, disc 0 ->
    # profit_cbp = 3000c*10000bp - 200qc*1000rc = 3e7 - 2e5*... :
    # qty_c=200, retail_c=1000 -> cost 200*1000=200000; rev 3000*10000
    # = 30000000; profit 29800000. Non-widget part 2 excluded.
    with tempfile.TemporaryDirectory() as d:
        _write_nation(d)
        _write_part_full(d, [(1, "cold widget", "Brand#1", 1, 10.0),
                             (2, "blue rod", "Brand#1", 1, 10.0)])
        _write_supplier_nat(d, [(1, 3, 0.0)])
        _write_orders(d, [(1, 1, "1996-02-01", "3-MEDIUM")])
        lines = [(1, 1, "1996-02-10", 2.0, 30.00, 0.0),
                 (1, 2, "1996-02-11", 2.0, 30.00, 0.0)]
        _write_lineitem(d, lines)  # l_suppkey fixed at 1
        out = q.QUERIES["q9_profit"](d).to_pandas()
    assert out.values.tolist() == [["NATION_3", 1996, 29_800_000]]


def test_q11_threshold_strict():
    # NATION_3 supplier 1 only; part values: 100.00 and 0.05 ->
    # total 100.05; threshold = total_cbp//1000+1; part 2's
    # 0.05 (5c*10000=50000 cbp) vs threshold (1000500000//1000+1 =
    # 1000501) -> part 2 drops, part 1 stays
    with tempfile.TemporaryDirectory() as d:
        _write_nation(d)
        _write_supplier_nat(d, [(1, 3, 0.0)])
        lines = [(1, 1, "1996-01-01", 1.0, 100.00, 0.0),
                 (2, 2, "1996-01-02", 1.0, 0.05, 0.0)]
        _write_lineitem(d, lines)  # suppkey 1 for all
        out = q.QUERIES["q11_important"](d).to_pandas()
    assert out.values.tolist() == [[1, 10000 * 10000]]


def test_q16_not_in_exclusion():
    # widget parts 1 (Brand#A size 1) and 2 (Brand#A size 1);
    # suppliers: 1 ok, 2 banned (acctbal 10.00 < 2000) -> distinct
    # count over (brand,size) counts supplier 1 once across both parts
    with tempfile.TemporaryDirectory() as d:
        _write_part_full(d, [(1, "cold widget", "Brand#A", 1, 10.0),
                             (2, "warm widget", "Brand#A", 1, 10.0)])
        _write_supplier_nat(d, [(1, 0, 9999.0), (2, 0, 10.0)])
        # supp 1 ships both widget parts; banned supp 2 ships part 1:
        # the (Brand#A, 1) census must count only supplier 1, once
        df = pd.DataFrame({
            "l_orderkey": [1, 1, 2], "l_partkey": [1, 2, 1],
            "l_suppkey": [1, 1, 2], "l_linenumber": 1,
            "l_quantity": 1.0, "l_extendedprice": 1.0,
            "l_discount": 0.0, "l_tax": 0.0,
            "l_returnflag": "N", "l_linestatus": "O",
            "l_shipdate": pd.to_datetime(["1996-01-01"] * 3)})
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "lineitem.parquet"))
        out = q.QUERIES["q16_supplier_cnt"](d).to_pandas()
    assert out.values.tolist() == [["Brand#A", 1, 1]]


def test_q20_threshold_and_prefix():
    # blue part 1: supp 1 ships 400 units in 1996 (> 300: kept);
    # supp 2 ships 100 (dropped); red part 2 never counts
    with tempfile.TemporaryDirectory() as d:
        _write_part_full(d, [(1, "blue rod", "Brand#1", 1, 10.0),
                             (2, "red rod", "Brand#1", 1, 10.0)])
        _write_supplier_nat(d, [(1, 0, 0.0), (2, 0, 0.0)])
        df = pd.DataFrame({
            "l_orderkey": [1, 2, 3], "l_partkey": [1, 1, 2],
            "l_suppkey": [1, 2, 1], "l_linenumber": 1,
            "l_quantity": [400.0, 100.0, 500.0],
            "l_extendedprice": 1.0, "l_discount": 0.0, "l_tax": 0.0,
            "l_returnflag": "N", "l_linestatus": "O",
            "l_shipdate": pd.to_datetime(["1996-03-01", "1996-03-02",
                                          "1996-03-03"])})
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "lineitem.parquet"))
        out = q.QUERIES["q20_excess"](d).to_pandas()
    assert out[["s_suppkey", "qty_c"]].values.tolist() == [[1, 40000]]


def test_q2_argmin_tiebreak():
    # part 1 (size 40): lines (supp 3, 5.00), (supp 2, 5.00),
    # (supp 1, 9.00) -> min price 5.00, tie -> supp 2
    with tempfile.TemporaryDirectory() as d:
        _write_part_full(d, [(1, "w", "Brand#1", 40, 10.0),
                             (2, "w", "Brand#1", 10, 10.0)])
        df = pd.DataFrame({
            "l_orderkey": [1, 2, 3, 4], "l_partkey": [1, 1, 1, 2],
            "l_suppkey": [3, 2, 1, 9], "l_linenumber": 1,
            "l_quantity": 1.0,
            "l_extendedprice": [5.00, 5.00, 9.00, 1.00],
            "l_discount": 0.0, "l_tax": 0.0,
            "l_returnflag": "N", "l_linestatus": "O",
            "l_shipdate": pd.to_datetime(["1996-01-01"] * 4)})
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "lineitem.parquet"))
        out = q.QUERIES["q2_min_supplier"](d).to_pandas()
    assert out.values.tolist() == [[1, 2, 500]]


def test_q8_share_ppm():
    # AMERICA nations: 1,6,11,16,21. cust 1 in nation 1. PROMO part 1.
    # supp 1 in NATION_3 sells 25.00; supp 2 in NATION_0 sells 75.00
    # -> share = 1e6 * 25 // 100 = 250000 in year 1996
    with tempfile.TemporaryDirectory() as d:
        _write_nation(d)
        _write_region(d)
        part = pd.DataFrame({"p_partkey": [1], "p_name": "w",
                             "p_brand": "Brand#1", "p_size": 1,
                             "p_retailprice": 10.0, "p_type": "PROMO"})
        pq.write_table(pa.Table.from_pandas(part),
                       os.path.join(d, "part.parquet"))
        _write_supplier_nat(d, [(1, 3, 0.0), (2, 0, 0.0)])
        _write_customer_bal(d, [(1, 1, 0.0)])
        _write_orders(d, [(1, 1, "1996-02-01", "3-MEDIUM")])
        df = pd.DataFrame({
            "l_orderkey": [1, 1], "l_partkey": [1, 1],
            "l_suppkey": [1, 2], "l_linenumber": 1, "l_quantity": 1.0,
            "l_extendedprice": [25.00, 75.00], "l_discount": 0.0,
            "l_tax": 0.0, "l_returnflag": "N", "l_linestatus": "O",
            "l_shipdate": pd.to_datetime(["1996-02-10", "1996-02-11"])})
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "lineitem.parquet"))
        out = q.QUERIES["q8_market_share"](d).to_pandas()
    assert out.values.tolist() == [[1996, 2500 * 10000, 10000 * 10000,
                                    250_000]]


def test_q12_late_classification():
    # line shipped +70d on URGENT order -> critical; +70d on LOW ->
    # other; +10d never counted
    orders = [(1, 1, "1996-01-01", "1-URGENT"),
              (2, 1, "1996-01-01", "5-LOW"),
              (3, 1, "1996-01-01", "1-URGENT")]
    lines = [(1, 1, "1996-03-15", 1.0, 1.00, 0.0),
             (2, 1, "1996-03-15", 1.0, 1.00, 0.0),
             (3, 1, "1996-01-11", 1.0, 1.00, 0.0)]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(d, orders)
        _write_lineitem(d, lines)
        out = q.QUERIES["q12_priority_class"](d).to_pandas()
    assert out.values.tolist() == [["N", 1, 1]]


def test_q15_global_max_with_tie():
    # H1-1996 revenue: supp 1 = 100.00 (two 50.00 lines), supp 2 =
    # 100.00 (one line), supp 3 = 99.00 -> both 1 and 2 surface
    with tempfile.TemporaryDirectory() as d:
        _write_supplier_nat(d, [(1, 0, 0.0), (2, 0, 0.0), (3, 0, 0.0)])
        df = pd.DataFrame({
            "l_orderkey": [1, 2, 3, 4], "l_partkey": 1,
            "l_suppkey": [1, 1, 2, 3], "l_linenumber": 1,
            "l_quantity": 1.0,
            "l_extendedprice": [50.00, 50.00, 100.00, 99.00],
            "l_discount": 0.0, "l_tax": 0.0,
            "l_returnflag": "N", "l_linestatus": "O",
            "l_shipdate": pd.to_datetime(["1996-02-01"] * 4)})
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "lineitem.parquet"))
        out = q.QUERIES["q15_top_supplier"](d).to_pandas() \
            .sort_values("s_suppkey").reset_index(drop=True)
    assert out[["s_suppkey", "total_cbp"]].values.tolist() == [
        [1, 10000 * 10000], [2, 10000 * 10000]]


def test_spearman_perfect_monotone():
    # day1: 1 order 1.00; day2: 2 orders 2.00; day3: 3 orders 3.00 ->
    # revenue and order-count ranks both 1,2,3 -> rho = 1 exactly
    orders = [(1, 1, "2024-01-01", "3-MEDIUM"),
              (2, 1, "2024-01-02", "3-MEDIUM"),
              (3, 1, "2024-01-02", "3-MEDIUM"),
              (4, 1, "2024-01-03", "3-MEDIUM"),
              (5, 1, "2024-01-03", "3-MEDIUM"),
              (6, 1, "2024-01-03", "3-MEDIUM")]
    df = pd.DataFrame(orders, columns=["o_orderkey", "o_custkey",
                                       "o_orderdate", "o_orderpriority"])
    df["o_orderstatus"] = "O"
    df["o_totalprice"] = [1.00, 0.50, 1.50, 1.00, 1.00, 1.00]
    df["o_orderdate"] = pd.to_datetime(df["o_orderdate"])
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["spearman_rho"](d).to_pandas()
    r = out.iloc[0]
    assert r["n_days"] == 3
    assert r["rho2_signed_ppm"] == 1_000_000


def test_ewma_integer_recurrence():
    # daily cents 800, 160: e0 = 800e6; e1 = (160e6 + 7*800e6)//8
    rows = [(1, 1, "2024-01-01", 8.00), (2, 1, "2024-01-02", 1.60)]
    with tempfile.TemporaryDirectory() as d:
        _write_orders36_money(d, rows)
        out = q.QUERIES["ewma_revenue"](d).to_pandas() \
            .sort_values("d").reset_index(drop=True)
    assert out["ewma_ucents"].to_list() == [800_000_000, 720_000_000]


def _write_orders36_money(d, rows):
    df = pd.DataFrame(rows, columns=["o_orderkey", "o_custkey",
                                     "o_orderdate", "o_totalprice"])
    df["o_orderstatus"] = "O"
    df["o_orderpriority"] = "3-MEDIUM"
    df["o_orderdate"] = pd.to_datetime(df["o_orderdate"])
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "orders.parquet"))


def test_js_divergence_two_sources():
    import math
    docs = pd.DataFrame({
        "doc_id": [1, 2], "text": ["a a b", "a b b b"],
        "lang": "en", "source": ["src0", "src1"], "n_chars": [5, 7]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(docs),
                       os.path.join(d, "documents.parquet"))
        out = q.QUERIES["js_divergence"](d).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["source_a"], r["source_b"]) == ("src0", "src1")
    assert (r["n_a"], r["n_b"]) == (3, 4)
    # term a: a=2,b=1 den=11; term b: a=1,b=3 den=13
    wa = (2 * math.floor(math.log((2.0 * 2) * 4 / 11) * 1e6)
          + 1 * math.floor(math.log((2.0 * 1) * 4 / 13) * 1e6))
    wb = (1 * math.floor(math.log((2.0 * 1) * 3 / 11) * 1e6)
          + 3 * math.floor(math.log((2.0 * 3) * 3 / 13) * 1e6))
    assert r["jsa_unats_xna"] == wa
    assert r["jsb_unats_xnb"] == wb


def test_threshold_crossings_lag_semantics():
    t = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    # user 1: 10, 60, 40, 70 -> two upward crossings; user 2 starts
    # above (prev NULL) -> 0
    rows = [(1, 1, t, "view", 0.10), (2, 1, t + s, "view", 0.60),
            (3, 1, t + 2 * s, "view", 0.40),
            (4, 1, t + 3 * s, "view", 0.70),
            (5, 2, t, "view", 0.60), (6, 2, t + s, "view", 0.70)]
    rows = [(i, u, ts, k, v * 100) for i, u, ts, k, v in rows]
    with tempfile.TemporaryDirectory() as d:
        import tests.test_round5_session34 as s34
        s34._write_events(d, rows)
        out = q.QUERIES["threshold_crossings"](d).to_pandas() \
            .set_index("user_id")
    assert out.loc[1, "n_crossings"] == 2
    assert out.loc[2, "n_crossings"] == 0


def test_pq_codes_nearest_subvector():
    import numpy as np
    # 4 centroid vectors: vec i = constant i across all 64 dims.
    # test vec 4: first subspace ~0.9 (snaps to centroid 1), rest 2.1
    # (snaps to centroid 2)
    rows = []
    for i in range(4):
        rows.append((i, [float(i)] * 64))
    v = [0.9] * 8 + [2.1] * 56
    rows.append((4, v))
    df = pd.DataFrame({"vec_id": [r[0] for r in rows],
                       "embedding": [r[1] for r in rows],
                       "label": 0})
    schema = pa.schema([("vec_id", pa.int64()),
                        ("embedding", pa.list_(pa.float32())),
                        ("label", pa.int32())])
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df, schema=schema),
                       os.path.join(d, "embeddings.parquet"))
        out = q.QUERIES["pq_codes"](d).to_pandas()
    got = out[out["vec_id"] == 4].sort_values("sub")["code"].to_list()
    assert got == [1] + [2] * 7
    # each pinned centroid codes to itself in every subspace
    for i in range(4):
        assert (out[out["vec_id"] == i]["code"] == i).all()


def test_cramers_v2_perfect_association():
    # 2 event types, 2 weekdays, perfectly dependent: type 'click'
    # only on dow of 2024-01-01 (Monday), 'view' only next day ->
    # V^2 = 1 (up to the documented per-cell floor)
    t1, t2 = pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-02")
    rows = [(1, 1, t1, "click", 0.0), (2, 1, t1, "click", 0.0),
            (3, 1, t2, "view", 0.0), (4, 1, t2, "view", 0.0)]
    with tempfile.TemporaryDirectory() as d:
        import tests.test_round5_session34 as s34
        s34._write_events(d, rows)
        out = q.QUERIES["cramers_v2"](d).to_pandas()
    r = out.iloc[0]
    # OBSERVED cells only (the chi2_independence convention — zero
    # cells never enter the sum on either engine): two diagonal cells
    # each contribute (2*4 - 2*2)^2 / (4*2*2) = 1 -> chi2_micro 2e6,
    # v2 = 2e6 // (4 * min(1,1)*... = 4) = 500000
    assert r["n_events"] == 4
    assert r["chi2_micro"] == 2_000_000
    assert r["v2_ppm"] == 500_000


def test_ab_test_z2_exact():
    t = pd.Timestamp("2024-01-01")
    # cohort 0 (even users): 2,4 -> user 2 converts; cohort 1 (odd):
    # 1,3 -> none. a=1,n1=2,b=0,n2=2,n=4,conv=1
    # z2 = (1*2-0*2)^2 * 4 / (2*2*1*3) = 16/12 -> 1333333 micro
    rows = [(1, 2, t, "purchase", 0.0), (2, 2, t, "view", 0.0),
            (3, 4, t, "view", 0.0), (4, 1, t, "view", 0.0),
            (5, 3, t, "view", 0.0)]
    with tempfile.TemporaryDirectory() as d:
        import tests.test_round5_session34 as s34
        s34._write_events(d, rows)
        out = q.QUERIES["ab_test_lift"](d).to_pandas()
    r = out.iloc[0]
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (2, 1, 2, 0)
    assert r["diff_sign"] == 1
    assert r["z2_micro"] == 16_000_000 // 12


def test_lorenz_ntile_remainder_rule():
    # 12 customers, revenue = custkey dollars -> sorted ascending;
    # ntile(10): first 2 deciles take 2 customers, rest 1
    rows = [(i, i, "2024-01-01", float(i)) for i in range(1, 13)]
    with tempfile.TemporaryDirectory() as d:
        _write_orders36_money(d, rows)
        out = q.QUERIES["lorenz_deciles"](d).to_pandas()
    assert out["n_customers"].to_list() == [2, 2] + [1] * 8
    assert out["cents"].to_list() == [300, 700, 500, 600, 700, 800,
                                      900, 1000, 1100, 1200]
    total = 7800
    cum = pd.Series(out["cents"]).cumsum()
    assert out["cum_share_ppm"].to_list() == \
        [1_000_000 * int(c) // total for c in cum]


def test_fifo_overlap_allocation():
    # part 1 lots (A): 10 then 5; sales (R): 12 then 3
    # cum lots:  [0,10), [10,15); cum sales: [0,12), [12,15)
    # allocations: lot1/sale1 10, lot2/sale1 2, lot2/sale2 3
    df = pd.DataFrame({
        "l_orderkey": [1, 2, 3, 4], "l_partkey": 1,
        "l_suppkey": 1, "l_linenumber": [1, 1, 1, 1],
        "l_quantity": [10.0, 5.0, 12.0, 3.0],
        "l_extendedprice": 1.0, "l_discount": 0.0, "l_tax": 0.0,
        "l_returnflag": ["A", "A", "R", "R"], "l_linestatus": "O",
        "l_shipdate": pd.to_datetime(["1996-01-01", "1996-01-05",
                                      "1996-01-03", "1996-01-07"])})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "lineitem.parquet"))
        out = q.QUERIES["fifo_allocation"](d).to_pandas() \
            .sort_values(["lot_order", "sale_order"]).reset_index(drop=True)
    assert out[["lot_order", "sale_order", "alloc_qty_c"]] \
        .values.tolist() == [[1, 3, 1000], [2, 3, 200], [2, 4, 300]]


def test_skyline_strict_dominance():
    # (price, size): (5,9) front; (5,9) duplicate stays (no strict);
    # (5,10) dominated by (5,9); (4,12) front (cheapest);
    # (6,8) front (smallest size); (6,9) dominated by (5,9)
    part = pd.DataFrame({
        "p_partkey": [1, 2, 3, 4, 5, 6], "p_name": "w",
        "p_brand": "B", "p_type": "T",
        "p_size": [9, 9, 10, 12, 8, 9],
        "p_retailprice": [0.05, 0.05, 0.05, 0.04, 0.06, 0.06]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(part),
                       os.path.join(d, "part.parquet"))
        out = q.QUERIES["skyline_parts"](d).to_pandas()
    assert out["p_partkey"].to_list() == [1, 2, 4, 5]


def test_best_split_pure_separation():
    t = pd.Timestamp("2024-01-01")
    # values 1.00,2.00 -> views; 3.00,4.00 -> purchases. Split at
    # 2.00 separates perfectly: gini 0
    rows = [(1, 1, t, "view", 1.00), (2, 1, t, "view", 2.00),
            (3, 1, t, "purchase", 3.00), (4, 1, t, "purchase", 4.00)]
    with tempfile.TemporaryDirectory() as d:
        import tests.test_round5_session34 as s34
        s34._write_events(d, rows)
        out = q.QUERIES["best_split"](d).to_pandas()
    r = out.iloc[0]
    assert r["threshold_c"] == 200
    assert (r["n_left"], r["n_right"]) == (2, 2)
    assert r["gini_micro"] == 0


def test_odds_ratio_exact():
    # big(qty>25): (30,R) a=1, (30,N) b=1; small: (10,R) c=1,
    # (10,N) d=3 -> OR = 1*3/(1*1) = 3e6 ppm
    df = pd.DataFrame({
        "l_orderkey": range(1, 7), "l_partkey": 1, "l_suppkey": 1,
        "l_linenumber": 1,
        "l_quantity": [30.0, 30.0, 10.0, 10.0, 10.0, 10.0],
        "l_extendedprice": 1.0, "l_discount": 0.0, "l_tax": 0.0,
        "l_returnflag": ["R", "N", "R", "N", "N", "N"],
        "l_linestatus": "O",
        "l_shipdate": pd.to_datetime(["1996-01-01"] * 6)})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "lineitem.parquet"))
        out = q.QUERIES["odds_ratio"](d).to_pandas()
    r = out.iloc[0]
    assert (r["big_returned"], r["big_kept"], r["small_returned"],
            r["small_kept"]) == (1, 1, 1, 3)
    assert r["or_ppm"] == 3_000_000


def test_nation_parity_full_outer():
    # nation 0: 2 customers, 0 suppliers (right-missing); nation 1:
    # 1 and 1; nation 2: 0 customers, 1 supplier (left-missing)
    with tempfile.TemporaryDirectory() as d:
        _write_customer_bal(d, [(1, 0, 0.0), (2, 0, 0.0), (3, 1, 0.0)])
        _write_supplier_nat(d, [(1, 1, 0.0), (2, 2, 0.0)])
        out = q.QUERIES["nation_parity"](d).to_pandas() \
            .sort_values("nationkey").reset_index(drop=True)
    assert out.values.tolist() == [[0, 2, 0, 1], [1, 1, 1, 0],
                                   [2, 0, 1, -1]]


def test_hist_equalize_lut():
    t = pd.Timestamp("2024-01-01")
    # values 1.00 x2, 2.00 x1, 3.00 x1 -> cum 2,3,4 of 4
    rows = [(1, 1, t, "view", 1.00), (2, 1, t, "view", 1.00),
            (3, 1, t, "view", 2.00), (4, 1, t, "view", 3.00)]
    with tempfile.TemporaryDirectory() as d:
        import tests.test_round5_session34 as s34
        s34._write_events(d, rows)
        out = q.QUERIES["hist_equalize"](d).to_pandas() \
            .sort_values("value_c").reset_index(drop=True)
    assert out["value_c"].to_list() == [100, 200, 300]
    assert out["n_at"].to_list() == [2, 1, 1]
    assert out["eq_byte"].to_list() == [2 * 255 // 4, 3 * 255 // 4, 255]


def test_segment_migration_quartiles_and_absents():
    # H1 (<1998-07): customers 1..4 with revenue 1,2,3,4 -> quartiles
    # 1,2,3,4; H2: only customer 1 (quartile 1 of a 1-customer half);
    # customer 5 appears only in H2
    rows = [(1, 1, "1996-01-01", 1.00), (2, 2, "1996-01-02", 2.00),
            (3, 3, "1996-01-03", 3.00), (4, 4, "1996-01-04", 4.00),
            (5, 1, "1999-01-01", 1.00), (6, 5, "1999-01-02", 5.00)]
    with tempfile.TemporaryDirectory() as d:
        _write_orders36_money(d, rows)
        out = q.QUERIES["segment_migration"](d).to_pandas() \
            .sort_values(["q_h1", "q_h2"]).reset_index(drop=True)
    got = {(int(a), int(b)): int(n) for a, b, n in out.values}
    # H2 ntile(4) over 2 customers (1: 1.00, 5: 5.00) -> quartiles 1,2
    assert got == {(1, 1): 1, (2, 0): 1, (3, 0): 1, (4, 0): 1,
                   (0, 2): 1}


def test_cohort_ltv_week_offsets():
    t = pd.Timestamp("2024-01-04")  # Thursday, epoch-day multiple of 7
    w = pd.Timedelta(days=7)
    # user 1 signs up week W; purchases 10.00 in W, 5.00 in W+2;
    # a purchase in W+5 is outside the 0..3 window; user 2 never
    # signs up -> its purchase is dropped
    rows = [(1, 1, t, "signup", 0.0),
            (2, 1, t + pd.Timedelta(days=1), "purchase", 10.00),
            (3, 1, t + 2 * w, "purchase", 5.00),
            (4, 1, t + 5 * w, "purchase", 99.00),
            (5, 2, t, "purchase", 7.00)]
    with tempfile.TemporaryDirectory() as d:
        import tests.test_round5_session34 as s34
        s34._write_events(d, rows)
        out = q.QUERIES["cohort_ltv"](d).to_pandas() \
            .sort_values("offset").reset_index(drop=True)
    wk = (t - pd.Timestamp("1970-01-01")).days // 7
    assert out[["cohort_week", "offset", "n_users", "rev_cents"]] \
        .values.tolist() == [[wk, 0, 1, 1000], [wk, 2, 1, 500]]


def test_apportionment_largest_remainder():
    # counts 3,3,1 of 7 -> quotas 428.57,428.57,142.86; bases
    # 428,428,142 = 998; two leftover seats to the largest remainders:
    # rem are 4/7,4/7,6/7 scaled -> nation 2 (rem 857..) first, then
    # tie 571 between nations 0,1 -> smaller key wins
    cust = [(i, nk, 0.0) for i, nk in
            enumerate([0, 0, 0, 1, 1, 1, 2], start=1)]
    with tempfile.TemporaryDirectory() as d:
        _write_customer_bal(d, cust)
        out = q.QUERIES["apportionment"](d).to_pandas() \
            .sort_values("c_nationkey").reset_index(drop=True)
    assert out["seats"].to_list() == [429, 428, 143]
    assert out["seats"].sum() == 1000


def test_rolling_median_order_statistic():
    # 8 days of revenue 5,1,9,3,7,2,8,4 -> full windows at d7 (med of
    # 5,1,9,3,7,2,8 = 5) and d8 (med of 1,9,3,7,2,8,4 = 4)
    vals = [5, 1, 9, 3, 7, 2, 8, 4]
    rows = [(i + 1, 1, f"2024-01-{i+1:02d}", float(v))
            for i, v in enumerate(vals)]
    with tempfile.TemporaryDirectory() as d:
        _write_orders36_money(d, rows)
        out = q.QUERIES["rolling_median"](d).to_pandas() \
            .sort_values("d").reset_index(drop=True)
    assert out["med7_cents"].to_list() == [500, 400]


def test_robust_outliers_median_mad():
    t = pd.Timestamp("2024-01-01")
    # 'view' values: 1,2,3,4,100 -> n=5, k=3, median 3; deviations
    # 2,1,0,1,97 -> sorted 0,1,1,2,97, MAD = 1; outliers: dv > 3 -> 100
    vals = [1.00, 2.00, 3.00, 4.00, 100.00]
    rows = [(i + 1, 1, t, "view", v) for i, v in enumerate(vals)]
    with tempfile.TemporaryDirectory() as d:
        import tests.test_round5_session34 as s34
        s34._write_events(d, rows)
        out = q.QUERIES["robust_outliers"](d).to_pandas()
    r = out.iloc[0]
    assert (r["n_events"], r["median_c"], r["mad_c"],
            r["n_outliers"]) == (5, 300, 100, 1)


def test_grid_fill_zero_cells():
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": "x", "n_chars": 1,
        "lang": ["en", "de", "en"],
        "source": ["s1", "s1", "s2"]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(docs),
                       os.path.join(d, "documents.parquet"))
        out = q.QUERIES["grid_fill"](d).to_pandas()
    got = {(s, l): int(n) for s, l, n in out.values}
    # (s2, de) is the absent cell filled with 0
    assert got == {("s1", "de"): 1, ("s1", "en"): 1,
                   ("s2", "de"): 0, ("s2", "en"): 1}


def test_containment_direction():
    # doc 1 = 4 tokens -> 2 shingles, both inside doc 2 (6 tokens, 4
    # shingles): cont_a = 1e6, cont_b = 500000; doc 3 shares nothing
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c d", "a b c d e f", "x y z w v"],
        "lang": "en", "source": "s", "n_chars": 7})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(docs),
                       os.path.join(d, "documents.parquet"))
        out = q.QUERIES["containment_pairs"](d).to_pandas()
    assert out[["doc_id_a", "doc_id_b", "inter", "cont_a_ppm",
                "cont_b_ppm"]].values.tolist() == [[1, 2, 2, 1_000_000,
                                                    500_000]]


def test_ring_rebalance_vs_mod():
    import hashlib
    docs = pd.DataFrame({"doc_id": list(range(1, 201)), "text": "x",
                         "lang": "en", "source": "s", "n_chars": 1})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(docs),
                       os.path.join(d, "documents.parquet"))
        out = q.QUERIES["ring_rebalance"](d).to_pandas()
    r = out.iloc[0]
    assert r["n_keys"] == 200
    # modulo: a key stays only when id%16 == id%17, i.e. id % 272 < 16
    expect_mod = sum(1 for i in range(1, 201) if i % 16 != i % 17)
    assert r["moved_mod"] == expect_mod
    # ring: recompute the reference assignment directly
    r16 = sorted(hashlib.md5(f"node-{i}".encode()).hexdigest()
                 for i in range(16))
    r17 = sorted(hashlib.md5(f"node-{i}".encode()).hexdigest()
                 for i in range(17))
    def assign(ring, kp):
        for p in ring:
            if p >= kp:
                return p
        return ring[0]
    moved = sum(
        1 for i in range(1, 201)
        if assign(r16, hashlib.md5(str(i).encode()).hexdigest())
        != assign(r17, hashlib.md5(str(i).encode()).hexdigest()))
    assert r["moved_ring"] == moved
    # consistent hashing must move strictly fewer keys than modulo
    assert r["moved_ring"] < r["moved_mod"]
