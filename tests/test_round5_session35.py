"""Round-5 session-35: rank/order statistics and blocking operators over
the daily-revenue series and dimension tables — hand-computed value pins
for each new oracle-checked query."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import dug_ray.queries as q


def _write_orders(d, rows):
    df = pd.DataFrame(rows, columns=["o_orderkey", "o_custkey",
                                     "o_orderdate", "o_totalprice"])
    df["o_orderstatus"] = "O"
    df["o_orderpriority"] = "3-MEDIUM"
    df["o_orderdate"] = pd.to_datetime(df["o_orderdate"])
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "orders.parquet"))


def test_kendall_gamma_known_series():
    # daily revenue (cents): d0=100, d1=300, d2=200, d3=300
    # pairs (i<j): (0,1)+ (0,2)+ (0,3)+ (1,2)- (1,3)tie (2,3)+
    rows = [(1, 1, "2024-01-01", 1.00), (2, 1, "2024-01-02", 3.00),
            (3, 1, "2024-01-03", 2.00), (4, 1, "2024-01-04", 3.00)]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(d, rows)
        out = q.QUERIES["kendall_gamma"](d).to_pandas().iloc[0]
    assert out["n_days"] == 4
    assert out["n_concordant"] == 4 and out["n_discordant"] == 1
    assert out["n_ties"] == 1
    # gamma = 1e6 * (4 - 1) // 5 = 600000
    assert out["gamma_ppm"] == 600_000


def test_kendall_gamma_negative_truncates():
    # strictly decreasing: P=0 Q=3 -> gamma = -1e6 exactly; with a tie
    # mix it would exercise trunc-toward-zero — pin the sign path
    rows = [(1, 1, "2024-01-01", 3.00), (2, 1, "2024-01-02", 2.00),
            (3, 1, "2024-01-03", 1.00)]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(d, rows)
        out = q.QUERIES["kendall_gamma"](d).to_pandas().iloc[0]
    assert out["gamma_ppm"] == -1_000_000


def test_runs_test_known_series():
    # cents: 100, 300, 100, 300, 300  -> sorted 100,100,300,300,300
    # lower median = (5+1)//2 = 3rd = 300; signs (>300): 0,0,0,0,0 -> 1 run
    rows = [(1, 1, "2024-01-01", 1.00), (2, 1, "2024-01-02", 3.00),
            (3, 1, "2024-01-03", 1.00), (4, 1, "2024-01-04", 3.00),
            (5, 1, "2024-01-05", 3.00)]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(d, rows)
        out = q.QUERIES["runs_test"](d).to_pandas().iloc[0]
    assert out["n_days"] == 5 and out["median_cents"] == 300
    assert out["n_above"] == 0 and out["n_below"] == 5
    assert out["n_runs"] == 1


def test_runs_test_alternating():
    # cents: 100, 900, 100, 900 -> lower median (4+1)//2 = 2nd = 100
    # signs: 0,1,0,1 -> 4 runs, 2 above / 2 below
    rows = [(1, 1, "2024-01-01", 1.00), (2, 1, "2024-01-02", 9.00),
            (3, 1, "2024-01-03", 1.00), (4, 1, "2024-01-04", 9.00)]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(d, rows)
        out = q.QUERIES["runs_test"](d).to_pandas().iloc[0]
    assert out["median_cents"] == 100
    assert out["n_above"] == 2 and out["n_below"] == 2
    assert out["n_runs"] == 4


def _write_docs(d, texts):
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df["lang"] = "en"
    df["source"] = "s"
    df["n_chars"] = df["text"].str.len()
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "documents.parquet"))


def test_bloom_registers_single_term():
    import hashlib
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, ["hello hello"])
        out = q.QUERIES["bloom_registers"](d).to_pandas()
    assert len(out) == 256 and out["bit_idx"].to_list() == list(range(256))
    hv = int(hashlib.md5(b"hello").hexdigest()[:16], 16)
    expect = {(hv >> (8 * s)) & 255 for s in range(4)}
    got = set(out[out["bit"] == 1]["bit_idx"])
    assert got == expect


def test_bloom_registers_union_is_or():
    import hashlib
    # two docs, disjoint terms: filter == OR of the two single-term sets
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, ["alpha", "beta"])
        out = q.QUERIES["bloom_registers"](d).to_pandas()
    expect = set()
    for t in (b"alpha", b"beta"):
        hv = int(hashlib.md5(t).hexdigest()[:16], 16)
        expect |= {(hv >> (8 * s)) & 255 for s in range(4)}
    assert set(out[out["bit"] == 1]["bit_idx"]) == expect


def _write_lineitem_prices(d, rows):
    df = pd.DataFrame(rows, columns=["l_extendedprice", "l_returnflag"])
    df["l_orderkey"] = range(1, len(df) + 1)
    df["l_partkey"] = 1
    df["l_suppkey"] = 1
    df["l_linenumber"] = 1
    df["l_quantity"] = 1.0
    df["l_discount"] = 0.0
    df["l_tax"] = 0.0
    df["l_linestatus"] = "O"
    df["l_shipdate"] = pd.Timestamp("2024-01-01")
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "lineitem.parquet"))


def test_mann_whitney_no_ties():
    # R group: 1.00, 3.00 (ranks 1, 3); other: 2.00, 4.00 (ranks 2, 4)
    # r2_sum_r = 2*(1+3) = 8; U_R = n1*n2 + n1(n1+1)/2 - R1 = 4+3-4 = 3
    rows = [(1.00, "R"), (3.00, "R"), (2.00, "N"), (4.00, "N")]
    with tempfile.TemporaryDirectory() as d:
        _write_lineitem_prices(d, rows)
        out = q.QUERIES["mann_whitney"](d).to_pandas().iloc[0]
    assert out["n_r"] == 2 and out["n_other"] == 2
    assert out["r2_sum_r"] == 8
    assert out["u2_r"] == 6


def test_mann_whitney_tied_ranks():
    # values: 1.00(R), 2.00(R), 2.00(N), 3.00(N)
    # tied 2.00s share avg rank 2.5 -> 2*ranks of R = 2*1 + 5 = 7
    # U_R = 4 + 3 - 3.5 = 3.5 -> u2_r = 7
    rows = [(1.00, "R"), (2.00, "R"), (2.00, "N"), (3.00, "N")]
    with tempfile.TemporaryDirectory() as d:
        _write_lineitem_prices(d, rows)
        out = q.QUERIES["mann_whitney"](d).to_pandas().iloc[0]
    assert out["r2_sum_r"] == 7
    assert out["u2_r"] == 2 * 2 * 2 + 2 * 3 - 7


def test_truss_support_values_and_paths():
    import ray.data

    from dug_ray.stages.graph import truss_support

    # two triangles sharing edge (b, c), plus a pendant chain d-e
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d"),
             ("d", "e")]
    ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["subj", "obj"]))
    local = truss_support(ds, num_buckets=4).to_pandas()
    dist = truss_support(ds, num_buckets=4,
                         max_driver_edges=0).to_pandas()
    key = ["subj", "obj"]
    pd.testing.assert_frame_equal(
        local.sort_values(key).reset_index(drop=True),
        dist.sort_values(key).reset_index(drop=True))
    got = local.set_index(["subj", "obj"])["support"]
    # (b,c) closes both triangles; the four flank edges close one each;
    # the pendant edge closes none but is KEPT at support 0
    assert got[("b", "c")] == 2
    assert got[("a", "b")] == 1 and got[("a", "c")] == 1
    assert got[("b", "d")] == 1 and got[("c", "d")] == 1
    assert got[("d", "e")] == 0
    assert len(got) == 6


def test_revenue_recognition_exact_total():
    # one order of 100.37 -> 10037 cents over 30 days: 334 cents on the
    # first 17 days (10037 % 30 = 17), 334... check: 10037 // 30 = 334,
    # remainder 17 -> days 0..16 get 335, days 17..29 get 334
    rows = [(1, 1, "2024-03-01", 100.37)]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(d, rows)
        out = q.QUERIES["revenue_recognition"](d).to_pandas() \
            .sort_values("d").reset_index(drop=True)
    assert len(out) == 30
    assert out["cents_recognized"].sum() == 10037
    assert (out["cents_recognized"].iloc[:17] == 335).all()
    assert (out["cents_recognized"].iloc[17:] == 334).all()
    d0 = (pd.Timestamp("2024-03-01") - pd.Timestamp("1970-01-01")).days
    assert out["d"].to_list() == list(range(d0, d0 + 30))


def test_revenue_recognition_overlapping_orders_fold():
    # two orders one day apart: overlapping windows sum per day
    rows = [(1, 1, "2024-03-01", 0.30), (2, 1, "2024-03-02", 0.60)]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(d, rows)
        out = q.QUERIES["revenue_recognition"](d).to_pandas() \
            .sort_values("d").reset_index(drop=True)
    # 30 cents / 30 days = 1/day; 60 cents = 2/day; 31 distinct days
    assert len(out) == 31
    assert out["cents_recognized"].iloc[0] == 1
    assert (out["cents_recognized"].iloc[1:30] == 3).all()
    assert out["cents_recognized"].iloc[30] == 2
    assert out["cents_recognized"].sum() == 90


def test_l_diversity_leaky_class():
    # class (1, A): 3 rows all in the same band -> l_distinct 1 (leaky)
    # class (2, B): 2 rows in different bands -> l_distinct 2
    df = pd.DataFrame({
        "c_custkey": [1, 2, 3, 4, 5],
        "c_name": ["x"] * 5,
        "c_nationkey": [1, 1, 1, 2, 2],
        "c_acctbal": [100.00, 150.00, 199.99, 100.00, 1500.00],
        "c_mktsegment": ["A", "A", "A", "B", "B"],
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "customer.parquet"))
        out = q.QUERIES["l_diversity"](d).to_pandas() \
            .set_index(["c_nationkey", "c_mktsegment"])
    assert out.loc[(1, "A"), "n_rows"] == 3
    assert out.loc[(1, "A"), "l_distinct"] == 1
    assert out.loc[(2, "B"), "l_distinct"] == 2


def test_l_diversity_negative_band_shift():
    # -999.99 -> cents -99999 -> +100000 = 1 -> band 1 // 100000 = 0;
    # 0.00 -> band 1: the shift keeps trunc == floor on both engines
    df = pd.DataFrame({
        "c_custkey": [1, 2],
        "c_name": ["x", "y"],
        "c_nationkey": [1, 1],
        "c_acctbal": [-999.99, 0.00],
        "c_mktsegment": ["A", "A"],
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "customer.parquet"))
        out = q.QUERIES["l_diversity"](d).to_pandas().iloc[0]
    assert out["n_rows"] == 2 and out["l_distinct"] == 2


def test_gap_interpolate_exact_line():
    # present: d0 cents=100, d0+3 cents=400; gaps at d0+1, d0+2 on the
    # exact line 100 + 100*(d-d0): 200e6 and 300e6 micro
    rows = [(1, 1, "2024-01-01", 1.00), (2, 1, "2024-01-04", 4.00)]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(d, rows)
        out = q.QUERIES["gap_interpolate"](d).to_pandas() \
            .sort_values("d").reset_index(drop=True)
    assert len(out) == 4
    assert out["micro_cents"].to_list() == [100_000_000, 200_000_000,
                                            300_000_000, 400_000_000]
    assert out["interpolated"].to_list() == [0, 1, 1, 0]


def test_gap_interpolate_floor_division():
    # present: 0 cents and 100 cents, gap width 3: interior points at
    # 100/3 and 200/3 cents -> floor(1e6*100/3) = 33333333
    rows = [(1, 1, "2024-01-01", 0.00), (2, 1, "2024-01-04", 1.00)]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(d, rows)
        out = q.QUERIES["gap_interpolate"](d).to_pandas() \
            .sort_values("d").reset_index(drop=True)
    assert out["micro_cents"].to_list() == [0, 33_333_333, 66_666_666,
                                            100_000_000]


def test_stickiness_ratio_flag_or():
    t = pd.Timestamp("2024-01-01")
    day = pd.Timedelta(days=1)
    # user 1 active on d0 and d1; user 2 only d0
    rows = [(0, 1, t, "view", 0.0), (1, 2, t, "view", 0.0),
            (2, 1, t + day, "view", 0.0)]
    with tempfile.TemporaryDirectory() as d:
        import tests.test_round5_session34 as s34
        s34._write_events(d, rows)
        out = q.QUERIES["stickiness_ratio"](d).to_pandas() \
            .set_index("day")
    d0 = (t - pd.Timestamp("1970-01-01")).days
    # d0: dau 2, wau 2, ratio 1e6; d1: dau 1 (user 1, who is ALSO in the
    # window from d0 -- the flag must OR to today), wau 2 -> 500000
    assert out.loc[d0, "dau"] == 2 and out.loc[d0, "wau7"] == 2
    assert out.loc[d0, "stickiness_ppm"] == 1_000_000
    assert out.loc[d0 + 1, "dau"] == 1 and out.loc[d0 + 1, "wau7"] == 2
    assert out.loc[d0 + 1, "stickiness_ppm"] == 500_000
    # spine is calendar-bounded at the max active day (oracle's
    # generate_series(d0, d1)) -- no trailing dau-0 days
    assert len(out) == 2


def test_drawdown_peak_ledger():
    # daily cents: 300, 100, 200 -> cum 300, 400, 600? no: orders per
    # day; cum 300, 400, 600 never draws down. make a dip: days with
    # revenue always increase cum -- drawdown of a REVENUE ledger is
    # always 0. Use it as the monotone pin:
    rows = [(1, 1, "2024-01-01", 3.00), (2, 1, "2024-01-02", 1.00)]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(d, rows)
        out = q.QUERIES["drawdown"](d).to_pandas() \
            .sort_values("d").reset_index(drop=True)
    assert out["cum_cents"].to_list() == [300, 400]
    assert out["peak_cents"].to_list() == [300, 400]
    assert out["dd_cents"].to_list() == [0, 0]
