"""Round-5 session-58g: XmR control chart, Nelson–Aalen hazard,
empirical-Bayes rate shrinkage — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import dug_ray.queries as q


def test_xmr_chart_limits_and_flag():
    # counts 10,12,10,11,12,10,11,40: mRs 2,2,1,1,2,1,29 (sum 38);
    # x-bar = 116/8 = 14.5; UCL = 14.5 + 2.66*38/7 ≈ 28.94 -> the
    # 40-spike breaches; LCL ≈ 0.06 -> nothing below
    xs = [10, 12, 10, 11, 12, 10, 11, 40]
    dates = sum(([f"2024-01-{i + 1:02d}"] * x
                 for i, x in enumerate(xs)), [])
    df = pd.DataFrame({"o_orderdate": pd.to_datetime(dates)})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["xmr_chart"](d).to_pandas()
    assert list(out["x"]) == xs
    assert list(out["mr"]) == [0, 2, 2, 1, 1, 2, 1, 29]
    ucl = math.floor(1000 * (116 / 8 + 2.66 * 38 / 7))
    lcl = math.floor(1000 * (116 / 8 - 2.66 * 38 / 7))
    assert list(out["ucl_milli"]) == [ucl] * 8
    assert list(out["lcl_milli"]) == [lcl] * 8
    assert list(out["flag"]) == [0, 0, 0, 0, 0, 0, 0, 1]


def test_nelson_aalen_hand_hazards():
    # 4 users, last event day max = day 9; censored iff l >= 7.
    # lifetimes: u0 f=0 l=1 (t=1, death), u1 f=0 l=2 (t=2, death),
    # u2 f=0 l=9 (t=9, censored), u3 f=1 l=9 (t=8, censored)
    rows = []
    eid = 0
    for u, days in enumerate([[0, 1], [0, 2], [0, 9], [1, 9]]):
        for day in days:
            rows.append((eid, u, f"2024-01-{day + 1:02d}", "view"))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type"])
    df["ts"] = pd.to_datetime(df["ts"])
    df["value"] = 1.0
    df["props"] = "{}"
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "events.parquet"))
        out = q.QUERIES["nelson_aalen"](d).to_pandas()
    # t=1: n=4 d=1 -> 250000; t=2: n=3 d=1 -> +333333;
    # t=8, t=9: censored only, haz 0
    got = list(zip(out["t"], out["n_at_risk"], out["deaths"],
                   out["haz_micro"], out["cum_haz_micro"]))
    assert got[0] == (1, 4, 1, 250000, 250000)
    assert got[1] == (2, 3, 1, 333333, 583333)
    assert [g[3] for g in got[2:]] == [0, 0]


def test_eb_shrinkage_pulls_to_global():
    # part 1: 1/1 returned; part 2: 49/100; global X/N = 50/101
    rows = [(1, "R")] + [(2, "R")] * 49 + [(2, "N")] * 51
    df = pd.DataFrame(rows, columns=["l_partkey", "l_returnflag"])
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "lineitem.parquet"))
        out = q.QUERIES["eb_shrinkage"](d).to_pandas()
    assert list(out["l_partkey"]) == [2, 1]  # by volume
    gm = 50 / 101
    r1 = out[out["l_partkey"] == 1].iloc[0]
    assert r1.raw_micro == 1_000_000
    assert r1.shrunk_micro == math.floor(
        1000000 * ((1 + 10.0 * gm) / (1 + 10)))
    # the 1/1 part's shrunk rate drops BELOW the 49/100 part's
    r2 = out[out["l_partkey"] == 2].iloc[0]
    assert r2.shrunk_micro == math.floor(
        1000000 * ((49 + 10.0 * gm) / (100 + 10)))
    assert r1.shrunk_micro < 1_000_000
