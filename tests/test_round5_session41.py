"""Round-5 session-41: WL refinement census, Elias code audit, MASE
forecast error, Fellegi-Sunter pattern census — hand-computed pins."""

from __future__ import annotations

import hashlib
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import dug_ray.queries as q
from dug_ray.queries import _FS_W


def test_wl_labels_path_graph_two_classes():
    # docs "merge hash" and "hash scan" -> linked concepts form the
    # path MONDO:0005148 - MONDO:0000002 - MONDO:0000003 (each doc is
    # one element; merge/hash/scan are lexicon terms with distinct
    # canonical CURIEs).  WL: ends start "1", middle "2";
    # round1: end a=md5("1|2"), mid b=md5("2|1,1");
    # round2: end md5(a|b), mid md5(b|a,a) -> census {end:2, mid:1}
    df = pd.DataFrame({
        "doc_id": [0, 1], "source": ["s", "s"],
        "text": ["merge hash", "hash scan"], "lang": ["en", "en"]})
    df["n_chars"] = df["text"].str.len()
    h = lambda s: hashlib.md5(s.encode()).hexdigest()
    a1, b1 = h("1|2"), h("2|1,1")
    end2, mid2 = h(a1 + "|" + b1), h(b1 + "|" + a1 + "," + a1)
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        out = q.QUERIES["wl_labels"](d).to_pandas()
    got = {r.label: r.n_nodes for r in out.itertuples()}
    assert got == {end2: 2, mid2: 1}


def test_elias_code_bit_totals():
    # one user, ts at 0us, 0us, 1us -> gaps [1, 2]
    # gamma: 1 + 3 = 4; delta: 1 + 4 = 5; fixed = 128
    df = pd.DataFrame({
        "event_id": [1, 2, 3], "user_id": [7, 7, 7],
        "ts": pd.to_datetime([0, 0, 1], unit="us")})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "events.parquet"))
        out = q.QUERIES["elias_codes"](d).to_pandas()
    got = {r.user_id: (r.n_gaps, r.gap_sum, r.gamma_bits, r.delta_bits,
                       r.fixed_bits) for r in out.itertuples()}
    assert got == {7: (2, 3, 4, 5, 128)}


def test_mase_seasonal_vs_naive():
    # 9 consecutive days, revenue 1..9 dollars: scored days t=7,8
    # seasonal |y-y7| = 700+700; naive |y-y1| = 100+100
    days = pd.to_datetime([f"1996-01-{dd:02d}" for dd in range(1, 10)])
    df = pd.DataFrame({"o_orderdate": days,
                       "o_totalprice": [float(i) for i in range(1, 10)]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["mase_forecast"](d).to_pandas()
    assert out.iloc[0].to_dict() == {
        "n_days": 2, "sum_abs_seasonal": 1400, "sum_abs_naive": 200,
        "mase_ppm": 7_000_000}


def test_fellegi_sunter_pattern_weights():
    # block 'red': p1(B1,T1,5) p2(B1,T1,5) p3(B1,T2,6)
    # pairs: (1,2) all agree; (1,3),(2,3) brand only
    df = pd.DataFrame({
        "p_partkey": [1, 2, 3, 4],
        "p_name": ["red a", "red b", "red c", "blue d"],
        "p_brand": ["B1", "B1", "B1", "B9"],
        "p_type": ["T1", "T1", "T2", "T9"],
        "p_size": [5, 5, 6, 1]})
    w_all = _FS_W["brand"][0] + _FS_W["type"][0] + _FS_W["size"][0]
    w_brand = _FS_W["brand"][0] + _FS_W["type"][1] + _FS_W["size"][1]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "part.parquet"))
        out = q.QUERIES["fellegi_sunter"](d).to_pandas()
    got = {(r.agree_brand, r.agree_type, r.agree_size):
           (r.n_pairs, r.weight_micro) for r in out.itertuples()}
    assert got == {(1, 1, 1): (1, w_all), (1, 0, 0): (2, w_brand)}
