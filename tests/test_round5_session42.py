"""Round-5 session-42: LM cross-entropy, sortedness audit, rich-club
coefficient — hand-computed value pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import dug_ray.queries as q


def _write_docs(d, rows):
    df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    df["lang"] = "en"
    df["n_chars"] = df["text"].str.len()
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "documents.parquet"))


def test_lm_crossent_add1_smoothing():
    # A "a b", B "a c": each eval bigram unmatched in the other model
    # surprisal = floor(1e6 * ln((cap + V)/1)) with cap=1, V=2
    rows = [(0, "A", "a b"), (1, "B", "a c")]
    sp = math.floor(1_000_000 * math.log(3.0 / 1.0))
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["lm_crossent"](d).to_pandas()
    got = {(r.train_src, r.eval_src): (r.n_bigrams, r.total_micro,
                                       r.mean_micro)
           for r in out.itertuples()}
    assert got == {("A", "B"): (1, sp, sp), ("B", "A"): (1, sp, sp)}


def test_lm_crossent_matched_bigram():
    # A "a b a b" (c(a,b)=2, c(b,a)=1, cap(a)=2, cap(b)=1, V=2)
    # B "a b"    (eval bigram (a,b) cb=1)
    # train A, eval B: matched -> floor(1e6*ln((2+2)/(2+1)))
    rows = [(0, "A", "a b a b"), (1, "B", "a b")]
    sp_ab = math.floor(1_000_000 * math.log(4.0 / 3.0))
    # train B, eval A: (a,b) cb=2 matched vs cbg=1, cap=1, V=2:
    #   floor(1e6*ln(3/2)) each; (b,a) cb=1 unmatched, cap(b)=0+... B
    #   has no 'b'-prev bigram -> cap=0, V=2: floor(1e6*ln(2/1))
    sp_ba_m = math.floor(1_000_000 * math.log(3.0 / 2.0))
    sp_ba_u = math.floor(1_000_000 * math.log(2.0 / 1.0))
    tot_ba = 2 * sp_ba_m + 1 * sp_ba_u
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["lm_crossent"](d).to_pandas()
    got = {(r.train_src, r.eval_src): (r.n_bigrams, r.total_micro,
                                       r.mean_micro)
           for r in out.itertuples()}
    assert got == {("A", "B"): (1, sp_ab, sp_ab),
                   ("B", "A"): (3, tot_ba, tot_ba // 3)}


def test_sortedness_descent_assignment():
    # keys 0..9 (decile == key), days ascending except day[9]=0:
    # the descent pair (8,9) belongs to decile 8
    days = list(range(9)) + [0]
    df = pd.DataFrame({
        "o_orderkey": range(10),
        "o_orderdate": pd.to_datetime(days, unit="D")})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["sortedness_audit"](d).to_pandas()
    got = {r.decile: (r.n_rows, r.n_pairs, r.n_descents, r.sorted_ppm)
           for r in out.itertuples()}
    expect = {dd: (1, 1, 0, 1_000_000) for dd in range(8)}
    expect[8] = (1, 1, 1, 0)
    expect[9] = (1, 0, 0, 1_000_000)
    assert got == expect


def test_rich_club_path_graph():
    # path M5148 - M0002 - M0003: degrees 1,2,1
    # k=0: N=3, E=2 -> phi = 4e6//6 = 666666; k=1,2 skipped (N<2)
    rows = [(0, "s", "merge hash"), (1, "s", "hash scan")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["rich_club"](d).to_pandas()
    got = [(r.k, r.n_k, r.e_k, r.phi_ppm) for r in out.itertuples()]
    assert got == [(0, 3, 2, 666666)]
