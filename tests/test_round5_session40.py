"""Round-5 session-40: Good-Turing spectrum, Chao1 richness, Heaps'
growth curve, BLEU clipped precision — hand-computed value pins."""

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


def test_good_turing_discount_ledger():
    # freqs: a=2, b=2, c=1 -> N_1=1, N_2=2
    # r*=1: 1000*2*N_2/N_1 = 4000; r*=2: N_3 absent -> 0
    rows = [(0, "s", "a a b"), (1, "s", "b c")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["good_turing"](d).to_pandas()
    got = {r.r: (r.n_r, r.r_star_milli) for r in out.itertuples()}
    assert got == {1: (1, 4000), 2: (2, 0)}


def test_chao1_bias_corrected_form():
    # s1 "a a b c": D=3 f1=2 f2=1 -> 3 + 2*1//4 = 3
    # s2 "x y":     D=2 f1=2 f2=0 -> 2 + 2*1//2 = 3
    rows = [(0, "s1", "a a b c"), (1, "s2", "x y")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["chao1_richness"](d).to_pandas()
    got = {r.source: (r.n_types, r.f1, r.f2, r.chao1)
           for r in out.itertuples()}
    assert got == {"s1": (3, 2, 1, 3), "s2": (2, 2, 0, 3)}


def test_heaps_law_cumulative_deciles():
    # docs 0 ("a a") and 1 ("a b"); mx=1 -> deciles 0 and 5
    # d<5: N=2 V=1 beta=0; d>=5: N=4 V=2 beta=floor(1000 ln2/ln4)
    rows = [(0, "s", "a a"), (1, "s", "a b")]
    beta_hi = math.floor(1000 * math.log(2.0) / math.log(4.0))
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["heaps_law"](d).to_pandas()
    got = {r.decile: (r.cum_tokens, r.cum_vocab, r.beta_milli)
           for r in out.itertuples()}
    assert got == {dd: ((2, 1, 0) if dd < 5 else (4, 2, beta_hi))
                   for dd in range(10)}


def test_bleu_clipped_precision_pairs():
    # A "a b c" vs B "b c c": uni clipped 2/3 both ways; bi clipped 1/2
    rows = [(0, "A", "a b c"), (1, "B", "b c c")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["bleu_precision"](d).to_pandas()
    got = {(r.cand, r.ref, r.n): (r.clipped, r.total_cand, r.prec_ppm)
           for r in out.itertuples()}
    assert got == {
        ("A", "B", 1): (2, 3, 666666), ("A", "B", 2): (1, 2, 500000),
        ("B", "A", 1): (2, 3, 666666), ("B", "A", 2): (1, 2, 500000)}
