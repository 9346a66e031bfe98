"""Round-5 session-58h: GSP 2-sequence patterns, order-1 char entropy,
MinHash estimator calibration — hand-computed pins."""

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


def test_seq_patterns_strict_order():
    # user 0: a@1, b@2 -> (a,b) yes, (b,a) no, diagonals no (single occ)
    # user 1: b@1, a@2, b@3 -> (a,b) yes, (b,a) yes, (b,b) yes
    rows = [(0, 0, "2024-01-01 00:00:01", "a"),
            (1, 0, "2024-01-01 00:00:02", "b"),
            (2, 1, "2024-01-01 00:00:01", "b"),
            (3, 1, "2024-01-01 00:00:02", "a"),
            (4, 1, "2024-01-01 00:00:03", "b")]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type"])
    df["ts"] = pd.to_datetime(df["ts"])
    df["value"] = 1.0
    df["props"] = "{}"
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "events.parquet"))
        out = q.QUERIES["seq_patterns"](d).to_pandas()
    got = {(r.ant, r.cons): (r.n_users, r.support_ppm)
           for r in out.itertuples()}
    assert got == {("a", "b"): (2, 1_000_000),
                   ("b", "a"): (1, 500_000),
                   ("b", "b"): (1, 500_000)}


def test_markov_entropy_two_contexts():
    # corpus "abab": pairs ab, ba, ab -> n(a.)=2 all 'ab', n(b.)=1 'ba'
    # H = (2*ln(2/2) + 1*ln(1/1)) / 3 = 0
    rows = [(0, "s", "abab")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["markov_entropy"](d).to_pandas()
    r = out.iloc[0]
    assert (r.n_pairs, r.n_contexts, r.n_bigrams, r.h_micro_nats) == \
        (3, 2, 2, 0)
    # corpus "aab aab": pairs aa,ab,b_, _a,aa,ab ('_'=space):
    # n(a.)=4 {aa:2, ab:2}, n(b.)=1 {b_:1}, n(_.)=1 {_a:1}
    # H = (2 ln2 + 2 ln2 + 0 + 0)/6
    rows = [(0, "s", "aab aab")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["markov_entropy"](d).to_pandas()
    r = out.iloc[0]
    exp = (math.floor(1000000 * (2 * math.log(4 / 2))) * 2) // 6
    assert (r.n_pairs, r.h_micro_nats) == (6, exp)


def test_minhash_eval_identical_docs():
    # two identical docs: all 12 components match, true jaccard = 1
    text = "w1 w2 w3 w4 w5 w6"
    rows = [(0, "s", text), (1, "s", text),
            (2, "s", "x1 x2 x3 x4 x5 x6")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["minhash_eval"](d).to_pandas()
    r = out[(out["doc_id_a"] == 0) & (out["doc_id_b"] == 1)].iloc[0]
    assert (r.n_match, r.est_ppm, r.true_ppm, r.err_ppm) == \
        (12, 1_000_000, 1_000_000, 0)
    # the unrelated doc never pairs with the twins
    assert not ((out["doc_id_a"] == 2) | (out["doc_id_b"] == 2)).any()
