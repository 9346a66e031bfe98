"""Round-5 session-56: clarity score, blocking recall, top-terms
stability — hand-computed pins."""

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


def test_clarity_score_single_feedback_doc():
    # 'fast' feedback = doc0 {"fast", "a"}; C=4, F=2, both ratios = 2
    rows = [(0, "s", "fast a"), (1, "s", "b b")]
    t = math.floor(1_000_000 * math.log(
        (1.0 * 4.0) / (2.0 * 1.0)))
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["clarity_score"](d).to_pandas()
    got = {r.query_term: (r.fb_tokens, r.clarity_sum_micro,
                          r.clarity_micro) for r in out.itertuples()}
    assert got == {"fast": (2, 2 * t, t)}


def test_blocking_recall_split_group():
    # (B1,T1,5) has 3 parts -> 3 truth pairs; 'red'/'rod' share block
    # 'rd' (1 captured pair), 'mud' lands in 'md'
    df = pd.DataFrame({
        "p_name": ["red a", "rod b", "mud c"],
        "p_brand": ["B1"] * 3, "p_type": ["T1"] * 3,
        "p_size": [5, 5, 5]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "part.parquet"))
        out = q.QUERIES["blocking_recall"](d).to_pandas()
    assert out.iloc[0].to_dict() == {
        "truth_pairs": 3, "captured_pairs": 1, "recall_ppm": 333333}


def test_topterms_stability_two_deciles():
    # global top terms {a, b, c}; decile 0 top = {a, b}, decile 5 =
    # {a, c}: overlap 2 each
    rows = [(0, "s", "a a b"), (1, "s", "a c c")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["topterms_stability"](d).to_pandas()
    got = {r.decile: r.overlap10 for r in out.itertuples()}
    assert got == {0: 2, 5: 2}
