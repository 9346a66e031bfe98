"""Round-5 session-48: best snippet, curriculum buckets, median of
medians — hand-computed pins."""

from __future__ import annotations

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


def test_best_snippet_earliest_max_window():
    # hits at pos 1, 3, 10: windows [1..8]=2, [3..10]=2, [10..17]=1
    # -> max 2, earliest anchor 1; doc1 has no hits -> absent
    rows = [(0, "s", "fast a fast b c d e f g fast"),
            (1, "s", "x y z")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["best_snippet"](d).to_pandas()
    got = {r.doc_id: (r.win_start, r.n_hits) for r in out.itertuples()}
    assert got == {0: (1, 2)}


def test_curriculum_quintile_stages():
    # TTR milli scores 200, 250, 500, 750, 1000 -> one per stage
    rows = [(0, "s", "a a a a a"), (1, "s", "a a a a"),
            (2, "s", "a a b b"), (3, "s", "a a b c"),
            (4, "s", "a b c d")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["curriculum_buckets"](d).to_pandas()
    got = {r.stage: (r.n_docs, r.sum_tokens, r.mean_score_milli)
           for r in out.itertuples()}
    assert got == {1: (1, 5, 200), 2: (1, 4, 250), 3: (1, 4, 500),
                   4: (1, 4, 750), 5: (1, 4, 1000)}


def test_median_of_medians_singleton_deciles():
    # keys 0..9 (one per decile), prices 1..10 dollars: both medians
    # are the 5th smallest = 500 cents
    df = pd.DataFrame({"o_orderkey": range(10),
                       "o_totalprice": [float(i) for i in
                                        range(1, 11)]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["median_of_medians"](d).to_pandas()
    assert out.iloc[0].to_dict() == {
        "true_median": 500, "mom": 500, "abs_err": 0}
