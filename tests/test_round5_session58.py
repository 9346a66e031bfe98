"""Round-5 session-58: NDCG@10, MAP/MRR@10, ROC-AUC ranking-evaluation
operators — hand-argued orderings with exact integer pins."""

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


def _gain(rel, rank):
    return int(math.floor(
        1000000 * (math.pow(2, rel) - 1) / math.log(1 + rank)))


def test_ndcg_eval_bm25_vs_graded_rel():
    # term "fast": doc0 tf4/dl4, doc1 tf3/dl32 (long — BM25 demotes),
    # doc2 tf2/dl4; four "b b" docs keep idf positive (df=3 < N/2=3.5).
    # BM25 order is [0, 2, 1] (tf wins at equal dl; the dl-32 doc's
    # denominator ~7.5 sinks it below doc2's ~2.8), so the run's rel
    # sequence is [3, 2, 3] while the ideal is [3, 3, 2].
    rows = [(0, "s", "fast fast fast fast"),
            (1, "s", "fast fast fast " + " ".join(["b"] * 29)),
            (2, "s", "fast fast b b")] + \
           [(i, "s", "b b") for i in range(3, 7)]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["ndcg_eval"](d).to_pandas()
    r = out[out["term"] == "fast"].iloc[0]
    dcg = _gain(3, 1) + _gain(2, 2) + _gain(3, 3)
    idcg = _gain(3, 1) + _gain(3, 2) + _gain(2, 3)
    assert (r.dcg_micro, r.idcg_micro) == (dcg, idcg)
    assert r.ndcg_micro == (1_000_000 * dcg) // idcg
    assert r.ndcg_micro < 1_000_000  # the long tf-3 doc was demoted


def test_map_mrr_exact_rationals():
    # term "sort": doc0 tf3/dl3 (rel), doc1 tf1/dl2 (non-rel, BM25 rank
    # 2 — short doc beats the long rel doc), doc2 tf2/dl16 (rel).
    # Run order [0, 1, 2], rel [1, 0, 1], R=2:
    # AP = (1/1 + 2/3)/2 = 5/6 -> 833333 micro; RR = 1.
    rows = [(0, "s", "sort sort sort"),
            (1, "s", "sort b"),
            (2, "s", "sort sort " + " ".join(["b"] * 14))] + \
           [(i, "s", "c c") for i in range(3, 7)]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["map_mrr"](d).to_pandas()
    r = out[out["term"] == "sort"].iloc[0]
    assert (r.n_rel, r.ap_micro, r.rr_micro) == (2, 833333, 1_000_000)


def test_roc_auc_tie_aware_pairs():
    # pos dollars [10, 20], neg [10, 15]: gt=2 (20>10, 20>15), eq=1
    # (10==10) -> AUC = (2*2+1)/8 = 0.625, Gini = 0.25
    df = pd.DataFrame({
        "o_orderstatus": ["F", "F", "O", "O"],
        "o_totalprice": [10.5, 20.25, 10.75, 15.0],
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["roc_auc"](d).to_pandas()
    r = out.iloc[0]
    assert (r.n_pos, r.n_neg, r.auc_micro, r.gini_micro) == \
        (2, 2, 625000, 250000)
