"""Round-5 session-58j: greedy coverage selection, LSH-pair edit
distance, hot-key salting plan — hand-computed pins."""

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


def test_greedy_cover_marginal_gains():
    # 3-gram shingles: doc0 {abc,bcd}, doc1 {abc}, doc2 {xyz,yzw},
    # doc3 {pqr}: greedy = doc0 (2, tie vs doc2 -> min id), doc2 (2),
    # doc3 (1); doc1 adds nothing -> stops after 3 picks
    rows = [(0, "s", "a b c d"), (1, "s", "a b c"),
            (2, "s", "x y z w"), (3, "s", "p q r")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["greedy_cover"](d).to_pandas()
    got = list(zip(out["step"], out["doc_id"], out["gain"],
                   out["covered_total"]))
    assert got == [(1, 0, 2, 2), (2, 2, 2, 4), (3, 3, 1, 5)]


def test_pair_editdist_verifies_candidates():
    # two near-identical docs (one token differs) pair via LSH; the
    # edit distance is the single differing token's char edits
    ta = "w1 w2 w3 w4 w5 w6"
    tb = "w1 w2 w3 w4 w5 w7"
    rows = [(0, "s", ta), (1, "s", tb),
            (2, "s", "x1 x2 x3 x4 x5 x6")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["pair_editdist"](d).to_pandas()
    r = out[(out["doc_id_a"] == 0) & (out["doc_id_b"] == 1)]
    assert len(r) == 1
    assert int(r.iloc[0]["dist"]) == 1  # w6 -> w7: one substitution
    assert int(r.iloc[0]["ld_ppm"]) == (1_000_000 * 1) // len(ta)


def test_salt_plan_hot_key():
    # 64 shards, 128 rows -> target 2; key 7 holds 100 rows -> hot,
    # salt 50, max sub-shard 2; the 28 singleton keys fill the top-10
    # tail with salt 1 (not hot)
    keys = [7] * 100 + list(range(100, 128))
    df = pd.DataFrame({"l_partkey": keys})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "lineitem.parquet"))
        out = q.QUERIES["salt_plan"](d).to_pandas()
    assert len(out) == 10
    r = out.iloc[0]
    assert (r.l_partkey, r.n, r.is_hot, r.salt, r.max_shard) == \
        (7, 100, 1, 50, 2)
    tail = out.iloc[1:]
    assert list(tail["l_partkey"]) == list(range(100, 109))
    assert (tail["is_hot"] == 0).all()
    assert (tail["salt"] == 1).all()
