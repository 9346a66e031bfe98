"""Round-5 session-58f: absorbing-Markov conversion probability,
set-Shapley attribution, 8-gram split contamination — hand pins."""

from __future__ import annotations

import hashlib
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import dug_ray.queries as q


def _write_events(d, rows):
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type"])
    df["ts"] = pd.to_datetime(df["ts"])
    df["value"] = 1.0
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "events.parquet"))


def test_absorption_prob_two_exit_chain():
    # click -> purchase twice, click -> error once, click -> click once:
    # P = (2*1e6 + 0 + P) / 4  => fixed point 2/3; 20 truncated-integer
    # iterations converge to 666665 micro (each step floors)
    rows = []
    eid = 0
    for u, seq in enumerate([
            ["click", "purchase"], ["click", "purchase"],
            ["click", "error"], ["click", "click", "purchase"]]):
        for i, t in enumerate(seq):
            rows.append((eid, u, f"2024-01-01 00:0{i}:00", t))
            eid += 1
    with tempfile.TemporaryDirectory() as d:
        _write_events(d, rows)
        out = q.QUERIES["absorption_prob"](d).to_pandas()
    r = out[out["state"] == "click"].iloc[0]
    # transitions from click: purchase x3, error x1, click x1 (user 3's
    # click->click then click->purchase adds one of each)
    assert r.n_out == 5
    # replicate the exact 20-round integer iteration
    v = 0
    for _ in range(20):
        v = (3 * 1_000_000 + 1 * 0 + 1 * v) // 5
    assert r.absorb_micro == v


def test_shapley_credit_equal_split():
    # user 0 touches {a}, user 1 touches {a, b}:
    # credit(a) = 2520 + 1260, credit(b) = 1260
    rows = [(0, 0, "2024-01-01", "a"), (1, 0, "2024-01-02", "a"),
            (2, 1, "2024-01-01", "a"), (3, 1, "2024-01-01", "b")]
    with tempfile.TemporaryDirectory() as d:
        _write_events(d, rows)
        out = q.QUERIES["shapley_credit"](d).to_pandas()
    got = {r.event_type: (r.n_users, r.credit_scaled, r.credit_micro)
           for r in out.itertuples()}
    assert got == {"a": (2, 3780, 1_500_000), "b": (1, 1260, 500_000)}


def test_ngram_contam_shared_window():
    # doc pairs share an 8-token window iff texts overlap on 8 tokens;
    # choose ids so the copies land in both splits
    def is_train(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8],
                   16) % 10 < 8
    # find a train id and a test id
    train_id = next(i for i in range(100) if is_train(i))
    test_id = next(i for i in range(100) if not is_train(i))
    other = next(i for i in range(100)
                 if is_train(i) and i != train_id)
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    rows = [(train_id, "s", shared + " tail"),
            (test_id, "s", "head " + shared),
            (other, "s", "a b c d e f g h")]
    df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    df["lang"] = "en"
    df["n_chars"] = df["text"].str.len()
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        out = q.QUERIES["ngram_contam"](d).to_pandas()
    r = out.iloc[0]
    assert (r.n_train_docs, r.n_test_docs) == (2, 1)
    assert r.n_shared_grams == 1  # exactly the shared 8-gram
    assert r.n_contam_docs == 1
