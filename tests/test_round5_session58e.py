"""Round-5 session-58e: Kneser–Ney bigram LM, Bloom FPR calibration,
train/test split-leakage audit — hand-computed pins."""

from __future__ import annotations

import hashlib
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


def test_kneser_ney_hand_counts():
    # bigrams: (a b) x2, (b a), (c b): c1(a)=2, N1+(a.)=1 ({b}),
    # N1+(.b)=2 ({a,c}), B=3 distinct bigram types
    rows = [(0, "s", "a b a b"), (1, "s", "c b")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["kneser_ney"](d).to_pandas()
    r = out[out["bigram"] == "a b"].iloc[0]
    assert (r.n, r.c1, r.n_cont, r.n_prec) == (2, 2, 1, 2)
    exp = math.floor(1000000 * ((2 - 0.75) / 2
                                + 0.75 * 1 / 2 * (2 / 3)))
    assert r.pkn_micro == exp


def _positions(key):
    hv = int(hashlib.md5(key.encode()).hexdigest()[:16], 16)
    return [(hv >> (16 * s)) & 0xFFFF for s in range(4)]


def test_bloom_fpr_tiny_filter():
    # two member terms -> <=8 set bits of 65536; recompute each probe's
    # membership by hand from the same md5 chunk scheme
    rows = [(0, "s", "alpha beta")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["bloom_fpr"](d).to_pandas()
    r = out.iloc[0]
    bits = set(_positions("alpha")) | set(_positions("beta"))
    fp = sum(1 for i in range(10_000)
             if all(p in bits for p in _positions(f"probe:{i}")))
    assert (r.n_members, r.n_probes, r.n_fp) == (2, 10_000, fp)
    assert r.theory_ppm == math.floor(
        1000000 * math.pow(1 - math.exp(-(4.0 * 2) / 65536), 4))


def test_split_leakage_forced_collision():
    # identical texts share a simhash; doc split by md5(doc_id)%10<8.
    # choose ids so at least one train/test pair exists, then pin the
    # whole census against a hand recomputation
    ids = list(range(40))
    rows = [(i, "s", "same text twin") for i in ids[:20]] + \
           [(i, "s", f"unique words {i} here") for i in ids[20:]]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["split_leakage"](d).to_pandas()
    r = out.iloc[0]

    def is_train(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8],
                   16) % 10 < 8
    twins = ids[:20]
    tr = sum(1 for i in twins if is_train(i))
    te = len(twins) - tr
    assert r.n_train + r.n_test == 40
    # the 20 identical docs share one fingerprint: cross pairs = tr*te
    assert r.leak_pairs >= tr * te
    assert r.leaked_test_docs >= (te if tr > 0 else 0)
    assert r.shared_fps >= (1 if tr > 0 and te > 0 else 0)
