"""Round-5 session-39: Rice/varint postings audit, phonetic blocking,
Poisson-bootstrap CI — hand-computed value pins."""

from __future__ import annotations

import hashlib
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import dug_ray.queries as q
from dug_ray.queries import _POIS1_T


def _write_docs(d, rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["source"] = "s"
    df["lang"] = "en"
    df["n_chars"] = df["text"].str.len()
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "documents.parquet"))


def test_rice_postings_hand_computed():
    # term 'a' in docs {0, 2, 7}: gaps = [1, 2, 5]
    #   bitlens = [1, 2, 3] -> varint bytes = 1+1+1 = 3; gap_sum = 8
    #   mean gap = 8 // 3 = 2 -> rice_k = bitlen(2)-1 = 1
    #   rice = sum((g-1)>>1) + df*(k+1) = (0+0+2) + 3*2 = 8
    # term 'b' in doc {2}: gap = [3] -> varint 1; mean 3 -> k=1
    #   rice = (2>>1) + 1*2 = 3
    rows = [(0, "a"), (2, "a b"), (7, "a")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["rice_postings"](d).to_pandas()
    got = {r.term: (r.df, r.gap_sum, r.varint_bytes, r.rice_k,
                    r.rice_bits)
           for r in out.itertuples()}
    assert got == {"a": (3, 8, 3, 1, 8), "b": (1, 3, 1, 1, 3)}


def test_bitlen_matches_python_bit_length():
    vals = np.array([1, 2, 3, 7, 8, 127, 128, (1 << 62) - 1, 1 << 62],
                    dtype=np.int64)
    got = q._bitlen(vals)
    assert [int(x) for x in got] == [int(v).bit_length() for v in vals]


def test_phonetic_blocking_key_reduction():
    # 'peach' -> 'p' + strip-vowels('each')='ch' -> 'pch'
    # 'pecan' -> 'p' + strip('ecan')='cn' -> 'pcn'  (distinct key)
    # 'pych'  -> 'p' + strip('ych')='ch'  -> 'pch'  (collides w/ peach)
    df = pd.DataFrame({
        "p_partkey": [1, 2, 3, 4],
        "p_name": ["peach cream", "pecan dust", "pych metal",
                   "peach salt"]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "part.parquet"))
        out = q.QUERIES["phonetic_blocking"](d).to_pandas()
    got = {r.pkey: (r.n_rows, r.n_tokens) for r in out.itertuples()}
    assert got == {"pch": (3, 2), "pcn": (1, 1)}


def test_bootstrap_draws_match_md5_thresholds():
    # replicate the draw by hand for one order across all 16 reps and
    # compare against the query on a one-row orders table
    df = pd.DataFrame({"o_orderkey": [42], "o_totalprice": [10.00]})
    ts = np.array(_POIS1_T, dtype=np.int64)
    expect = {}
    for b in range(16):
        u = int(hashlib.md5(f"42-{b}".encode()).hexdigest()[:15], 16)
        k = int(np.searchsorted(ts, u, side="right"))
        expect[b] = (k, k * 1000, 1_000_000 if k else 0)
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["bootstrap_ci"](d).to_pandas()
    got = {r.b: (r.n_eff, r.sum_cents, r.mean_milli)
           for r in out.itertuples()}
    assert got == expect


def test_pois1_thresholds_are_cumulative_poisson():
    # threshold_k = floor(2^60 * P(X<=k)) for X~Poisson(1)
    import math
    scale = 1 << 60
    cdf = 0.0
    for k, t in enumerate(_POIS1_T):
        cdf += math.exp(-1.0) / math.factorial(k)
        assert t == math.floor(scale * cdf)
