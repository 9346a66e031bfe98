"""Round-5 session-57: Good-Turing unseen mass, length-distribution
Wasserstein distance, simhash bit-bias audit — hand-computed pins."""

from __future__ import annotations

import hashlib
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


def test_unseen_mass_hapax_ratio():
    # source s: tokens a,b,b -> 3 tokens, 1 hapax -> 333333 ppm
    # source t: tokens c,c   -> 2 tokens, 0 hapax -> 0 ppm
    rows = [(0, "s", "a b b"), (1, "t", "c c")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["unseen_mass"](d).to_pandas()
    got = {r.source: (r.n_tokens, r.n_hapax, r.unseen_ppm)
           for r in out.itertuples()}
    assert got == {"s": (3, 1, 333333), "t": (2, 0, 0)}


def test_length_emd_known_w1():
    # A lengths {1, 3} (mass 1/2 each), B length {2}: W1 = 1 exactly
    rows = [(0, "A", "x"), (1, "A", "x y z"), (2, "B", "x y")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["length_emd"](d).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.src_a, r.src_b, r.w1) == ("A", "B", 1)


def test_simhash_bitbias_single_token_docs():
    # one-token docs: bit d of the fingerprint is set iff hex digit d
    # of md5(token) >= 8; ones per bit follows directly from the digests
    rows = [(0, "s", "a"), (1, "s", "b")]
    ones = [
        sum(1 for t in ("a", "b")
            if int(hashlib.md5(t.encode()).hexdigest()[d], 16) >= 8)
        for d in range(16)]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["simhash_bitbias"](d).to_pandas()
    assert list(out["bit"]) == list(range(16))
    assert list(out["ones"]) == ones
    assert list(out["n"]) == [2] * 16
    assert list(out["bias_ppm"]) == [
        abs(2_000_000 * o - 2_000_000) // 2 for o in ones]
