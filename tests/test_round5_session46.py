"""Round-5 session-46: Gries dispersion, Roaring audit, SimHash eval —
hand-computed pins."""

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


def test_term_dispersion_half_split():
    # 'fast' only in doc0; two equal-length docs -> DP = 0.5
    rows = [(0, "s", "fast x"), (1, "s", "y z")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["term_dispersion"](d).to_pandas()
    got = {r.term: (r.f, r.dp_ppm) for r in out.itertuples()}
    assert got == {"fast": (1, 500000)}


def test_roaring_container_choices():
    # type a, container 0: {0,1,2} run=6 ties array=6 -> run
    # type a, container 1: {70,80} run=10 array=4 -> array
    # type b, container 0: 11 scattered ids -> bitmap (8)
    ev = pd.DataFrame({
        "event_type": ["a"] * 5 + ["b"] * 11,
        "user_id": [0, 1, 2, 70, 80] + list(range(0, 22, 2))})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(ev),
                       os.path.join(d, "events.parquet"))
        out = q.QUERIES["roaring_audit"](d).to_pandas()
    got = {(r.event_type, r.ctype): (r.n_containers, r.total_bytes)
           for r in out.itertuples()}
    assert got == {("a", "run"): (1, 6), ("a", "array"): (1, 4),
                   ("b", "bitmap"): (1, 8)}


def _simhash16(terms):
    fp = 0
    for d in range(16):
        s = sum(int(hashlib.md5(t.encode()).hexdigest()[d], 16) - 7.5
                for t in terms)
        if s > 0:
            fp |= 1 << d
    return fp


def test_simhash_eval_counts():
    # doc0 == doc1 (TP pair); doc2 disjoint terms — predicted iff its
    # simhash is within hamming 3 (computed here with the same md5
    # nibble rule, so the pin is exact either way)
    rows = [(0, "s", "a b c"), (1, "s", "a b c"), (2, "s", "p q r")]
    f0 = _simhash16(["a", "b", "c"])
    f2 = _simhash16(["p", "q", "r"])
    near = bin(f0 ^ f2).count("1") <= 3
    tp, fp, fn = 1, (2 if near else 0), 0
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["simhash_eval"](d).to_pandas()
    r = out.iloc[0]
    assert (r.tp, r.fp, r.fn) == (tp, fp, fn)
    assert r.precision_ppm == (1_000_000 * tp) // (tp + fp)
    assert r.recall_ppm == 1_000_000
