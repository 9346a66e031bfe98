"""Round-5 session-50: autocomplete, SymSpell candidates, shard-key
audit — hand-computed pins."""

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


def test_autocomplete_prefix_topk():
    rows = [(0, "s", "apple apple apric apric apric ant bee")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["autocomplete_top"](d).to_pandas()
    got = {(r.prefix, r.term): r.n for r in out.itertuples()}
    assert got == {("ap", "apric"): 3, ("ap", "apple"): 2,
                   ("an", "ant"): 1, ("be", "bee"): 1}


def test_symspell_delete1_matches():
    rows = [(0, "s", "merge join sort batch")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["symspell_candidates"](d).to_pandas()
    got = {(r.typo, r.term): r.n for r in out.itertuples()}
    assert got == {("mrge", "merge"): 1, ("joi", "join"): 1,
                   ("sorrt", "sort"): 1, ("batc", "batch"): 1}


def _bucket(v: str) -> int:
    return int(hashlib.md5(v.encode()).hexdigest()[:8], 16) % 64


def test_shard_key_audit_two_rows():
    df = pd.DataFrame({
        "o_orderkey": [10, 20], "o_custkey": [1, 2],
        "o_orderdate": pd.to_datetime([5, 5], unit="D"),
        "o_orderpriority": ["P", "P"]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["shard_key_audit"](d).to_pandas()
    got = {r.key: (r.n_rows, r.buckets_hit, r.max_bucket_rows,
                   r.max_bucket_ppm) for r in out.itertuples()}

    def expect(values):
        bs = [_bucket(v) for v in values]
        hit = len(set(bs))
        mx = 2 if hit == 1 else 1
        return (2, hit, mx, (1_000_000 * mx) // 2)

    assert got == {"custkey": expect(["1", "2"]),
                   "orderkey": expect(["10", "20"]),
                   "day": expect(["5", "5"]),
                   "priority": expect(["P", "P"])}
