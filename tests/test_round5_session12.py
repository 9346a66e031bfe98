"""Round-5 session-12: dedup survivor corpus, JSONL codec."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data


def test_jsonl_roundtrip_identity_and_declared_schema():
    from dug_ray.sources.jsonl_source import parse_jsonl, render_jsonl
    df = pd.DataFrame({
        "doc_id": [1, 2], "text": ['say "hi"\nnewline', "unicode: é"],
        "lang": ["en", None], "source": ["s1", "s2"],
        "n_chars": [17, 10]})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    out = parse_jsonl(render_jsonl(ds)).to_pandas()
    got = out.sort_values("doc_id").reset_index(drop=True)
    # quotes/newlines/unicode/None survive; dtypes come from DOC_SCHEMA
    assert got.loc[0, "text"] == 'say "hi"\nnewline'
    assert got.loc[1, "text"] == "unicode: é"
    assert pd.isna(got.loc[1, "lang"])
    assert got["doc_id"].dtype == "int64"
    assert got["n_chars"].dtype == "int64"


def test_parse_jsonl_missing_and_extra_keys():
    from dug_ray.sources.jsonl_source import parse_jsonl
    lines = ray.data.from_items([
        {"line": '{"doc_id": 7, "text": "t", "extra": "ignored"}'},
        {"line": '{"doc_id": 8}'},
    ])
    out = parse_jsonl(lines).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [7, 8]
    assert out.iloc[0]["text"] == "t"
    assert pd.isna(out.iloc[1]["text"])       # missing -> null
    assert "extra" not in out.columns          # undeclared -> dropped


def test_dedup_canonical_keeps_min_doc_per_cluster():
    import os
    import tempfile

    import pyarrow.parquet as pq

    import dug_ray.queries as q
    # docs 1/2 near-identical (same shingles), 3 unique
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["alpha beta gamma delta epsilon zeta eta theta",
                 "alpha beta gamma delta epsilon zeta eta theta",
                 "one two three four five six seven eight"],
        "lang": ["en"] * 3, "source": ["s"] * 3,
        "n_chars": [46, 46, 39]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        out = q.QUERIES["dedup_canonical"](d).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]  # doc 2 deduped away
