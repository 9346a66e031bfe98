"""Round-5 session-38: front-coding dictionary estimate and
dictionary-encoding audit — hand-computed value pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import dug_ray.queries as q


def _write_docs(d, rows):
    df = pd.DataFrame(rows, columns=["source", "text"])
    df["doc_id"] = range(len(df))
    df["lang"] = "en"
    df["n_chars"] = df["text"].str.len()
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "documents.parquet"))


def test_front_coding_prefix_savings():
    # vocab group 'a': {ab, abc, abd} sorted -> prefixes ab|abc=2,
    # abc|abd=2 -> saved=4, total=8 -> 500000 ppm
    # group 'z': {z} -> saved 0
    rows = [("src0", "ab abc"), ("src0", "abd z ab")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["front_coding"](d).to_pandas()
    got = {r.g: (r.n_terms, r.total_chars, r.saved_chars, r.savings_ppm)
           for r in out.itertuples()}
    assert got == {"a": (3, 8, 4, 500000), "z": (1, 1, 0, 0)}


def test_dict_encoding_bit_width_and_sizes():
    # source: 4 rows, 2 distinct ('alpha' x3, 'bb' x1); k=2 -> bits=1
    # raw = 3*5 + 2 = 17; dict = (5+2) + ceil(4*1/8)=1 -> 8
    # savings = 1e6*9//17 = 529411
    # lang: all 'en' -> k=1, bits = len(bin(0)) = 1
    # raw = 4*2 = 8; dict = 2 + ceil(4/8)=1 -> 3; savings = 1e6*5//8
    rows = [("alpha", "t1"), ("alpha", "t2"), ("alpha", "t3"),
            ("bb", "t4")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["dict_encoding"](d).to_pandas()
    got = {r.col: (r.n, r.k, r.bits, r.raw_bytes, r.dict_bytes,
                   r.savings_ppm)
           for r in out.itertuples()}
    assert got == {"source": (4, 2, 1, 17, 8, 529411),
                   "lang": (4, 1, 1, 8, 3, 625000)}


def test_cooc_modularity_two_prefix_communities():
    # Build linked mentions via documents is heavy; instead pin the
    # exact-rational formula on the sf0.001 fixture by consistency:
    # q_ppm must equal the integer formula recomputed from the
    # per-prefix outputs themselves.
    sf = "/root/testdata/sf0.001"
    out = q.QUERIES["cooc_modularity"](sf).to_pandas()
    m = int(out["degree_sum"].sum()) // 2
    num = sum(4 * m * int(e) - int(d) * int(d)
              for e, d in zip(out["intra_edges"], out["degree_sum"]))
    qq = num * 1_000_000
    den = 4 * m * m
    expect = qq // den if qq >= 0 else -((-qq) // den)
    assert out["q_ppm"].nunique() == 1
    assert int(out["q_ppm"].iloc[0]) == expect
