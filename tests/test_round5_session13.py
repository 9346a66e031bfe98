"""Round-5 session-13: label centroids, Benford audit, char entropy."""

from __future__ import annotations

import math
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _run(d, name):
    import dug_ray.queries as q
    return q.QUERIES[name](d).to_pandas()


def test_label_centroids_grouped_sums():
    vecs = [[1.0, 2.0], [3.0, 4.0], [10.0, 20.0]]
    tbl = pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1], pa.int32())})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "embeddings.parquet"))
        out = _run(d, "label_centroids")
    g = out.set_index(["label", "dim"])
    assert g.loc[(0, 1), "sum_micro"] == 4_000_000  # 1.0 + 3.0
    assert g.loc[(0, 2), "sum_micro"] == 6_000_000
    assert g.loc[(1, 1), "sum_micro"] == 10_000_000
    assert g.loc[(0, 1), "n"] == 2 and g.loc[(1, 1), "n"] == 1


def test_benford_digits_counts_and_freq():
    df = pd.DataFrame({
        "o_orderkey": range(1, 6),
        "o_totalprice": [123.45, 19.99, 111.0, 950.5, 1.23]})
    # cents: 12345, 1999, 11100, 95050, 123 -> first digits 1,1,1,9,1
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "orders.parquet"))
        out = _run(d, "benford_digits").set_index("digit")
    assert out.loc[1, "n"] == 4 and out.loc[9, "n"] == 1
    assert out.loc[1, "freq_milli"] == 800
    assert out.loc[9, "freq_milli"] == 200


def test_char_entropy_hand_computed():
    df = pd.DataFrame({
        "doc_id": [1, 2], "text": ["aab", "zzzz"],
        "lang": ["en", "en"], "source": ["s", "s"],
        "n_chars": [3, 4]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        out = _run(d, "char_entropy").set_index("doc_id")
    # doc 1: a x2, b x1, n=3
    exp1 = 2 * math.floor(math.log(3 / 2) * 1e6) \
        + 1 * math.floor(math.log(3 / 1) * 1e6)
    assert out.loc[1, "ent_unats_xn"] == exp1
    assert out.loc[1, "n_chars_counted"] == 3
    # doc 2: single repeated char -> zero entropy
    assert out.loc[2, "ent_unats_xn"] == 0
