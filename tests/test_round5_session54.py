"""Round-5 session-54: ranker agreement, isotropy dots — pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import dug_ray.queries as q
from dug_ray.queries import _RBO_MAX, _RBO_W


def test_rank_agreement_single_candidate():
    # one doc holds 'fast': both rankers return [doc0] -> inter_d = 1
    df = pd.DataFrame({"doc_id": [0], "source": ["s"],
                       "text": ["fast x"], "lang": ["en"]})
    df["n_chars"] = df["text"].str.len()
    score = sum(w * m * 1 for _, w, m in _RBO_W)
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        out = q.QUERIES["rank_agreement"](d).to_pandas()
    got = {r.term: (r.score, r.agreement_ppm) for r in out.itertuples()}
    assert got == {"fast": (score, (1_000_000 * score) // _RBO_MAX)}


def test_embed_isotropy_quantized_dot():
    emb = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[1.5, 2.5], [0.5, -0.5]],
                              pa.list_(pa.float32()))})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(emb, os.path.join(d, "embeddings.parquet"))
        out = q.QUERIES["embed_isotropy"](d).to_pandas()
    assert list(map(tuple, out[["vec_a", "vec_b", "dot_q"]]
                    .to_numpy())) == [(0, 1, -500_000_000_000)]
