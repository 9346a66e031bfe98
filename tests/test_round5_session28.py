"""Round-5 session-28: skip-gram pairs, Zipf check."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _docs(d, texts):
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts,
                       "lang": ["en"] * len(texts),
                       "source": ["s"] * len(texts),
                       "n_chars": [len(t) for t in texts]})
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "documents.parquet"))


def test_skipgram_window_and_doc_boundary():
    import dug_ray.queries as q
    with tempfile.TemporaryDirectory() as d:
        _docs(d, ["a b c d", "d a"])
        out = q.QUERIES["skipgram_pairs"](d).to_pandas()
    got = {(r.w1, r.w2): r.n for r in out.itertuples()}
    # doc 1 offsets 1-2: (a,b),(b,c),(c,d),(a,c),(b,d); doc 2: (d,a)
    assert got[("a", "b")] == 1 and got[("a", "c")] == 1
    assert got[("c", "d")] == 1 and got[("d", "a")] == 1
    assert ("a", "d") not in got          # offset 3 > window
    assert ("c", "a")[0] != "x"           # sanity
    # no cross-doc pair (d end-of-doc1 with a start-of-doc2 exists as
    # (d,a) ONLY because doc 2 contains it; count must be 1, not 2
    assert got[("d", "a")] == 1


def test_zipf_check_rank_and_ppm():
    import dug_ray.queries as q
    with tempfile.TemporaryDirectory() as d:
        _docs(d, ["x x x x y y z"])
        out = (q.QUERIES["zipf_check"](d).to_pandas()
               .set_index("term"))
    assert out.loc["x", "rank"] == 1 and out.loc["x", "n"] == 4
    assert out.loc["y", "rank"] == 2 and out.loc["z", "rank"] == 3
    assert out.loc["x", "zipf_ppm"] == 1_000_000
    assert out.loc["y", "zipf_ppm"] == (2 * 2 * 1_000_000) // 4
    assert out.loc["z", "zipf_ppm"] == (3 * 1 * 1_000_000) // 4
