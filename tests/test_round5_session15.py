"""Round-5 session-15: banded simhash pairs, feature hashing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def test_simhash_pairs_matches_bruteforce():
    from dug_ray.stages.dedup import simhash_fingerprints, simhash_pairs
    texts = ["alpha beta gamma", "alpha beta gamma delta",
             "one two three four", "alpha beta gamma",
             "totally different words here now"]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(1, 6), "text": texts})).repartition(3)
    fps = simhash_fingerprints(ds).to_pandas().set_index("doc_id")
    expect = set()
    ids = sorted(fps.index)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(int(fps.loc[a, "simhash"])
                    ^ int(fps.loc[b, "simhash"])).count("1")
            if h <= 3:
                expect.add((a, b, h))
    out = simhash_pairs(ds).to_pandas()
    got = {(r.doc_a, r.doc_b, r.hamming) for r in out.itertuples()}
    assert got == expect
    assert len(out) == len(out.drop_duplicates(["doc_a", "doc_b"]))


def test_feature_hashing_signed_counts():
    import hashlib

    import dug_ray.queries as q
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    df = pd.DataFrame({
        "doc_id": [1], "text": ["cat cat dog"],
        "lang": ["en"], "source": ["s"], "n_chars": [11]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        out = q.QUERIES["feature_hashing"](d).to_pandas()

    def hv(t):
        return int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")

    exp = {}
    for t, n in (("cat", 2), ("dog", 1)):
        h = hv(t)
        sign = 1 if (h >> 6) & 1 else -1
        exp[h % 64] = exp.get(h % 64, 0) + sign * n
    exp = {d_: w for d_, w in exp.items() if w != 0}
    got = dict(zip(out["dim"], out["weight"]))
    assert got == exp
