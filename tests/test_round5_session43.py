"""Round-5 session-43: AMS F2 sketch, BPE first merge, link-threshold
sweep, normalization fan-in — hand-computed pins."""

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


def _sign(term: str, j: int) -> int:
    h = int(hashlib.md5(f"{term}#{j}".encode()).hexdigest()[:8], 16)
    return 2 * (h % 2) - 1


def test_ams_f2_sketch_values():
    # counts: a=2, b=1 -> exact F2 = 5; sketch_j = 2*sign_j(a)+sign_j(b)
    rows = [(0, "s", "a a b")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["ams_f2"](d).to_pandas().sort_values("j")
    sk = {j: 2 * _sign("a", j) + _sign("b", j) for j in range(16)}
    est = sum(v * v for v in sk.values()) // 16
    for r in out.itertuples():
        assert r.sketch == sk[r.j]
        assert r.sketch_sq == sk[r.j] ** 2
        assert r.est_f2 == est
        assert r.exact_f2 == 5


def test_bpe_first_merge_weighted_pairs():
    # 'abc' x2, 'ab' x1 -> ab: 2+1=3, bc: 2
    rows = [(0, "s", "abc ab abc")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["bpe_first_merge"](d).to_pandas()
    assert list(map(tuple, out.to_numpy())) == [("ab", 3), ("bc", 2)]


def test_link_threshold_sweep_counts():
    # lexicon: merge .97, hash .93, the .99
    rows = [(0, "s", "merge hash the")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["link_threshold_sweep"](d).to_pandas()
    got = {r.th: (r.n_mentions, r.n_terms, r.n_curies)
           for r in out.itertuples()}
    assert got == {800: (3, 3, 3), 850: (3, 3, 3), 900: (3, 3, 3),
                   950: (2, 2, 2)}


def test_norm_fanin_two_raw_one_canonical():
    # slow (MESH:D003) and query (UMLS:C001) both normalize to
    # MONDO:0000001 -> one canonical with fan-in 2
    rows = [(0, "s", "slow query")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["norm_fanin"](d).to_pandas()
    got = {r.n_raw: r.n_canonicals for r in out.itertuples()}
    assert got == {2: 1}
