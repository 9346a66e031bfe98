"""Unit pins for the corpus text-index operators (stages/text_index.py);
the SQL oracles (dup_chunks / tfidf_topk / postings) pin the full-corpus
behavior, these pin the engine-internal invariants on hand-built docs."""
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def docs_ds(rows):
    return ray.data.from_pandas(pd.DataFrame(rows))


def test_doc_chunks_windowing():
    """Chunk re-windowing: short docs, exact multiples of 8, remainders —
    each doc contributes ceil(n/8) chunks and the texts are the exact
    8-token slices."""
    from dug_ray.stages.text_index import _doc_chunks

    texts = ["a b c",                              # 3 tokens -> 1 chunk
             " ".join(f"t{i}" for i in range(16)),  # 16 -> 2 full chunks
             " ".join(f"u{i}" for i in range(11))]  # 11 -> 2 chunks (8+3)
    batch = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "text": pa.array(texts, pa.string())})
    out = _doc_chunks(batch)
    assert list(out["doc_id"]) == [1, 2, 2, 3, 3]
    assert list(out["chunk"]) == [
        "a b c",
        " ".join(f"t{i}" for i in range(8)),
        " ".join(f"t{i}" for i in range(8, 16)),
        " ".join(f"u{i}" for i in range(8)),
        " ".join(f"u{i}" for i in range(8, 11)),
    ]


def test_dup_chunk_ratio_counts():
    """A chunk shared by two docs (and a doc repeating its own chunk) is
    dup; unique chunks are not. Milli ratio is floor-exact."""
    from dug_ray.stages.text_index import dup_chunk_ratio

    shared = " ".join(f"s{i}" for i in range(8))
    uniq1 = " ".join(f"x{i}" for i in range(8))
    ds = docs_ds([
        {"doc_id": 1, "text": f"{shared} {uniq1}"},        # 2 chunks, 1 dup
        {"doc_id": 2, "text": shared},                     # 1 chunk, dup
        {"doc_id": 3, "text": f"{shared} {shared}"},       # self-repeat: both dup
        {"doc_id": 4, "text": "lonely words only here"},   # 1 chunk, clean
    ])
    out = dup_chunk_ratio(ds).to_pandas().set_index("doc_id").sort_index()
    assert list(out["n_chunks"]) == [2, 1, 2, 1]
    assert list(out["n_dup"]) == [1, 1, 2, 0]
    assert list(out["dup_milli"]) == [500, 1000, 1000, 0]


def test_tfidf_score_and_ties():
    """Score is tf * ln(N/df) via libm log; df==N scores exactly 0.0 and
    ties break by term ascending."""
    from dug_ray.stages.text_index import tfidf_topk

    ds = docs_ds([
        {"doc_id": 1, "text": "common rare rare"},
        {"doc_id": 2, "text": "common common zeta alpha"},
    ])
    out = tfidf_topk(ds, k=3).to_pandas()
    d1 = out[out["doc_id"] == 1].sort_values("rank")
    assert list(d1["term"]) == ["rare", "common"]
    assert d1.iloc[0]["score"] == 2.0 * math.log(2 / 1)
    assert d1.iloc[1]["score"] == 0.0  # df == N
    d2 = out[out["doc_id"] == 2].sort_values("rank")
    # alpha and zeta both score ln(2); alpha wins the tie alphabetically
    assert list(d2["term"]) == ["alpha", "zeta", "common"]
    assert d2.iloc[0]["score"] == d2.iloc[1]["score"] == math.log(2 / 1)


def test_postings_cap_and_order():
    """Posting lists are numerically ascending and capped at k; df counts
    every doc, not just the listed ones."""
    from dug_ray.stages.text_index import build_postings

    ds = docs_ds([{"doc_id": i, "text": "w common"} for i in (10, 2, 33, 4, 25, 7, 101)])
    out = build_postings(ds, k=5).to_pandas().set_index("term")
    assert out.loc["common", "df"] == 7
    assert out.loc["common", "postings"] == "2|4|7|10|25"
    assert out.loc["w", "postings"] == "2|4|7|10|25"


def test_text_index_empty_and_single_token():
    """Empty batches keep typed schemas through all three operators'
    partial stages (the shuffle null-type leak guard), and degenerate
    docs (single token, empty string) chunk without crashing."""
    import pyarrow as pa

    from dug_ray.stages.text_index import (_doc_chunks, build_postings,
                                           dup_chunk_ratio, tfidf_topk)

    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}))
    for op in (dup_chunk_ratio, build_postings):
        sch = op(empty).schema()
        assert sch is None or len(sch.names) > 0

    # _doc_chunks on an empty batch returns an empty frame
    eb = pa.table({"doc_id": pa.array([], pa.int64()),
                   "text": pa.array([], pa.string())})
    assert len(_doc_chunks(eb)) == 0

    # degenerate docs: one token, and the empty string (one empty token)
    ds = docs_ds([{"doc_id": 1, "text": "solo"}, {"doc_id": 2, "text": ""}])
    out = dup_chunk_ratio(ds).to_pandas().set_index("doc_id")
    assert list(out["n_chunks"]) == [1, 1] and list(out["n_dup"]) == [0, 0]
    tf = tfidf_topk(ds).to_pandas()
    assert set(tf["doc_id"]) == {1, 2}

    # null-text docs are dropped, matching string_split(NULL)'s zero rows
    # in the oracle — not crashed on (NaN length -> INT64_MIN repeat)
    ds = docs_ds([{"doc_id": 1, "text": "a b"}, {"doc_id": 2, "text": None}])
    out = dup_chunk_ratio(ds).to_pandas()
    assert list(out["doc_id"]) == [1]
