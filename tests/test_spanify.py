"""Span-sequence invariant tests (BASELINE.json per-row invariant).

Mirrors the reference's exact-equality parser contracts
(``/root/reference/tests/integration/test_parsers.py``): the spanifier must
be a lossless, order-preserving lift of each document, and re-flattening
must reproduce (kind, text, media_ref, offset) per row.
"""

import pyarrow.parquet as pq

from dug_ray.io import (MEDIA_EVERY, SPAN_TOKENS, chunk_offsets, flatten_spans,
                        read_interleaved)


def python_oracle_spans(doc_id, text):
    """Pure-Python oracle for one document's span sequence."""
    words = text.split(" ")
    n_chunks = (len(words) + SPAN_TOKENS - 1) // SPAN_TOKENS
    spans, offset = [], 0
    for c in range(n_chunks):
        spans.append(("text", " ".join(words[c * SPAN_TOKENS:(c + 1) * SPAN_TOKENS]), "", offset))
        offset += 1
        if c % MEDIA_EVERY == MEDIA_EVERY - 1:
            spans.append(("media", "", f"media://{doc_id}/{offset}", offset))
            offset += 1
    return spans


def test_span_sequence_equality(sf_smoke):
    docs = read_interleaved(sf_smoke)
    flat = flatten_spans(docs).to_pandas()
    raw = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"]).to_pandas()

    by_doc = {
        str(did): [tuple(r) for r in g[["kind", "text", "media_ref", "offset"]]
                   .sort_values("offset").itertuples(index=False)]
        for did, g in flat.groupby("doc_id")
    }
    assert len(by_doc) == len(raw)
    for _, row in raw.iterrows():
        expected = python_oracle_spans(row["doc_id"], row["text"])
        assert by_doc[str(row["doc_id"])] == expected, f"doc {row['doc_id']} span mismatch"


def test_text_roundtrip(sf_smoke):
    """Concatenating text spans in offset order reproduces the document."""
    flat = flatten_spans(read_interleaved(sf_smoke)).to_pandas()
    raw = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    texts = (
        flat[flat["kind"] == "text"]
        .sort_values(["doc_id", "offset"])
        .groupby("doc_id")["text"].agg(" ".join)
    )
    for _, row in raw.iterrows():
        assert texts[str(row["doc_id"])] == row["text"]


def test_chunk_offset_arithmetic():
    # chunk c -> offset c + c//2; inverse o - (o+1)//3
    offs = chunk_offsets(10)
    assert list(offs) == [0, 1, 3, 4, 6, 7, 9, 10, 12, 13]
    for c, o in enumerate(offs):
        assert o - (o + 1) // (MEDIA_EVERY + 1) == c


def test_overlap_windows_catch_boundary_straddling_mention():
    """A 2-token mention straddling the disjoint 8-token chunk boundary
    (positions 8-9) appears whole in NO disjoint chunk but in SOME
    overlapping window — the reference's padding_words=5 semantics."""
    import pandas as pd
    import ray

    from dug_ray.io import overlapping_windows, read_documents, spanify

    words = [f"w{i}" for i in range(1, 17)]
    words[7], words[8] = "heart", "attack"  # positions 8 and 9 (1-based)
    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": ["7"], "text": [" ".join(words)],
         "lang": ["en"], "source": ["s"]}))

    disjoint = spanify(docs).to_pandas()["spans"].iloc[0]
    chunk_texts = [s["text"] for s in disjoint if s["kind"] == "text"]
    assert not any("heart attack" in t for t in chunk_texts)

    wins = overlapping_windows(docs).to_pandas()
    assert any("heart attack" in t for t in wins["text"])
    # full coverage with 5-token shared context: windows start every 3 tokens
    assert list(wins["start_pos"]) == [1, 4, 7, 10]
    assert all(len(t.split(" ")) <= 8 for t in wins["text"])


def test_lance_pathway(tmp_path, sf_smoke):
    """Storage shim (the north-rule Lance path): with documents.lance
    present, read_documents takes the Lance branch. Without pylance in the
    env, ray.data.read_lance raises ImportError at call time and the
    parquet fallback must still serve every row; with pylance installed
    (not this container), the real Lance read is exercised end to end."""
    import shutil

    from dug_ray.io import read_documents

    d = tmp_path / "sf"
    d.mkdir()
    shutil.copy(f"{sf_smoke}/documents.parquet", d / "documents.parquet")
    want = read_documents(sf_smoke, columns=["doc_id"]).count()

    try:
        import lance
    except ImportError:
        lance = None

    if lance is not None:
        import pyarrow.parquet as pq
        lance.write_dataset(pq.read_table(d / "documents.parquet"),
                            str(d / "documents.lance"))
    else:
        # an (empty) .lance dir still routes through the Lance branch; the
        # ImportError fallback is the behavior under test in this env
        (d / "documents.lance").mkdir()

    out = read_documents(str(d), columns=["doc_id", "source"]).to_pandas()
    assert len(out) == want and set(out.columns) == {"doc_id", "source"}
