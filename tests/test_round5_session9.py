"""Round-5 session-9: BM25 ranking, state snapshots, bigram LM."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data


def test_bm25_topk_matches_reference_formula():
    from dug_ray.stages.text_index import bm25_topk
    texts = ["a b a", "a c", "b b b b"]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": texts})).repartition(3)
    out = bm25_topk(ds, ["a"], k=5).to_pandas()
    n_docs, n_tokens = 3, 9
    avgdl = float(n_tokens) / float(n_docs)
    dfq = 2  # 'a' appears in docs 1 and 2
    idf = math.log((float(n_docs - dfq) + 0.5) / (float(dfq) + 0.5))

    def score(tf, dl):
        return idf * (float(tf) * (1.2 + 1.0)) / \
            (float(tf) + 1.2 * (1.0 - 0.75 + 0.75 * (float(dl) / avgdl)))

    got = {r.doc_id: r.score for r in out.itertuples()}
    assert set(got) == {1, 2}
    assert got[1] == score(2, 3)
    assert got[2] == score(1, 2)
    # idf is negative (df > N/2), so the LOWER tf ranks first
    ranks = {r.doc_id: r.rank for r in out.itertuples()}
    assert ranks[2] == 1 and ranks[1] == 2


def test_state_snapshots_latest_event_before_boundary():
    import dug_ray.queries as q
    day1 = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: view on Jan 1 noon, buy on Jan 3 noon
        (1, 1, day1 + pd.Timedelta(hours=12), "view"),
        (2, 1, day1 + pd.Timedelta(days=2, hours=12), "buy"),
        # user 2: two events at the SAME ts on Jan 1 -> max event_id wins
        (3, 2, day1 + pd.Timedelta(hours=1), "view"),
        (4, 2, day1 + pd.Timedelta(hours=1), "click"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type"])
    import tempfile, os, pyarrow.parquet as pq, pyarrow as pa
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df), os.path.join(
            d, "events.parquet"))
        out = q.QUERIES["state_snapshots"](d).to_pandas()
    got = {(r.user_id, r.day): r.state for r in out.itertuples()}
    assert got[(1, 2)] == "view"      # day-2 boundary: only the view
    assert got[(1, 3)] == "view"      # buy is at noon Jan 3, after 00:00
    assert got[(1, 4)] == "buy"
    assert got[(2, 2)] == "click"     # ts tie -> higher event_id
    assert got[(1, 30)] == "buy"      # carries forward to the last day


def test_bigram_lm_conditional_probabilities():
    import dug_ray.queries as q
    import tempfile, os, pyarrow.parquet as pq, pyarrow as pa
    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a b a b a c", "a b"],
        "lang": ["en", "en"], "source": ["s", "s"],
        "n_chars": [11, 3]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        out = q.QUERIES["bigram_lm"](d).to_pandas()
    a = out[out["prev"] == "a"].set_index("next")
    # a-> b x3, a-> c x1 (no cross-doc bigram between docs)
    assert a.loc["b", "n"] == 3 and a.loc["c", "n"] == 1
    assert a.loc["b", "prev_total"] == 4
    assert a.loc["b", "p_milli"] == 750
    assert a.loc["c", "p_milli"] == 250
    assert a.loc["b", "rank"] == 1 and a.loc["c", "rank"] == 2
