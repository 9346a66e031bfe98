"""Round-5 session-7: referential-integrity audit, unigram surprisal,
exact phrase search."""

from __future__ import annotations

import math

import pandas as pd
import ray.data


def test_fk_audit_orphans_and_childless_parents():
    from dug_ray.stages.integrity import fk_audit
    child = ray.data.from_pandas(pd.DataFrame({
        "ck": [1, 1, 2, 9, 9, 9]})).repartition(3)   # key 9 dangles, 3 rows
    parent = ray.data.from_pandas(pd.DataFrame({
        "pk": [1, 2, 3, 3, 7]})).repartition(2)       # 3 dup; 3,7 childless
    out = fk_audit(child, "ck", parent, "pk", "c->p",
                   num_buckets=4).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["relation"] == "c->p"
    assert r["n_child"] == 6
    assert r["n_orphans"] == 3          # the three ck=9 rows
    assert r["n_orphan_keys"] == 1      # just key 9
    assert r["n_parent_keys"] == 4      # {1,2,3,7}
    assert r["n_childless_parents"] == 2  # {3,7}


def test_fk_audit_many_fuses_shared_table_roles():
    from dug_ray.stages.integrity import fk_audit_many
    # one table is simultaneously the child of A and the parent of B
    mid = ray.data.from_pandas(pd.DataFrame({
        "up": [10, 10, 11], "key": [1, 2, 2]})).repartition(2)
    top = ray.data.from_pandas(pd.DataFrame({"tk": [10, 12]}))
    low = ray.data.from_pandas(pd.DataFrame({"mref": [1, 1, 3]}))
    out = fk_audit_many([
        (mid, "up", top, "tk", "mid->top"),
        (low, "mref", mid, "key", "low->mid"),
    ], num_buckets=4).to_pandas().set_index("relation")
    a = out.loc["mid->top"]
    assert (a["n_child"], a["n_orphans"], a["n_orphan_keys"]) == (3, 1, 1)
    assert (a["n_parent_keys"], a["n_childless_parents"]) == (2, 1)
    b = out.loc["low->mid"]
    assert (b["n_child"], b["n_orphans"], b["n_orphan_keys"]) == (3, 1, 1)
    assert (b["n_parent_keys"], b["n_childless_parents"]) == (2, 1)


def test_doc_surprisal_matches_hand_computation():
    from dug_ray.stages.text_index import doc_surprisal
    docs = {1: "a a b", 2: "b c"}
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": list(docs), "text": list(docs.values())})).repartition(2)
    out = (doc_surprisal(ds, num_buckets=3).to_pandas()
           .set_index("doc_id").sort_index())
    n_total = 5
    counts = {"a": 2, "b": 2, "c": 1}
    w = {t: math.floor(-math.log(n / n_total) * 1e6)
         for t, n in counts.items()}
    exp = {d: sum(w[t] for t in text.split(" "))
           for d, text in docs.items()}
    assert out.loc[1, "n_tokens"] == 3
    assert out.loc[2, "n_tokens"] == 2
    assert int(out.loc[1, "surprisal_unats"]) == exp[1]
    assert int(out.loc[2, "surprisal_unats"]) == exp[2]


def test_phrase_search_adjacency_positions_and_batch_boundary():
    from dug_ray.stages.text_index import phrase_search
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["x fast sort y fast sort",   # two hits, first at pos 2
                 "fast x sort",               # not adjacent
                 "sort fast",                 # wrong order... ends in fast
                 "fast sort"],                # hit at pos 1
    })).repartition(4)  # doc 3 ends a block with 'fast': no cross-doc hit
    out = (phrase_search(ds, "fast", "sort").to_pandas()
           .set_index("doc_id").sort_index())
    assert list(out.index) == [1, 4]
    assert (out.loc[1, "n_hits"], out.loc[1, "first_pos"]) == (2, 2)
    assert (out.loc[4, "n_hits"], out.loc[4, "first_pos"]) == (1, 1)
