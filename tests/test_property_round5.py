"""Property-based tests (hypothesis) for the round-5 operator families:
partition invariance and oracle-identity over arbitrary inputs — a result
must never depend on how Ray happened to split the blocks."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

WORD = st.text(alphabet="abcde", min_size=1, max_size=4)
TEXT = st.lists(WORD, min_size=1, max_size=12).map(" ".join)


def _ds(df: pd.DataFrame, parts: int) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(max(1, parts))


@settings(max_examples=10, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8), st.integers(1, 4))
def test_doc_surprisal_partition_invariant_and_exact(texts, parts):
    from dug_ray.stages.text_index import doc_surprisal
    df = pd.DataFrame({"doc_id": range(1, len(texts) + 1),
                       "text": texts})
    out = (doc_surprisal(_ds(df, parts), num_buckets=3).to_pandas()
           .set_index("doc_id").sort_index())
    # python oracle
    from collections import Counter
    corpus = Counter(t for x in texts for t in x.split(" "))
    n = sum(corpus.values())
    for did, text in enumerate(texts, 1):
        toks = text.split(" ")
        exp = sum(math.floor(-math.log(corpus[t] / n) * 1e6)
                  for t in toks)
        assert int(out.loc[did, "surprisal_unats"]) == exp
        assert int(out.loc[did, "n_tokens"]) == len(toks)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
       st.integers(1, 13), st.integers(1, 4))
def test_kth_value_is_sorted_index(vals, k_raw, parts):
    from dug_ray.stages.selection import kth_value
    k = min(k_raw, len(vals))
    arr = np.array(vals, dtype="int64")
    ds = _ds(pd.DataFrame({"v": arr}), parts)
    assert kth_value(ds, "v", k, int(arr.min()), int(arr.max())) \
        == int(np.sort(arr)[k - 1])


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 3), WORD), min_size=1,
                max_size=30), st.integers(1, 4))
def test_cms_registers_partition_invariant_total_mass(rows, parts):
    from dug_ray.stages.sketch import CMS_D, cms_registers
    df = pd.DataFrame({
        "doc_id": range(len(rows)),
        "text": [" ".join([w] * n) for n, w in rows]})
    total = sum(n for n, _ in rows)
    r1 = cms_registers(_ds(df, parts)).to_pandas()
    r2 = cms_registers(_ds(df, 1)).to_pandas()
    key = ["salt", "idx"]
    pd.testing.assert_frame_equal(
        r1.sort_values(key).reset_index(drop=True),
        r2.sort_values(key).reset_index(drop=True))
    assert (r1.groupby("salt")["cnt"].sum() == total).all()


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 5), st.integers(0, 100)),
                min_size=2, max_size=40), st.integers(1, 4))
def test_fk_audit_python_oracle(rows, parts):
    from dug_ray.stages.integrity import fk_audit
    child = pd.DataFrame({"ck": [c for c, _ in rows]})
    parent = pd.DataFrame({"pk": [p for _, p in rows]})
    out = fk_audit(_ds(child, parts), "ck", _ds(parent, parts), "pk",
                   "rel", num_buckets=3).to_pandas().iloc[0]
    pset = set(parent["pk"])
    cset = set(child["ck"])
    assert out["n_child"] == len(child)
    assert out["n_orphans"] == sum(c not in pset for c in child["ck"])
    assert out["n_orphan_keys"] == len(cset - pset)
    assert out["n_parent_keys"] == len(pset)
    assert out["n_childless_parents"] == len(pset - cset)
