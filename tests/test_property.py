"""Property-based tests (hypothesis): the span invariant must hold for ANY
word sequence, not just the driver corpus."""

import pandas as pd
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.test_spanify import python_oracle_spans

WORD = st.text(alphabet="abcdefghij", min_size=1, max_size=8)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.lists(WORD, min_size=1, max_size=40), min_size=1, max_size=5))
def test_spanify_roundtrip_any_text(texts):
    from dug_ray.io import flatten_spans, spanify
    df = pd.DataFrame({
        "doc_id": range(len(texts)),
        "text": [" ".join(ws) for ws in texts],
        "lang": "en", "source": "srcX",
    })
    flat = flatten_spans(spanify(ray.data.from_pandas(df))).to_pandas()
    for did, ws in enumerate(texts):
        got = [tuple(r) for r in flat[flat["doc_id"] == str(did)]
               [["kind", "text", "media_ref", "offset"]]
               .sort_values("offset").itertuples(index=False)]
        assert got == python_oracle_spans(did, " ".join(ws))


@settings(max_examples=15, deadline=None)
@given(st.lists(st.lists(WORD, min_size=3, max_size=30), min_size=2, max_size=4))
def test_simhash_permutation_invariance(texts):
    """SimHash depends only on the distinct-token SET."""
    from dug_ray.stages.dedup import simhash_fingerprints
    base = [" ".join(ws) for ws in texts]
    shuffled = [" ".join(sorted(set(ws))) for ws in texts]
    a = simhash_fingerprints(ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(len(base)), "text": base}))).to_pandas()
    b = simhash_fingerprints(ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(len(base)), "text": shuffled}))).to_pandas()
    assert list(a["simhash"]) == list(b["simhash"])


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 8), st.integers(0, 100)), min_size=1, max_size=30),
    st.lists(st.tuples(st.integers(0, 8), st.text("xyz", min_size=1, max_size=3)),
             min_size=1, max_size=30),
)
def test_hash_join_matches_pandas(lrows, rrows):
    """Partitioned hash join == pandas inner merge for any inputs."""
    from dug_ray.shuffle import hash_join
    ldf = pd.DataFrame(lrows, columns=["k", "lv"])
    rdf = pd.DataFrame(rrows, columns=["r", "rv"])
    got = (hash_join(ray.data.from_pandas(ldf), ray.data.from_pandas(rdf), "k", "r")
           .to_pandas())
    want = ldf.merge(rdf, left_on="k", right_on="r", how="inner")
    if len(want) == 0:
        # Ray Data quirk: an all-empty pandas-block dataset drops its schema
        assert len(got) == 0
        return
    key = ["k", "lv", "r", "rv"]
    got = got[key].sort_values(key).reset_index(drop=True)
    want = want[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)
