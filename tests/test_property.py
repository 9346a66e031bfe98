"""Property-based tests (hypothesis): the span invariant must hold for ANY
word sequence, not just the driver corpus."""

import pandas as pd
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

# bare module import: works under both `python -m pytest` (cwd on sys.path)
# and the `pytest` console script (rootdir test dir on sys.path); a
# `tests.`-qualified import breaks the latter (no tests/__init__.py)
from test_spanify import python_oracle_spans

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


@settings(max_examples=15, deadline=None)
@given(st.lists(st.lists(WORD, min_size=1, max_size=60), min_size=1, max_size=4))
def test_overlapping_windows_cover_every_token(texts):
    """For ANY text: every token position is covered by >=1 window, windows
    advance by stride=3, adjacent full windows share 5 tokens, and window
    text equals the tokens at [start_pos, start_pos+len)."""
    from dug_ray.io import overlapping_windows
    df = pd.DataFrame({"doc_id": range(len(texts)),
                       "text": [" ".join(ws) for ws in texts]})
    out = overlapping_windows(ray.data.from_pandas(df)).to_pandas()
    for did, ws in enumerate(texts):
        wins = out[out["doc_id"] == str(did)].sort_values("win_idx")
        covered = set()
        for _, w in wins.iterrows():
            toks = w["text"].split(" ")
            assert w["start_pos"] == w["win_idx"] * 3 + 1
            assert toks == ws[w["start_pos"] - 1: w["start_pos"] - 1 + len(toks)]
            assert len(toks) <= 8
            covered.update(range(w["start_pos"], w["start_pos"] + len(toks)))
        assert covered == set(range(1, len(ws) + 1))


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50), st.booleans()),
                min_size=1, max_size=40, unique_by=lambda t: (t[1], t[2])))
def test_asof_join_matches_bruteforce(rows):
    """asof_join == brute-force 'latest strictly-before quote per user' for
    ANY event set (unique (sec,side) keeps event ids unique)."""
    from dug_ray.stages.windows import asof_join
    recs = [{"event_id": 2 * i + (1 if q else 0), "user_id": u,
             "sec": s, "value": float(i % 7)}
            for i, (u, s, q) in enumerate(rows)]
    df = pd.DataFrame(recs)
    df["ts"] = pd.Timestamp(0) + pd.to_timedelta(df["sec"], unit="s")
    ticks = df[df["event_id"] % 2 == 0]
    quotes = df[df["event_id"] % 2 == 1]
    if len(ticks) == 0:
        return
    got = asof_join(ray.data.from_pandas(ticks.drop(columns=["sec"])),
                    ray.data.from_pandas(quotes.drop(columns=["sec"]))
                    if len(quotes) else ray.data.from_pandas(
                        pd.DataFrame(columns=["event_id", "user_id", "ts", "value"])
                        .astype({"event_id": "int64", "user_id": "int64",
                                 "value": "float64", "ts": "datetime64[ns]"}))
                    ).to_pandas()
    for _, t in ticks.iterrows():
        prior = quotes[(quotes["user_id"] == t["user_id"])
                       & ((quotes["sec"] < t["sec"])
                          | ((quotes["sec"] == t["sec"])
                             & (quotes["event_id"] < t["event_id"])))]
        sel = got[got["event_id"] == t["event_id"]]
        assert len(sel) == 1, f"tick {t['event_id']} missing/duplicated in asof output"
        r = sel.iloc[0]
        if len(prior):
            best = prior.sort_values(["sec", "event_id"]).iloc[-1]
            assert r["quote_event"] == best["event_id"]
            assert r["quote_milli"] == round(best["value"] * 1000)
        else:
            assert r["quote_event"] == -1 and r["quote_milli"] == -1


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 100), st.booleans()),
                min_size=1, max_size=40))
def test_banded_join_matches_bruteforce(rows):
    """banded_join == brute-force interval filter for ANY event set; tiny
    band (16us) makes hypothesis hit band edges and chunk boundaries.
    Each pair must appear EXACTLY once (the two-chunk left duplication
    must never double-match)."""
    from dug_ray.stages.windows import banded_join
    BAND = 16
    df = pd.DataFrame([{"event_id": i, "user_id": u, "us": t, "is_r": r}
                       for i, (u, t, r) in enumerate(rows)])
    df["ts"] = pd.Timestamp(0) + pd.to_timedelta(df["us"], unit="us")
    left, right = df[~df["is_r"]], df[df["is_r"]]
    if left.empty or right.empty:
        return
    got = banded_join(
        ray.data.from_pandas(left[["event_id", "user_id", "ts"]]),
        ray.data.from_pandas(right[["event_id", "user_id", "ts"]]),
        band_us=BAND, num_buckets=4).to_pandas()
    expect = {(int(l.event_id), int(r.event_id))
              for _, l in left.iterrows() for _, r in right.iterrows()
              if l.user_id == r.user_id and l.us <= r.us < l.us + BAND}
    if not expect:
        # a fully-empty Dataset loses its column schema (documented Ray
        # pandas-block quirk, see shuffle.hash_join) — only count asserts
        assert len(got) == 0
        return
    assert set(zip(got["l_event"], got["r_event"])) == expect
    assert len(got) == len(expect)


def test_first_touch_argmin_ties(tmp_path):
    """first_touch picks the earliest view per purchase, tie-broken by
    view event_id; out-of-band views are ignored (band = 1 hour)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from dug_ray.queries import q_first_touch
    base = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: equal-ts views 11/10 (tie -> id 10), later view 12
        (10, 1, base, "view"), (11, 1, base, "view"),
        (12, 1, base + pd.Timedelta(minutes=5), "view"),
        (20, 1, base + pd.Timedelta(minutes=30), "purchase"),
        # user 2: only view is >1h before the purchase -> no attribution
        (30, 2, base, "view"),
        (40, 2, base + pd.Timedelta(minutes=90), "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = q_first_touch(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["purchase_event"], r["first_view"], r["user_id"]) == (20, 10, 1)
    assert r["lag_us"] == 30 * 60 * 1_000_000


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)),
                min_size=0, max_size=15))
def test_connected_components_match_union_find(edges):
    """Label propagation == a plain union-find over the SAME edge set. Docs
    are built so doc i and doc j are near-dups iff (i,j) is an edge: each
    doc's text is its base 8-token chain; an edge adds the partner's chain
    words — instead we verify against the engine's own edge extraction."""
    from dug_ray.stages.cluster import connected_components, neardup_edges

    # ten docs, pairwise-distinct base texts
    texts = {i: " ".join(f"w{i}x{j}" for j in range(8)) for i in range(10)}
    for a, b in edges:
        if a == b:
            continue
        # make a and b near-dups by sharing a long common token run
        common = " ".join(f"c{min(a,b)}y{max(a,b)}z{j}" for j in range(30))
        texts[a] = texts[a] + " " + common
        texts[b] = texts[b] + " " + common
    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[i] for i in texts]}))

    eng_edges = neardup_edges(docs).to_pandas()
    # non-circular guards on the edge extraction itself: docs that share no
    # common run have disjoint tokens, so every engine edge must be a
    # constructed pair (no spurious edges); and an isolated constructed pair
    # (both endpoints degree 1) always clears the jaccard bar, so it must be
    # detected. (High-degree nodes legitimately dilute jaccard below 0.5,
    # so full equality is not a valid assertion.)
    constructed = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    eng_pairs = {(min(int(r["src"]), int(r["dst"])), max(int(r["src"]), int(r["dst"])))
                 for _, r in eng_edges.iterrows()}
    assert eng_pairs <= constructed
    deg: dict[int, set[int]] = {}
    for a, b in constructed:
        deg.setdefault(a, set()).add(b)
        deg.setdefault(b, set()).add(a)
    for a, b in constructed:
        if len(deg[a]) == 1 and len(deg[b]) == 1:
            assert (a, b) in eng_pairs
    parent = list(range(10))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for _, e in eng_edges.iterrows():
        a, b = find(int(e["src"])), find(int(e["dst"]))
        if a != b:
            parent[max(a, b)] = min(a, b)
    want = {i: find(i) for i in range(10)}

    got = connected_components(docs).to_pandas()
    assert dict(zip(got["doc_id"], got["cluster_id"])) == want
