"""Round-5 session-4: size-gated frontier sweeps — the bounded
driver-pull fast path of bfs_levels / label_spread must be bit-identical
to the distributed frontier loop (forced via max_driver_edges=0), the
same two-path contract cooc_components carries."""

from __future__ import annotations

import pandas as pd
import ray.data

from dug_ray.stages.graph import bfs_levels, label_spread

# a graph with: a 4-deep chain off one seed, a diamond (two equal-hop
# paths with DIFFERENT labels meeting at z — exercises the min-label
# tie-break), a node adjacent to both seeds, and an unreachable island
PAIRS = [("M:a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
         ("M:a", "p"), ("M:q", "p"),           # p: 1 hop from two seeds
         ("M:q", "r"), ("r", "z"), ("p", "z"),  # z: 2 hops via p or r
         ("x", "y")]                            # island


def _triples():
    return ray.data.from_pandas(pd.DataFrame(PAIRS, columns=["subj", "obj"]))


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_bfs_levels_local_vs_distributed():
    local = bfs_levels(_triples(), seed_prefix="M:", max_level=3,
                       num_buckets=4).to_pandas()
    dist = bfs_levels(_triples(), seed_prefix="M:", max_level=3,
                      num_buckets=4, max_driver_edges=0).to_pandas()
    pd.testing.assert_frame_equal(_sorted(local), _sorted(dist))
    got = dict(zip(local["node"], local["lvl"]))
    assert got["p"] == 1 and got["z"] == 2 and "x" not in got


def test_label_spread_local_vs_distributed():
    local = label_spread(_triples(), seed_prefix="M:", max_level=3,
                         num_buckets=4).to_pandas()
    dist = label_spread(_triples(), seed_prefix="M:", max_level=3,
                        num_buckets=4, max_driver_edges=0).to_pandas()
    pd.testing.assert_frame_equal(_sorted(local), _sorted(dist))
    lab = dict(zip(local["node"], local["label"]))
    # p touches both seeds at hop 1 -> min label M:a; z reaches M:a (via
    # p) and M:q (via r) at hop 2 -> min label M:a
    assert lab["p"] == "M:a" and lab["z"] == "M:a"
    assert lab["r"] == "M:q"


def test_triangles_local_vs_distributed():
    from dug_ray.stages.graph import triangle_counts
    # two triangles sharing the edge (b, c), plus a pendant
    edges = ray.data.from_pandas(pd.DataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d"),
         ("d", "e")], columns=["subj", "obj"]))
    local = triangle_counts(edges, num_buckets=4).to_pandas()
    dist = triangle_counts(edges, num_buckets=4,
                           max_driver_edges=0).to_pandas()
    pd.testing.assert_frame_equal(_sorted(local), _sorted(dist))
    got = dict(zip(local["node"], local["n_triangles"]))
    assert got == {"a": 1, "b": 2, "c": 2, "d": 1}


def test_neighbor_jaccard_local_vs_distributed():
    from dug_ray.stages.graph import neighbor_jaccard
    edges = ray.data.from_pandas(pd.DataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d"),
         ("d", "e")], columns=["subj", "obj"]))
    local = neighbor_jaccard(edges, num_buckets=4).to_pandas()
    dist = neighbor_jaccard(edges, num_buckets=4,
                            max_driver_edges=0).to_pandas()
    pd.testing.assert_frame_equal(_sorted(local), _sorted(dist))
    row = local.set_index(["subj", "obj"]).loc[("b", "c")]
    # N(b)={a,c,d}, N(c)={a,b,d} -> common {a,d}=2, union 3+3-2=4
    assert row["common"] == 2 and row["jaccard_milli"] == 500
    # pendant edge (d, e): common 0 survives via the LEFT match
    assert local.set_index(["subj", "obj"]).loc[("d", "e"), "common"] == 0


def test_boilerplate_scrub_removes_global_chunks():
    from dug_ray.stages.text_index import boilerplate_scrub
    shared = "a b c d e f g h"          # one exact 8-token chunk
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [shared + " t1 t2",      # chunk + unique 2-token tail
                 shared + " u1",         # same chunk + different tail
                 shared],                # fully boilerplate
    }))
    out = boilerplate_scrub(docs, num_buckets=4).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[1, "clean_text"] == "t1 t2"
    assert out.loc[2, "clean_text"] == "u1"
    assert out.loc[3, "clean_text"] == ""          # doc survives, empty
    assert out["n_removed"].tolist() == [1, 1, 1]
    assert out["n_kept"].tolist() == [1, 1, 0]


def test_boilerplate_scrub_keeps_order_and_unique_docs():
    from dug_ray.stages.text_index import boilerplate_scrub
    dup = " ".join(f"d{i}" for i in range(8))
    keep1 = " ".join(f"k{i}" for i in range(8))
    keep2 = " ".join(f"m{i}" for i in range(8))
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [7, 8],
        # kept chunks must re-join in original order around the removed one
        "text": [f"{keep1} {dup} {keep2}", dup],
    }))
    out = boilerplate_scrub(docs, num_buckets=4).to_pandas() \
        .set_index("doc_id")
    assert out.loc[7, "clean_text"] == f"{keep1} {keep2}"
    assert out.loc[7, "n_kept"] == 2 and out.loc[7, "n_removed"] == 1


def test_weighted_sample_matches_reference_keys():
    import hashlib
    import math

    from dug_ray.stages.sampling import weighted_sample
    docs = pd.DataFrame({
        "doc_id": list(range(1, 41)),
        "source": [f"s{i % 3}" for i in range(40)],
        "n_chars": [50 + 13 * (i % 7) for i in range(40)],
    })

    def key(doc_id, w):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        return -math.log((h + 1) / 2 ** 32) / w

    expect = docs.assign(skey=[key(d, w) for d, w in
                               zip(docs["doc_id"], docs["n_chars"])])
    expect = expect.sort_values(["skey", "doc_id"]).head(20) \
                   .reset_index(drop=True)
    got = weighted_sample(ray.data.from_pandas(docs), k=20).to_pandas()
    assert got["doc_id"].tolist() == expect["doc_id"].tolist()
    assert got["skey"].tolist() == expect["skey"].tolist()  # bit-exact
    assert got["rank"].tolist() == list(range(1, 21))


def test_pivot_counts_declared_domain_and_other():
    from dug_ray.stages.rollup import pivot_counts
    ds = ray.data.from_pandas(pd.DataFrame({
        "source": ["a", "a", "a", "b", "b"],
        "lang": ["en", "en", "xx", "de", "yy"],   # xx/yy undeclared
    }))
    out = pivot_counts(ds, "source", "lang", ["de", "en"], num_buckets=2) \
        .to_pandas().set_index("source").sort_index()
    assert out.loc["a"].tolist() == [0, 2, 1, 3]  # n_de n_en n_other n_total
    assert out.loc["b"].tolist() == [1, 0, 1, 2]
    assert list(out.columns) == ["n_de", "n_en", "n_other", "n_total"]


def test_bfs_levels_edge_free_graph():
    t = ray.data.from_pandas(
        pd.DataFrame({"subj": pd.Series([], dtype=object),
                      "obj": pd.Series([], dtype=object)}))
    out = bfs_levels(t, seed_prefix="M:", num_buckets=2).to_pandas()
    # a fully-empty Dataset drops its column schema on to_pandas() (the
    # documented Ray pandas-block quirk) — zero rows is the contract
    assert len(out) == 0
