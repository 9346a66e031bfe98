"""Round-5 session-3 operators: distributed BFS levels, per-edge
neighborhood Jaccard, ROLLUP aggregation, lag-window event gaps — exact
semantics on tiny hand-computable inputs."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from dug_ray.stages.graph import bfs_levels, neighbor_jaccard
from dug_ray.stages.rollup import rollup_aggregate


def _triples(pairs):
    return ray.data.from_pandas(pd.DataFrame(pairs, columns=["subj", "obj"]))


def test_bfs_levels_exact():
    # chain M:a - b - c - d - e plus an unreachable island (x - y):
    # levels 0..3 reach d; e is beyond max_level, the island never appears
    t = _triples([("M:a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
                  ("x", "y")])
    out = bfs_levels(t, seed_prefix="M:", max_level=3, num_buckets=4) \
        .to_pandas()
    got = dict(zip(out["node"], out["lvl"]))
    assert got == {"M:a": 0, "b": 1, "c": 2, "d": 3}
    assert out["lvl"].dtype == "int64"


def test_bfs_levels_min_hop_and_undirected():
    # diamond with a shortcut: both directions traversed, min hop wins
    # (c is reachable in 2 hops via b even though a 3-hop path exists);
    # edge direction must not matter (seed is the OBJECT of its edge)
    t = _triples([("b", "M:s"), ("b", "c"), ("M:s", "d"), ("d", "e"),
                  ("e", "c")])
    out = bfs_levels(t, seed_prefix="M:", max_level=3, num_buckets=4) \
        .to_pandas()
    got = dict(zip(out["node"], out["lvl"]))
    assert got == {"M:s": 0, "b": 1, "d": 1, "c": 2, "e": 2}


def test_bfs_levels_early_frontier_exhaustion():
    # the whole component is visited by level 1; levels 2-3 are empty and
    # the loop stops without error
    t = _triples([("M:a", "b")])
    out = bfs_levels(t, seed_prefix="M:", max_level=3, num_buckets=2) \
        .to_pandas()
    assert dict(zip(out["node"], out["lvl"])) == {"M:a": 0, "b": 1}


def test_neighbor_jaccard_exact():
    # triangle A-B-C plus pendant C-D (edges ordered subj < obj):
    #   N(A)={B,C} N(B)={A,C} N(C)={A,B,D} N(D)={C}
    edges = _triples([("A", "B"), ("A", "C"), ("B", "C"), ("C", "D")])
    out = neighbor_jaccard(edges, num_buckets=4).to_pandas()
    got = {(r.subj, r.obj): (r.common, r.jaccard_milli)
           for r in out.itertuples()}
    assert got == {
        ("A", "B"): (1, 1000 // 3),   # common {C}, union {A,B,C}
        ("A", "C"): (1, 250),         # common {B}, union 2+3-1=4
        ("B", "C"): (1, 250),
        ("C", "D"): (0, 0),           # pendant edge: no common neighbor
    }
    assert out["jaccard_milli"].dtype == "int64"


def test_rollup_aggregate_all_levels():
    df = pd.DataFrame({
        "k1": ["p", "p", "p", "q"],
        "k2": ["x", "x", "y", "x"],
        "v": [1, 2, 4, 8],
    })
    ds = ray.data.from_pandas(df)
    out = rollup_aggregate(
        ds, ["k1", "k2"], lambda b: b.to_pandas(),
        {"n": ("v", "count"), "s": ("v", "sum")},
        num_buckets=2).to_pandas()
    key = out.fillna("&").set_index(["k1", "k2"])
    # finest
    assert key.loc[("p", "x")].tolist() == [2, 3]
    assert key.loc[("p", "y")].tolist() == [1, 4]
    assert key.loc[("q", "x")].tolist() == [1, 8]
    # per-k1 subtotal (k2 rolled up to NULL)
    assert key.loc[("p", "&")].tolist() == [3, 7]
    assert key.loc[("q", "&")].tolist() == [1, 8]
    # grand total
    assert key.loc[("&", "&")].tolist() == [4, 15]
    assert len(out) == 6
    assert out["s"].dtype == "int64"


def test_event_gaps_query(tmp_path):
    ev = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [7, 7, 7, 9, 9],
        "ts": pd.to_datetime([
            "2026-01-01 00:00:00", "2026-01-01 00:00:01",
            "2026-01-01 00:00:04",                       # gaps 1s, 3s
            "2026-01-02 00:00:00", "2026-01-02 00:00:00.5",  # gap 0.5s
        ], format="mixed").astype("datetime64[us]"),
    })
    ev.to_parquet(tmp_path / "events.parquet")
    from dug_ray.queries import q_event_gaps
    out = q_event_gaps(str(tmp_path)).to_pandas().set_index("user_id")
    assert out.loc[7, ["n_gaps", "sum_gap_us", "max_gap_us"]].tolist() == \
        [2, 4_000_000, 3_000_000]
    assert out.loc[9, ["n_gaps", "sum_gap_us", "max_gap_us"]].tolist() == \
        [1, 500_000, 500_000]


def test_cube_aggregate_all_subsets():
    from dug_ray.stages.rollup import cube_aggregate
    df = pd.DataFrame({
        "k1": ["p", "p", "q"],
        "k2": ["x", "y", "x"],
        "v": [1, 2, 4],
    })
    out = cube_aggregate(
        ray.data.from_pandas(df), ["k1", "k2"], lambda b: b.to_pandas(),
        {"n": ("v", "count"), "s": ("v", "sum")},
        num_buckets=2).to_pandas()
    key = out.fillna("&").set_index(["k1", "k2"])
    assert key.loc[("p", "x")].tolist() == [1, 1]
    assert key.loc[("p", "y")].tolist() == [1, 2]
    assert key.loc[("q", "x")].tolist() == [1, 4]
    assert key.loc[("p", "&")].tolist() == [2, 3]
    assert key.loc[("q", "&")].tolist() == [1, 4]
    # the k2-only marginals ROLLUP would skip
    assert key.loc[("&", "x")].tolist() == [2, 5]
    assert key.loc[("&", "y")].tolist() == [1, 2]
    assert key.loc[("&", "&")].tolist() == [3, 7]
    assert len(out) == 8


def test_grouping_sets_subset_selection():
    from dug_ray.stages.rollup import grouping_sets_aggregate
    df = pd.DataFrame({"k1": ["p", "q"], "k2": ["x", "x"], "v": [3, 5]})
    # only the k2 marginal and the grand total — finest is computed
    # internally but not emitted
    out = grouping_sets_aggregate(
        ray.data.from_pandas(df), ["k1", "k2"], [["k2"], []],
        lambda b: b.to_pandas(), {"s": ("v", "sum")},
        num_buckets=2).to_pandas()
    key = out.fillna("&").set_index(["k1", "k2"])["s"]
    assert key.loc[("&", "x")] == 8
    assert key.loc[("&", "&")] == 8
    assert len(out) == 2


def test_funnel_counts_strict_order(tmp_path):
    ev = pd.DataFrame({
        "event_id": range(1, 9),
        "user_id": [1, 1, 1, 2, 2, 3, 3, 3],
        "event_type": ["view", "click", "purchase",   # u1 full funnel
                       "click", "view",               # u2 click BEFORE view
                       "view", "purchase", "click"],  # u3 purchase before click
        "ts": pd.to_datetime([
            "2026-01-01 00:00", "2026-01-01 00:01", "2026-01-01 00:02",
            "2026-01-01 00:00", "2026-01-01 00:01",
            "2026-01-01 00:00", "2026-01-01 00:01", "2026-01-01 00:02",
        ]).astype("datetime64[us]"),
        "value": 0.0, "props": "",
    })
    ev.to_parquet(tmp_path / "events.parquet")
    from dug_ray.queries import q_funnel_counts
    out = q_funnel_counts(str(tmp_path)).to_pandas().set_index("step")
    # step 1: u1,u2,u3 viewed; step 2: u1 clicked after view (u2's click
    # precedes the view; u3's click is after view -> counts); step 3:
    # only u1 purchased after the click
    assert out.loc[1, "n_users"] == 3
    assert out.loc[2, "n_users"] == 2
    assert out.loc[3, "n_users"] == 1


def test_k_core_triangle_with_pendant():
    from dug_ray.stages.graph import k_core
    # triangle A-B-C survives the 2-core; pendant D and chain D-E peel
    edges = _triples([("A", "B"), ("A", "C"), ("B", "C"), ("C", "D"),
                      ("D", "E")])
    out = k_core(edges, k=2, num_buckets=4).to_pandas()
    assert dict(zip(out["node"], out["core_deg"])) == \
        {"A": 2, "B": 2, "C": 2}


def test_k_core_path_peels_to_empty_multiround():
    from dug_ray.stages.graph import k_core
    # 6-node path: endpoints peel each round; needs 3 rounds to empty
    edges = _triples([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
                      ("e", "f")])
    out = k_core(edges, k=2, num_buckets=4).to_pandas()
    assert len(out) == 0


def test_k_core_round_cap_matches_capped_peel():
    from dug_ray.stages.graph import k_core
    # with max_rounds=1 the same path keeps its interior after ONE peel:
    # round 1 removes a,f; remaining b-c-d-e path (deg b=e=1 at that
    # point is only discovered by the NEXT round, which the cap forbids)
    edges = _triples([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
                      ("e", "f")])
    out = k_core(edges, k=2, max_rounds=1, num_buckets=4).to_pandas()
    assert dict(zip(out["node"], out["core_deg"])) == \
        {"b": 1, "c": 2, "d": 2, "e": 1}


def test_length_outliers_exact(tmp_path):
    # source A: nine 100s and one 1000 — the 1000 is way past 1.5 sigma
    # and drags the mean enough that the 100s stay inside; source B is
    # constant (variance 0: nothing can exceed 0 deviation strictly)
    docs = pd.DataFrame({
        "doc_id": range(1, 13),
        "text": "t", "lang": "en",
        "source": ["A"] * 10 + ["B"] * 2,
        "n_chars": [100] * 9 + [1000] + [50, 50],
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    from dug_ray.queries import q_length_outliers
    out = q_length_outliers(str(tmp_path)).to_pandas()
    assert out["doc_id"].tolist() == [10]
    # integer check mirrors the operator: N=10, S=1900, Q=1090000
    assert 4 * (10 * 1000 - 1900) ** 2 > 9 * (10 * 1090000 - 1900 ** 2)
    assert not 4 * (10 * 100 - 1900) ** 2 > 9 * (10 * 1090000 - 1900 ** 2)


def test_value_histogram_bins(tmp_path):
    # one type, cents 0..99 -> width formula puts exactly 10 per bin;
    # the max value lands in the LAST bin, not an 11th
    ev = pd.DataFrame({
        "event_id": range(100), "user_id": 1,
        "ts": pd.Timestamp("2026-01-01"),
        "event_type": "view",
        "value": [c / 100 for c in range(100)],
        "props": "",
    })
    ev.to_parquet(tmp_path / "events.parquet")
    from dug_ray.queries import q_value_histogram
    out = q_value_histogram(str(tmp_path)).to_pandas() \
        .sort_values("bin").reset_index(drop=True)
    assert out["bin"].tolist() == list(range(10))
    assert out["n_events"].tolist() == [10] * 10


def test_epoch_shuffle_is_permutation_and_deterministic(tmp_path):
    import hashlib
    docs = pd.DataFrame({
        "doc_id": range(1, 41), "text": "t", "lang": "en", "source": "s",
        "n_chars": 1,
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    from dug_ray.queries import q_epoch_shuffle, SHUFFLE_EPOCH
    out = q_epoch_shuffle(str(tmp_path)).to_pandas()
    assert sorted(out["pos"]) == list(range(1, 41))     # exact permutation
    # positions equal the rank of md5(doc_id#epoch) — reproducible
    expect = sorted(
        range(1, 41),
        key=lambda d: (hashlib.md5(f"{d}#{SHUFFLE_EPOCH}".encode())
                       .hexdigest(), d))
    got = dict(zip(out["doc_id"], out["pos"]))
    assert [got[d] for d in expect] == list(range(1, 41))
    out2 = q_epoch_shuffle(str(tmp_path)).to_pandas()
    assert dict(zip(out2["doc_id"], out2["pos"])) == got  # restart-stable


def test_snapshot_diff_classification():
    from dug_ray.stages.delta import snapshot_diff
    old = ray.data.from_pandas(pd.DataFrame(
        {"k": [1, 2, 3], "fp": ["a", "b", "c"]}))
    new = ray.data.from_pandas(pd.DataFrame(
        {"k": [2, 3, 4], "fp": ["b", "CHANGED", "d"]}))
    out = snapshot_diff(old, new, "k", "fp", num_buckets=4).to_pandas()
    got = dict(zip(out["k"], out["status"]))
    # key 2 is identical -> omitted
    assert got == {1: "deleted", 3: "changed", 4: "added"}


def test_label_spread_nearest_seed_min_tiebreak():
    from dug_ray.stages.graph import label_spread
    # two seeds M:a and M:z; x is 1 hop from both -> min label M:a wins;
    # y is 1 hop from M:z only; w is 2 hops (via y) labeled M:z
    t = _triples([("M:a", "x"), ("M:z", "x"), ("M:z", "y"), ("y", "w")])
    out = label_spread(t, seed_prefix="M:", max_level=3, num_buckets=4) \
        .to_pandas()
    got = {r.node: (r.label, r.lvl) for r in out.itertuples()}
    assert got == {
        "M:a": ("M:a", 0), "M:z": ("M:z", 0),
        "x": ("M:a", 1), "y": ("M:z", 1), "w": ("M:z", 2),
    }


def test_label_spread_hop_beats_label():
    from dug_ray.stages.graph import label_spread
    # n is 1 hop from M:z and 2 hops from the smaller M:a — the NEARER
    # seed wins even though its label sorts larger
    t = _triples([("M:a", "mid"), ("mid", "n"), ("M:z", "n")])
    out = label_spread(t, seed_prefix="M:", max_level=3, num_buckets=4) \
        .to_pandas()
    got = {r.node: (r.label, r.lvl) for r in out.itertuples()}
    assert got["n"] == ("M:z", 1)
    assert got["mid"] == ("M:a", 1)


def test_vocab_ids_rank_and_cutoff(tmp_path):
    # counts: "aa" x6, "bb" x6, "cc" x5, "dd" x4 (below cutoff)
    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["aa bb aa bb aa bb cc cc cc dd dd",
                 "aa bb aa bb aa bb cc cc dd dd"],
        "lang": "en", "source": "s",
        "n_chars": 1,
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    from dug_ray.queries import q_vocab_ids
    out = q_vocab_ids(str(tmp_path)).to_pandas().sort_values("vocab_id")
    assert out[["term", "n", "vocab_id"]].values.tolist() == [
        ["aa", 6, 1], ["bb", 6, 2], ["cc", 5, 3]]


def test_contrastive_pairs_adjacency(tmp_path):
    # 20 tokens -> chunks of 8: 3 text chunks -> 2 adjacent pairs
    words = [f"w{i:02d}" for i in range(20)]
    docs = pd.DataFrame({
        "doc_id": [5], "text": [" ".join(words)],
        "lang": "en", "source": "s", "n_chars": 1,
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    from dug_ray.queries import q_contrastive_pairs
    out = q_contrastive_pairs(str(tmp_path)).to_pandas() \
        .sort_values("anchor_idx")
    assert out["anchor_idx"].tolist() == [0, 1]
    assert out["anchor"].tolist() == [" ".join(words[:8]),
                                      " ".join(words[8:16])]
    assert out["positive"].tolist() == [" ".join(words[8:16]),
                                        " ".join(words[16:])]


def test_winsorized_value_exact(tmp_path):
    # ten values 1..9 + outlier 1000 (cents: 100..900, 100000)
    ev = pd.DataFrame({
        "event_id": range(10), "user_id": 1,
        "ts": pd.Timestamp("2026-01-01"), "event_type": "view",
        "value": [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000.0], "props": "",
    })
    ev.to_parquet(tmp_path / "events.parquet")
    from dug_ray.queries import q_winsorized_value
    out = q_winsorized_value(str(tmp_path)).to_pandas().iloc[0]
    # quantile_disc: sorted[ceil(q*10)-1] -> p10 = sorted[0]=100,
    # p90 = sorted[8]=900; clip turns 100000 into 900
    assert out["p10_cents"] == 100 and out["p90_cents"] == 900
    assert out["clipped_sum_cents"] == sum(range(100, 1000, 100)) + 900


def test_value_mode_tiebreak_smallest(tmp_path):
    # 2.00 and 1.00 both appear twice -> smallest cents wins
    ev = pd.DataFrame({
        "event_id": range(5), "user_id": 1,
        "ts": pd.Timestamp("2026-01-01"), "event_type": "click",
        "value": [2.0, 1.0, 2.0, 1.0, 9.0], "props": "",
    })
    ev.to_parquet(tmp_path / "events.parquet")
    from dug_ray.queries import q_value_mode
    out = q_value_mode(str(tmp_path)).to_pandas().iloc[0]
    assert out["mode_cents"] == 100 and out["n_mode"] == 2
