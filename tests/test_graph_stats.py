"""Graph-profile operators (stages/graph.py): exact semantics on a tiny
hand-computable corpus plus schema stability on empty groups."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data

from dug_ray.stages.graph import (concept_cooccurrence, pagerank,
                                  triangle_counts, triple_degrees)


def _linked(rows):
    return ray.data.from_pandas(pd.DataFrame(
        rows, columns=["element_id", "canonical_curie"]))


def test_concept_cooccurrence_exact():
    # e1: {A, B, C} (B mentioned twice — counts once), e2: {A, B}, e3: {C}
    linked = _linked([
        ("e1", "A"), ("e1", "B"), ("e1", "B"), ("e1", "C"),
        ("e2", "A"), ("e2", "B"),
        ("e3", "C"),
    ])
    out = concept_cooccurrence(linked, num_buckets=4).to_pandas()
    got = {(r.subj, r.obj): r.n_elements for r in out.itertuples()}
    assert got == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}
    assert out["n_elements"].dtype == "int64"


def test_concept_cooccurrence_no_pairs_schema():
    # single-concept elements produce ZERO edges without crashing; a
    # fully-empty Dataset loses its column schema (documented Ray
    # pandas-block quirk, see shuffle.partitioned_join) so only count is
    # asserted.  One multi-concept element restores the typed schema.
    linked = _linked([("e1", "A"), ("e2", "B")])
    assert concept_cooccurrence(linked, num_buckets=2).count() == 0
    linked = _linked([("e1", "A"), ("e2", "B"), ("e2", "C")])
    df = concept_cooccurrence(linked, num_buckets=2).to_pandas()
    assert list(df.columns) == ["subj", "obj", "n_elements"]
    assert df["n_elements"].dtype == "int64"
    assert got_rows(df) == {("B", "C"): 1}


def got_rows(df):
    return {(r.subj, r.obj): r.n_elements for r in df.itertuples()}


def test_triple_degrees_exact():
    triples = ray.data.from_pandas(pd.DataFrame({
        "subj": ["S1", "S1", "S1", "S1", "S2"],
        "pred": ["p", "p", "q", "p", "p"],
        "obj":  ["o1", "o1", "o2", "o3", "o1"],
    }))
    out = triple_degrees(triples, num_buckets=4).to_pandas().set_index("subj")
    # S1: 4 rows (duplicate (p,o1) counted per row), 2 preds, 3 objs
    assert out.loc["S1", ["n_triples", "n_preds", "n_objs"]].tolist() == [4, 2, 3]
    assert out.loc["S2", ["n_triples", "n_preds", "n_objs"]].tolist() == [1, 1, 1]


def _ref_pagerank(edges, iterations=3, scale=10 ** 12):
    """Pure-Python single-process reference of the integer fixed-point
    PageRank variant (same expressions as stages/graph.py:pagerank)."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {o for _, o in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: scale // n for v in nodes}
    base = (15 * scale) // (100 * n)
    for _ in range(iterations):
        inc = {v: 0 for v in nodes}
        for s, o in edges:
            inc[o] += r[s] // outdeg[s]
        r = {v: base + (85 * inc[v]) // 100 for v in nodes}
    return r


def test_pagerank_matches_reference():
    # cycle + chord + dangling sink; duplicate triple rows and a pred
    # column must not affect the distinct (subj, obj) edge set
    edges = [("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"), ("C", "D")]
    triples = ray.data.from_pandas(pd.DataFrame(
        edges + [("A", "B")], columns=["subj", "obj"]).assign(pred="p"))
    out = pagerank(triples, iterations=3, num_buckets=4).to_pandas()
    got = dict(zip(out["node"], out["rank_mass"]))
    assert got == _ref_pagerank(edges, iterations=3)
    assert out["rank_mass"].dtype == "int64"
    # D is a pure sink: its mass is base + 85% of half of C's mass
    assert got["D"] < got["C"]


def test_pagerank_iteration_count_changes_result():
    edges = [("A", "B"), ("B", "A"), ("B", "C")]
    triples = ray.data.from_pandas(pd.DataFrame(
        edges, columns=["subj", "obj"]))
    one = dict(zip(*(lambda d: (d["node"], d["rank_mass"]))(
        pagerank(triples, iterations=1, num_buckets=2).to_pandas())))
    two = dict(zip(*(lambda d: (d["node"], d["rank_mass"]))(
        pagerank(triples, iterations=2, num_buckets=2).to_pandas())))
    assert one == _ref_pagerank(edges, iterations=1)
    assert two == _ref_pagerank(edges, iterations=2)
    assert one != two


def test_pagerank_seeded_random_graph():
    # 60-node / ~240-edge seeded digraph: partitioned engine result must
    # equal the single-process integer reference on every node
    import numpy as np
    rng = np.random.default_rng(7)
    edges = sorted({(f"n{a:02d}", f"n{b:02d}")
                    for a, b in rng.integers(0, 60, size=(240, 2))
                    if a != b})
    triples = ray.data.from_pandas(pd.DataFrame(
        edges, columns=["subj", "obj"]))
    out = pagerank(triples, iterations=3, num_buckets=8).to_pandas()
    got = dict(zip(out["node"], out["rank_mass"]))
    assert got == _ref_pagerank(edges, iterations=3)


def test_pagerank_hub_skew():
    # star graph: every spoke points at one hub — the hot destination the
    # per-bucket partial sums must absorb; hub rank is exact
    edges = [(f"s{i}", "HUB") for i in range(50)]
    triples = ray.data.from_pandas(pd.DataFrame(
        edges, columns=["subj", "obj"]))
    out = pagerank(triples, iterations=2, num_buckets=4).to_pandas()
    got = dict(zip(out["node"], out["rank_mass"]))
    ref = _ref_pagerank(edges, iterations=2)
    assert got == ref
    assert got["HUB"] == max(got.values())


def test_cooc_components_exact():
    from dug_ray.stages.graph import cooc_components
    # chain A-B (e1), B-C (e2) -> one component labeled A; D-E (e3) ->
    # component D; F never co-occurs -> singleton component F
    linked = _linked([("e1", "A"), ("e1", "B"), ("e2", "B"), ("e2", "C"),
                      ("e3", "D"), ("e3", "E"), ("e4", "F")])
    out = cooc_components(linked, num_buckets=4).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    assert got == {"A": "A", "B": "A", "C": "A",
                   "D": "D", "E": "D", "F": "F"}


def test_cooc_components_edge_free():
    # no element has >=2 concepts -> zero co-annotation edges (the
    # schemaless-empty-Dataset quirk path); every concept is a singleton
    from dug_ray.stages.graph import cooc_components
    linked = _linked([("e1", "A"), ("e2", "B")])
    out = cooc_components(linked, num_buckets=2).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    assert got == {"A": "A", "B": "B"}


def test_cooc_components_distributed_gate():
    # force max_driver_edges=0 -> the dense-graph fallback (shared
    # cluster.min_label_propagation over dense int ids) must produce
    # components identical to the driver union-find path
    from dug_ray.stages.graph import cooc_components
    linked = _linked([("e1", "A"), ("e1", "B"), ("e2", "B"), ("e2", "C"),
                      ("e3", "D"), ("e3", "E"), ("e4", "F")])
    out = cooc_components(linked, num_buckets=4,
                          max_driver_edges=0).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    assert got == {"A": "A", "B": "A", "C": "A",
                   "D": "D", "E": "D", "F": "F"}


def test_cooccurrence_pmi_exact():
    import math
    from dug_ray.stages.graph import cooccurrence_pmi
    # e1:{A,B}, e2:{A,B}, e3:{A}, e4:{C} -> N=4, deg A=3 B=2 C=1;
    # edge (A,B) n_ab=2 -> pmi = ln(2*4 / (3*2)) = ln(4/3)
    linked = _linked([("e1", "A"), ("e1", "B"), ("e2", "A"), ("e2", "B"),
                      ("e3", "A"), ("e4", "C")])
    out = cooccurrence_pmi(linked, num_buckets=4).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["subj"], r["obj"], r["n_elements"]) == ("A", "B", 2)
    assert r["pmi"] == math.log((2 * 4) / (3 * 2))


def test_triangle_counts_exact():
    # K4 on {A,B,C,D} minus edge (C,D): triangles ABC and ABD -> A,B in 2
    # each, C,D in 1 each; E-F is an edge in no triangle (omitted); a
    # duplicate edge row must not double-count
    e = [("A", "B"), ("A", "C"), ("A", "D"), ("B", "C"), ("B", "D"),
         ("E", "F"), ("A", "B")]
    edges = ray.data.from_pandas(pd.DataFrame(e, columns=["subj", "obj"]))
    out = triangle_counts(edges, num_buckets=4).to_pandas()
    got = dict(zip(out["node"], out["n_triangles"]))
    assert got == {"A": 2, "B": 2, "C": 1, "D": 1}
    assert out["n_triangles"].dtype == "int64"


def test_triangle_counts_no_triangles():
    # a path graph has wedges but no closed triangle; result is empty
    edges = ray.data.from_pandas(pd.DataFrame(
        [("A", "B"), ("B", "C")], columns=["subj", "obj"]))
    assert triangle_counts(edges, num_buckets=2).count() == 0


def test_graph_queries_against_oracle(sf_smoke):
    """Full-pipeline parity at sf0.001 via the registered oracles (the
    sf0.01 run is the driver's/selfcheck's job)."""
    import selfcheck
    from dug_ray import queries as q
    for name in ("concept_cooccurrence", "triple_degrees", "pagerank",
                 "triangles", "cooc_pmi", "cooc_components"):
        ray_df = selfcheck.to_pandas(q.QUERIES[name](sf_smoke))
        sql_df = selfcheck.oracle_df(sf_smoke, q.ORACLES[name])
        assert selfcheck.compare(name, ray_df, sql_df) == []


def test_pagerank_resumable_resumes_without_recompute(tmp_path):
    """North-rule resume for the iterative path: a run killed after
    iteration k (simulated by running to k) resumes from the manifest
    checkpoint and recomputes NO round below k — the round-1/2 checkpoint
    files are byte-untouched — and the resumed result is bit-identical to
    an unbroken run (integer fixed-point step)."""
    import glob
    import os

    from dug_ray.stages.graph import pagerank, pagerank_resumable

    edges = [("A", "B"), ("B", "C"), ("C", "A"), ("D", "A"), ("D", "B")]
    triples = ray.data.from_pandas(pd.DataFrame(edges,
                                                columns=["subj", "obj"]))
    out = str(tmp_path / "pr")

    pagerank_resumable(triples, out, iterations=2, num_buckets=4).to_pandas()

    def snap(i):
        files = sorted(glob.glob(os.path.join(out, f"rank-{i:05d}", "*")))
        return [(f, os.path.getmtime(f), os.path.getsize(f)) for f in files]

    s1, s2 = snap(1), snap(2)
    assert s1 and s2

    r4 = pagerank_resumable(triples, out, iterations=4,
                            num_buckets=4).to_pandas()
    assert snap(1) == s1 and snap(2) == s2       # rounds < k untouched
    assert os.path.isdir(os.path.join(out, "rank-00004"))

    want = pagerank(triples, iterations=4, num_buckets=4).to_pandas()
    assert dict(zip(r4["node"], r4["rank_mass"])) == \
        dict(zip(want["node"], want["rank_mass"]))

    # a resume under a different layout must refuse, not silently mix
    with pytest.raises(ValueError, match="layout"):
        pagerank_resumable(triples, out, iterations=4, num_buckets=4,
                           checkpoint_every=2)
