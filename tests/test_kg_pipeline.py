"""End-to-end KG pipeline tests against a pure-Python oracle.

Mirrors the reference's crawler tests (``/root/reference/tests/unit/
test_crawler.py:23-101``): annotate -> concepts built -> expansion triples,
with exact-set equality instead of the P/R bound (the bound is for the
10^12-doc run; at test scale we demand equality)."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from dug_ray import ontology
from dug_ray.pipelines import kg
from dug_ray.stages.canonicalize import build_concepts
from dug_ray.stages.expand import cast_elements_from_triples


def python_oracle_mentions(sf_dir):
    """Pure-Python reimplementation of parse+NER+link over the raw table."""
    raw = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    lex = {}
    for term, curie, label, cat, score in ontology.NER_LEXICON:
        lex.setdefault(term, []).append((curie, label, cat, score))
    norm = {c: (p, l, t) for c, p, l, t in ontology.NORMALIZER_MAP}
    green = set(ontology.ONTOLOGY_GREENLIST)
    rows = []
    for _, r in raw.iterrows():
        for pos, w in enumerate(r["text"].split(" "), start=1):
            for curie, label, cat, score in lex.get(w, []):
                if score < ontology.LINKER_SCORE_THRESHOLD:
                    continue
                # a curie with NO normalizer row takes the same rescue path
                # as an explicit-None row (link.py norm_map.get semantics)
                pref, plabel, ptype = norm.get(curie, (None, None, None))
                if pref is None:
                    if curie.split(":")[0] not in green:
                        continue
                    pref, plabel, ptype = curie, label, cat
                chunk = (pos - 1) // 8
                offset = chunk + chunk // 2
                rows.append({
                    "doc_id": str(r["doc_id"]),
                    "element_id": f"{r['doc_id']}-s{offset}",
                    "tok_pos": pos, "term": w, "curie": curie,
                    "canonical_curie": pref, "name": plabel, "type": ptype,
                })
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def oracle(sf_smoke):
    return python_oracle_mentions(sf_smoke)


@pytest.fixture(scope="module")
def linked_df(sf_smoke):
    return kg.linked_mentions_ds(sf_smoke).to_pandas()


def test_linked_mentions_exact(linked_df, oracle):
    got = linked_df[["doc_id", "element_id", "tok_pos", "term", "curie",
                     "canonical_curie", "name", "type"]].sort_values(
        ["doc_id", "tok_pos", "curie"]).reset_index(drop=True)
    want = oracle[got.columns.tolist()].sort_values(
        ["doc_id", "tok_pos", "curie"]).reset_index(drop=True)
    got["doc_id"] = got["doc_id"].astype(str)
    got["tok_pos"] = got["tok_pos"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_dropped_paths(linked_df):
    # sub-threshold candidate (scan -> UMLS:C004 @0.55) never links
    assert "UMLS:C004" not in set(linked_df["curie"])
    assert "HP:0000004" not in set(linked_df["canonical_curie"])
    # non-greenlist normalization failure dropped
    assert "XXX:900" not in set(linked_df["curie"])
    # greenlist rescue keeps PATO with raw id
    pato = linked_df[linked_df["curie"] == "PATO:0000100"]
    assert len(pato) > 0
    assert (pato["canonical_curie"] == "PATO:0000100").all()
    assert (pato["name"] == "batch quality").all()


def test_concept_merge(sf_smoke, oracle):
    concepts = build_concepts(kg.linked_mentions_ds(sf_smoke)).to_pandas()
    assert set(concepts["concept_id"]) == set(oracle["canonical_curie"])
    # MONDO:0000001 merges two raw identifiers (slow + query)
    m1 = concepts[concepts["concept_id"] == "MONDO:0000001"].iloc[0]
    assert m1["identifiers"] == "MESH:D003|UMLS:C001"
    terms = set(m1["search_terms"].split("|"))
    assert {"slow", "query", "slow fever syn", "query fever syn"} <= terms
    # first-wins: name/type from the global min (doc_id, tok_pos) mention
    o = oracle[oracle["canonical_curie"] == "MONDO:0000001"].sort_values(["tok_pos"])
    o = o.assign(_d=pd.to_numeric(o["doc_id"])).sort_values(["_d", "tok_pos"])
    assert m1["name"] == o.iloc[0]["name"]
    assert int(m1["n_mentions"]) == len(o)
    # per-concept mention counts match the oracle exactly
    counts = concepts.set_index("concept_id")["n_mentions"].astype(int).to_dict()
    want = oracle.groupby("canonical_curie").size().to_dict()
    assert counts == want


def test_triples(sf_smoke, oracle):
    trip = kg.kg_triples(sf_smoke).to_pandas()
    exp = trip[trip["pred"] != "dug:annotates"]
    concepts = set(oracle["canonical_curie"])
    edges = ontology.edges_df()
    want = set()
    for _, e in edges.iterrows():
        if e["subj"] not in concepts:
            continue
        if e["subj"] in ontology.TRANQL_EXCLUDE_IDENTIFIERS:
            continue
        if e["subj"].split(":")[0] not in ontology.QUERY_VALID_PREFIXES[e["source_query"]]:
            continue
        want.add((e["subj"], e["pred"], e["obj"]))
    assert set(map(tuple, exp[["subj", "pred", "obj"]].values)) == want
    # annotates edges = distinct (canonical, element) pairs of the oracle
    ann = trip[trip["pred"] == "dug:annotates"]
    want_pairs = set(map(tuple, oracle[["canonical_curie", "element_id"]]
                         .drop_duplicates().values))
    assert set(map(tuple, ann[["subj", "obj"]].values)) == want_pairs


def test_cast_elements(sf_smoke):
    trip = kg.kg_triples(sf_smoke)
    cast = cast_elements_from_triples(trip).to_pandas()
    assert set(cast["element_id"]) == {"HEALCDE:42", "HEALCDE:43", "HEALCDE:44"}
    assert (cast["data_type"] == "cde").all()


def test_preprocess_debreviator():
    """M2: ordered substring replacement before tokenization
    (monarch_annotator.py:155-172; default dict config.py:35-40)."""
    import pyarrow as pa
    from dug_ray.stages.annotate import DictionaryNER, preprocess_text
    col = pa.array(["bmi high", "a_b"])
    out = preprocess_text(col, {"bmi": "body mass index", "_": " "})
    assert out.to_pylist() == ["body mass index high", "a b"]
    # NER with a preprocessor that rewrites a term into a lexicon hit
    ner = DictionaryNER(preprocessor={"zzz": "merge"})
    batch = pa.table({
        "element_id": ["1-s0"], "doc_id": ["1"], "collection_id": ["src0"],
        "span_offset": pa.array([0], pa.int32()), "chunk_idx": pa.array([0], pa.int32()),
        "element_desc": ["zzz table"],
    })
    hits = ner(batch)
    assert hits.num_rows == 1
    assert hits.column("curie").to_pylist() == ["MESH:D001"]


def test_actor_pool_path_equivalent(sf_smoke, linked_df):
    """The actor-pool stage form (broadcast-ref state) produces the same
    linked mentions as the stateless default."""
    pooled = kg.linked_mentions_ds(sf_smoke, stateless=False,
                                   concurrency=1).to_pandas()
    key = ["element_id", "tok_pos", "curie"]
    a = pooled[key].sort_values(key).reset_index(drop=True)
    b = linked_df[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_kg_answers_oracle(sf_smoke, oracle):
    """A6/M18 answer dedup vs the python oracle's expansion set."""
    from dug_ray import queries
    ans = queries.q_kg_answers(sf_smoke).to_pandas()
    concepts = set(oracle["canonical_curie"])
    edges = ontology.edges_df()
    want = {}
    for _, e in edges.iterrows():
        if (e["subj"] in concepts
                and e["subj"] not in ontology.TRANQL_EXCLUDE_IDENTIFIERS
                and e["subj"].split(":")[0]
                in ontology.QUERY_VALID_PREFIXES[e["source_query"]]):
            want.setdefault((e["subj"], e["source_query"]), set()).add(e["obj"])
    got = {(r["subj"], r["source_query"]): set(r["objs"].split("|"))
           for _, r in ans.iterrows()}
    assert got == want
    # answer_id dedup contract: joined sorted node ids + query name
    for _, r in ans.iterrows():
        assert r["answer_id"] == r["objs"].replace("|", "_") + "_" + r["source_query"]


def test_export_searchable(sf_smoke, tmp_path):
    from dug_ray.pipelines.export import export_searchable
    counts = export_searchable(sf_smoke, str(tmp_path / "idx"))
    assert counts["concepts"] == 12
    assert counts["elements"] > 3000
    assert counts["kg"] == 14


def test_custom_lexicon_flows_through_linker():
    """Extensibility contract: a custom broadcast lexicon (lexicon_ref)
    must flow NER -> link end-to-end — the linker builds its composite
    from the SAME lexicon, so new greenlisted terms survive the rescue
    path instead of being silently dropped."""
    import pyarrow as pa
    import ray

    from dug_ray.stages.annotate import DictionaryNER
    from dug_ray.stages.link import LinkNormalize

    custom = pd.concat([ontology.lexicon_df(), pd.DataFrame([{
        "term": "zebrafish", "curie": "MESH:D015027", "label": "Zebrafish",
        "category": "biolink:OrganismTaxon", "score": 0.95}])],
        ignore_index=True)
    ref = ray.put(custom)
    elements = pa.table({
        "doc_id": ["1"], "element_id": ["1-s0"], "collection_id": ["src0"],
        "span_offset": pa.array([0], pa.int32()),
        "chunk_idx": pa.array([0], pa.int32()),
        "element_desc": ["the zebrafish swims"],
    })
    mentions = DictionaryNER(lexicon_ref=ref)(elements)
    linked = LinkNormalize(lexicon_ref=ref)(mentions).to_pandas()
    zeb = linked[linked["curie"] == "MESH:D015027"]
    # MESH is greenlisted and absent from the normalizer -> rescue keeps it
    assert len(zeb) == 1
    assert zeb.iloc[0]["canonical_curie"] == "MESH:D015027"
    assert zeb.iloc[0]["name"] == "Zebrafish"
