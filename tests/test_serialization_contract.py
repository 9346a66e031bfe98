"""Exact searchable-dict serialization contracts.

Mirrors the reference's element/concept searchable-dict exact-equality
tests (``/root/reference/tests/unit/test_parsers.py:6-88``): one fully
pinned element row and one fully pinned concept row. Any schema or
formatting drift in the serialization layer fails here first."""

from dug_ray import queries

EXPECTED_ELEMENT = {
    "element_id": "0-s0",
    "element_name": "var_0_0",
    "element_desc": "the fast key order sort table scan merge",
    "ml_ready_desc": "the fast key order sort table scan merge",
    "data_type": "dbgap",
    "collection_id": "src0",
    "collection_name": "study src0",
    "element_action": "https://example.org/study/src0/variable/0-s0",
    "collection_action": "https://example.org/study/src0",
    "doc_id": 0,
    "lang": "es",
    "span_offset": 0,
    "chunk_idx": 0,
}

EXPECTED_CONCEPT = {
    "concept_id": "MONDO:0005148",
    "name": "merge disease",
    "type": "biolink:Disease",
    "n_mentions": 935,
    "n_elements": 831,
    "search_terms": "cardiac merge|merge|merge sickness",
    "identifiers": "MESH:D001",
    "synonyms": "cardiac merge|merge sickness",
    "purl": "http://purl.obolibrary.org/obo/MONDO_0005148",
    "first_doc_id": 0,
    "first_tok_pos": 8,
}


def test_element_searchable_dict_exact(sf_smoke):
    e = queries.q_elements(sf_smoke).to_pandas()
    row = e[e["element_id"] == "0-s0"].iloc[0].to_dict()
    assert row == EXPECTED_ELEMENT


def test_concept_searchable_dict_exact(sf_smoke):
    c = queries.q_concepts(sf_smoke).to_pandas()
    row = c[c["concept_id"] == "MONDO:0005148"].iloc[0].to_dict()
    assert row == EXPECTED_CONCEPT
