"""Deterministic synthetic ontology — the stand-in for dug's remote services.

The reference calls four HTTP services per element (sequentially,
``/root/reference/src/dug/core/crawler.py:113-119``):

- Monarch/SapBERT NER+linker  (``core/annotators/monarch_annotator.py:113-153``,
  ``core/annotators/sapbert_annotator.py:233-320``)  -> NER_LEXICON here
  (term -> candidate CURIE + label + category + linker score; the 0.8 score
  threshold semantics come from ``sapbert_annotator.py:310-319`` /
  ``config.py:48-51``).
- Translator node normalizer  (``core/annotators/_base.py:97-180``)
  -> NORMALIZER_MAP (raw CURIE -> preferred CURIE/label/type; null preferred
  id = normalization failure, rescued only when the prefix is in
  ONTOLOGY_GREENLIST, ``monarch_annotator.py:62-74`` + ``config.py:134-145``).
- Name-resolver synonym service (``core/annotators/_base.py:183-229``)
  -> SYNONYM_MAP (canonical CURIE -> names).
- TranQL KG expansion (``core/concept_expander.py:24-98``, ``core/tranql.py``)
  -> ONTOLOGY_EDGES (subj CURIE -> (pred, obj) with obj metadata), one
  ``source_query`` per configured query shape (``config.py:94-104``), subject
  prefix validity per query (``core/tranql.py:205-212,242-255``), and the
  exclude-redlist (``config.py:92``: CHEBI:17336).

All tables are tiny, fixed, pure-literal data over the 31-word vocabulary of
the driver-generated ``documents`` table, so that:
  (a) they can be broadcast (``ray.put`` once) to every actor — the
      scale-correct pattern for small-side lookups, and
  (b) every pipeline stage has an exact DuckDB oracle: ``sql_cte()`` renders
      each table as a ``VALUES`` CTE fragment for ``oracle_sql()``.
"""

from __future__ import annotations

import pandas as pd

# ---------------------------------------------------------------------------
# Greenlist / redlist / thresholds (reference: config.py:48-51,92,134-145)
# ---------------------------------------------------------------------------

ONTOLOGY_GREENLIST = ["PATO", "CHEBI", "MONDO", "UBERON", "HP", "MESH", "UMLS"]
TRANQL_EXCLUDE_IDENTIFIERS = ["CHEBI:17336"]
LINKER_SCORE_THRESHOLD = 0.8  # sapbert_annotator.py:310-319 (direction: >=)

# ---------------------------------------------------------------------------
# NER lexicon + linker candidate scores.
# term -> (curie, label, category, score). One term may yield several
# candidate identifiers (the span x token expansion of monarch_annotator
# .py:137-153 — e.g. "heart attack" -> 7 identifiers in the reference tests).
# 'the' is the deliberate HOT KEY: it appears in nearly every document, which
# is what the canonicalization shuffle's skew handling is exercised against.
# ---------------------------------------------------------------------------

NER_LEXICON = [
    # (term,    curie,        label,              category,                    score)
    ("merge",  "MESH:D001",   "coronary merge",   "biolink:Disease",           0.97),
    ("hash",   "MESH:D002",   "hash syndrome",    "biolink:Disease",           0.93),
    ("slow",   "MESH:D003",   "slow fever",       "biolink:Disease",           0.91),
    ("query",  "UMLS:C001",   "query fever",      "biolink:Disease",           0.88),
    ("join",   "UMLS:C002",   "joint join",       "biolink:PhenotypicFeature", 0.86),
    ("sort",   "UMLS:C003",   "sorted gait",      "biolink:PhenotypicFeature", 0.84),
    ("spark",  "HP:0000001",  "spark tremor",     "biolink:PhenotypicFeature", 0.9),
    ("scan",   "MESH:D004",   "scan anomaly",     "biolink:Disease",           0.95),
    ("scan",   "UMLS:C004",   "scan weakness",    "biolink:PhenotypicFeature", 0.55),  # < 0.8: dropped by linker
    ("filter", "CHEBI:100",   "filterol",         "biolink:ChemicalEntity",    0.92),
    ("vector", "CHEBI:101",   "vectorin",         "biolink:ChemicalEntity",    0.89),
    ("stream", "ORPHANET:1",  "stream disease",   "biolink:Disease",           0.87),
    ("batch",  "PATO:0000100","batch quality",    "biolink:PhenotypicFeature", 0.85),
    ("window", "XXX:900",     "window artifact",  "biolink:Device",            0.9),   # normalizes to null, prefix not greenlisted -> dropped
    ("the",    "MONDO:0004976","ubiquitous theitis","biolink:Disease",         0.99),  # HOT KEY
]

# ---------------------------------------------------------------------------
# Normalizer map: raw CURIE -> preferred (canonical) CURIE.
# preferred_curie = None models normalization failure (annotators/_base.py
# :143-180 returns None): PATO:0000100 survives via greenlist rescue with its
# raw id; XXX:900 is dropped. MESH:D003 and UMLS:C001 both canonicalize to
# MONDO:0000001 — the concept-merge path of crawler.py:155-166.
# CHEBI:101 canonicalizes onto the redlisted CHEBI:17336 to exercise the
# expansion anti-join (crawler.py:183-185).
# ---------------------------------------------------------------------------

NORMALIZER_MAP = [
    # (curie,        preferred_curie, preferred_label,   preferred_type)
    ("MESH:D001",    "MONDO:0005148", "merge disease",   "biolink:Disease"),
    ("MESH:D002",    "MONDO:0000002", "hash syndrome",   "biolink:Disease"),
    ("MESH:D003",    "MONDO:0000001", "slowquery fever", "biolink:Disease"),
    ("UMLS:C001",    "MONDO:0000001", "slowquery fever", "biolink:Disease"),
    ("UMLS:C002",    "HP:0000002",    "join phenotype",  "biolink:PhenotypicFeature"),
    ("UMLS:C003",    "HP:0000003",    "sort phenotype",  "biolink:PhenotypicFeature"),
    ("HP:0000001",   "HP:0000001",    "spark tremor",    "biolink:PhenotypicFeature"),
    ("MESH:D004",    "MONDO:0000003", "scan disease",    "biolink:Disease"),
    ("UMLS:C004",    "HP:0000004",    "scan weakness",   "biolink:PhenotypicFeature"),
    ("CHEBI:100",    "CHEBI:100",     "filterol",        "biolink:ChemicalEntity"),
    ("CHEBI:101",    "CHEBI:17336",   "vectorin",        "biolink:ChemicalEntity"),
    ("ORPHANET:1",   "MONDO:0000004", "stream disease",  "biolink:Disease"),
    ("MONDO:0004976","MONDO:0004976", "ubiquitous theitis", "biolink:Disease"),
    ("PATO:0000100", None,            None,              None),
    ("XXX:900",      None,            None,              None),
]

# canonical CURIE -> synonym (long format; _base.py:183-229)
SYNONYM_MAP = [
    ("MONDO:0005148", "merge sickness"),
    ("MONDO:0005148", "cardiac merge"),
    ("MONDO:0000001", "slow fever syn"),
    ("MONDO:0000001", "query fever syn"),
    ("HP:0000002",    "join pain"),
    ("MONDO:0004976", "the disease"),
    ("CHEBI:100",     "filter alcohol"),
]

# prefix -> PURL base (biolink_purl_util.py:4-163, 160-entry static dict there)
PURL_MAP = {
    "MONDO": "http://purl.obolibrary.org/obo/MONDO_",
    "HP": "http://purl.obolibrary.org/obo/HP_",
    "CHEBI": "http://purl.obolibrary.org/obo/CHEBI_",
    "PATO": "http://purl.obolibrary.org/obo/PATO_",
    "UBERON": "http://purl.obolibrary.org/obo/UBERON_",
}

# ---------------------------------------------------------------------------
# Ontology edge table (the synthetic TranQL answer graph).
# Three query shapes mirroring config.py:94-104 two-hop templates; per-query
# allowed subject prefixes mirror tranql.py:205-212 curie_map. The one
# HP-subject row under disease_chemical is an intentional validity violation
# (dropped by the M16 filter); CHEBI:17336 subject rows are dropped by the
# M17 redlist anti-join. MONDO:0004976 (hot key) carries the most edges.
# biolink:Publication objects with HEALCDE: prefix feed node->element casting
# (crawler.py:203-276, config.py:106-125).
# ---------------------------------------------------------------------------

ONTOLOGY_EDGES = [
    # (subj,          pred,                    obj,          obj_name,        obj_category,               source_query)
    ("MONDO:0005148", "biolink:treated_by",    "CHEBI:200",  "mergexol",      "biolink:ChemicalEntity",   "disease_chemical"),
    ("MONDO:0000001", "biolink:treated_by",    "CHEBI:201",  "slowquerycin",  "biolink:ChemicalEntity",   "disease_chemical"),
    ("MONDO:0000002", "biolink:treated_by",    "CHEBI:202",  "hashenol",      "biolink:ChemicalEntity",   "disease_chemical"),
    ("MONDO:0000003", "biolink:treated_by",    "CHEBI:203",  "scanamide",     "biolink:ChemicalEntity",   "disease_chemical"),
    ("MONDO:0004976", "biolink:treated_by",    "CHEBI:204",  "theophylline",  "biolink:ChemicalEntity",   "disease_chemical"),
    ("MONDO:0004976", "biolink:treated_by",    "CHEBI:205",  "ubiquinol",     "biolink:ChemicalEntity",   "disease_chemical"),
    ("HP:0000003",    "biolink:treated_by",    "CHEBI:206",  "sortenol",      "biolink:ChemicalEntity",   "disease_chemical"),  # invalid subj prefix for this query -> dropped by M16
    ("CHEBI:17336",   "biolink:affects",       "MONDO:0000009","phantomitis", "biolink:Disease",          "chemical_disease"),  # redlisted subj -> dropped by M17
    ("CHEBI:100",     "biolink:affects",       "MONDO:0005148","merge disease","biolink:Disease",         "chemical_disease"),
    ("MONDO:0005148", "biolink:has_phenotype", "HP:0000002", "join phenotype","biolink:PhenotypicFeature","disease_phenotype"),
    ("MONDO:0000001", "biolink:has_phenotype", "HP:0000003", "sort phenotype","biolink:PhenotypicFeature","disease_phenotype"),
    ("MONDO:0004976", "biolink:has_phenotype", "HP:0000001", "spark tremor",  "biolink:PhenotypicFeature","disease_phenotype"),
    ("MONDO:0004976", "biolink:has_phenotype", "HP:0000005", "omni pheno",    "biolink:PhenotypicFeature","disease_phenotype"),
    ("HP:0000002",    "biolink:phenotype_of",  "MONDO:0005148","merge disease","biolink:Disease",         "phenotype_disease"),
    ("HP:0000001",    "biolink:phenotype_of",  "MONDO:0004976","ubiquitous theitis","biolink:Disease",    "phenotype_disease"),
    ("MONDO:0005148", "biolink:mentioned_in",  "HEALCDE:42", "cde doc 42",    "biolink:Publication",      "disease_cde"),
    ("MONDO:0000001", "biolink:mentioned_in",  "HEALCDE:43", "cde doc 43",    "biolink:Publication",      "disease_cde"),
    ("MONDO:0004976", "biolink:mentioned_in",  "HEALCDE:44", "cde doc 44",    "biolink:Publication",      "disease_cde"),
]

# query name -> allowed subject CURIE prefixes (tranql.py:205-212 curie_map)
QUERY_VALID_PREFIXES = {
    "disease_chemical": ["MONDO", "ORPHANET", "DOID"],
    "chemical_disease": ["CHEBI"],
    "disease_phenotype": ["MONDO", "ORPHANET", "DOID"],
    "phenotype_disease": ["HP"],
    "disease_cde": ["MONDO", "ORPHANET", "DOID"],
}

# TOPMed-tag-style tiny dimension table (topmed_tag_parser.py:35-49):
# elements join to it on tag_pk = doc_id % 4 (J1 broadcast join).
TOPMED_TAGS = [
    # (tag_pk, title,         description,               instructions)
    (0, "blood pressure", "bp related variables",    "tag bp vars"),
    (1, "demographics",   "age sex race variables",  "tag demo vars"),
    (2, "lab values",     "laboratory measurements", "tag lab vars"),
    (3, "lifestyle",      "smoking drinking vars",   "tag life vars"),
]


# ---------------------------------------------------------------------------
# Accessors
# ---------------------------------------------------------------------------

def lexicon_df() -> pd.DataFrame:
    return pd.DataFrame(NER_LEXICON, columns=["term", "curie", "label", "category", "score"])


def normalizer_df() -> pd.DataFrame:
    return pd.DataFrame(
        NORMALIZER_MAP,
        columns=["curie", "preferred_curie", "preferred_label", "preferred_type"],
    )


def synonym_df() -> pd.DataFrame:
    return pd.DataFrame(SYNONYM_MAP, columns=["curie", "synonym"])


def edges_df() -> pd.DataFrame:
    return pd.DataFrame(
        ONTOLOGY_EDGES,
        columns=["subj", "pred", "obj", "obj_name", "obj_category", "source_query"],
    )


def tags_df() -> pd.DataFrame:
    return pd.DataFrame(TOPMED_TAGS, columns=["tag_pk", "title", "description", "instructions"])


def purl_for(curie: str) -> str:
    prefix, _, suffix = curie.partition(":")
    base = PURL_MAP.get(prefix, "")
    return base + suffix if base else ""


def valid_prefix_df() -> pd.DataFrame:
    rows = [(q, p) for q, ps in QUERY_VALID_PREFIXES.items() for p in ps]
    return pd.DataFrame(rows, columns=["source_query", "prefix"])


# ---------------------------------------------------------------------------
# SQL rendering for DuckDB oracles
# ---------------------------------------------------------------------------

def _sql_lit(v) -> str:
    # Floats/ints are cast explicitly: a bare 0.97 in DuckDB VALUES infers
    # DECIMAL(3,2) and a bare 3 infers INTEGER — both would mismatch the
    # engine's float64/int64 output schema in the driver's comparison.
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return f"CAST({v} AS BIGINT)"
    if isinstance(v, float):
        return f"CAST({v!r} AS DOUBLE)"
    return repr(v)


def _values_cte(name: str, columns: list[str], rows: list[tuple]) -> str:
    body = ",\n    ".join("(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in rows)
    cols = ", ".join(columns)
    return f"{name}({cols}) AS (VALUES\n    {body})"


def sql_cte(*tables: str) -> str:
    """Render the named ontology tables as comma-joined CTE fragments.

    Usable as ``WITH {sql_cte('lexicon','normalizer')}, more AS (...) SELECT``.
    """
    frags = []
    for t in tables:
        if t == "lexicon":
            frags.append(_values_cte("lexicon", ["term", "curie", "label", "category", "score"], NER_LEXICON))
        elif t == "normalizer":
            frags.append(_values_cte(
                "normalizer", ["curie", "preferred_curie", "preferred_label", "preferred_type"], NORMALIZER_MAP))
        elif t == "synonyms":
            frags.append(_values_cte("synonyms", ["curie", "synonym"], SYNONYM_MAP))
        elif t == "edges":
            frags.append(_values_cte(
                "edges", ["subj", "pred", "obj", "obj_name", "obj_category", "source_query"], ONTOLOGY_EDGES))
        elif t == "valid_prefix":
            rows = list(map(tuple, valid_prefix_df().itertuples(index=False)))
            frags.append(_values_cte("valid_prefix", ["source_query", "prefix"], rows))
        elif t == "greenlist":
            frags.append(_values_cte("greenlist", ["prefix"], [(p,) for p in ONTOLOGY_GREENLIST]))
        elif t == "redlist":
            frags.append(_values_cte("redlist", ["curie"], [(c,) for c in TRANQL_EXCLUDE_IDENTIFIERS]))
        elif t == "purls":
            frags.append(_values_cte("purls", ["prefix", "base"], sorted(PURL_MAP.items())))
        elif t == "tags":
            frags.append(_values_cte("tags", ["tag_pk", "title", "description", "instructions"], TOPMED_TAGS))
        else:
            raise KeyError(t)
    return ",\n".join(frags)
