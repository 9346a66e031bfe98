"""dug_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the query/data-processing capabilities of
helxplatform/dug (annotate -> normalize -> expand -> index) as a streaming
Ray Data pipeline over an interleaved text+media document table:

    read_documents -> spanify -> parse (elements) -> NER (mentions)
      -> link+normalize (canonical CURIEs) -> canonicalize shuffle (concepts)
      -> expand vs ontology edges (triples) -> sort('subj') -> partitioned write

Reference semantics are cited per-stage as ``file:line`` into
``/root/reference`` (helxplatform/dug @ 2025-10-17). Nothing is ported; every
stage is expressed as a ``ray.data.Dataset`` transform (``map_batches`` over
Arrow batches, actor pools for stateful stages, groupby/aggregate shuffles for
the wide steps) per the north star in BASELINE.json.
"""

__version__ = "0.1.0"
