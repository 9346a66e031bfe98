"""Graph-profile operators over the constructed KG.

The reference serves its KG through Elasticsearch and never profiles it;
a 10^12-document triple table needs first-class graph statistics for
curation and skew planning (which concepts are hubs, which predicates
dominate — exactly the hot keys the canonicalize/expand shuffles salt,
see dug_ray/stages/canonicalize.py).  Two operators:

- ``concept_cooccurrence`` — concept/concept co-annotation edges: two
  canonical CURIEs are connected when they annotate the same element,
  weighted by the number of shared elements.  This is the classic KG
  enrichment edge the reference's concept->element mapping implies but
  never materializes (reference: src/dug/core/crawler.py builds only
  concept->element links).
- ``triple_degrees`` — per-subject degree profile of the full triple
  table (row count, distinct predicates, distinct objects).

Scale notes (100 TB): co-occurrence pairing is quadratic in
concepts-per-element, but elements are 8-token chunks so the per-group
fan-out is bounded by a small constant; the pair stream is then
count-combined per batch BEFORE the final (subj, obj) shuffle, so the
exchange carries partial counts, not raw pairs.  ``triple_degrees``
pre-aggregates (subj, pred, obj) multiplicities per batch — duplicate
triples collapse in the combiner — and only the reduced stream shuffles
by subject.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from dug_ray.shuffle import bucketed_group_apply, distinct_rows, typed_table


def concept_cooccurrence(linked: ray.data.Dataset,
                         num_buckets: int = 32) -> ray.data.Dataset:
    """(subj, obj, n_elements) co-annotation edges, subj < obj.

    Stage 1 distinct-ifies (element_id, canonical_curie) with a per-batch
    combiner + element-bucketed final dedup (one mention of a concept per
    element counts once).  Stage 2 expands pairs WITHIN each element
    bucket (elements are co-located by the stage-1 hash, so the pandas
    self-merge sees every concept of an element) and emits per-bucket
    partial pair counts.  Stage 3 sums partials under a (subj) bucket
    hash — the only all-to-all carries (subj, obj, partial_n) rows.
    """
    dm = distinct_rows(
        linked.select_columns(["element_id", "canonical_curie"]),
        ["element_id", "canonical_curie"], num_buckets)

    def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized within-element pair expansion: self-merge on
        # element_id, keep the ordered half of the cross product
        m = df.merge(df, on="element_id")
        m = m[m["canonical_curie_x"] < m["canonical_curie_y"]]
        g = (m.groupby(["canonical_curie_x", "canonical_curie_y"])
              .size().reset_index(name="n"))
        return g.rename(columns={"canonical_curie_x": "subj",
                                 "canonical_curie_y": "obj"})

    partials = bucketed_group_apply(dm, "element_id", pair_partials,
                                    num_buckets)
    # keep partial blocks schema-stable even when a bucket yields no pairs
    partials = partials.map_batches(
        lambda b: typed_table(b.to_pandas(), subj=pa.string(),
                              obj=pa.string(), n=pa.int64()),
        batch_format="pyarrow", batch_size=None)

    def merge(df: pd.DataFrame) -> pa.Table:
        g = (df.groupby(["subj", "obj"], as_index=False)
               .agg(n_elements=("n", "sum")))
        return typed_table(g, subj=pa.string(), obj=pa.string(),
                           n_elements=pa.int64())

    return bucketed_group_apply(partials, "subj", merge, num_buckets)


def triple_degrees(triples: ray.data.Dataset,
                   num_buckets: int = 32) -> ray.data.Dataset:
    """(subj, n_triples, n_preds, n_objs) degree profile of the KG.

    Per-batch combiner collapses duplicate (subj, pred, obj) rows to a
    multiplicity count, so the subject shuffle moves one row per distinct
    triple; the bucketed finalizer then computes the exact row count
    (sum of multiplicities) and distinct pred/obj counts per subject.
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["subj", "pred", "obj"]).to_pandas()
        g = df.groupby(["subj", "pred", "obj"]).size().reset_index(name="n")
        return typed_table(g, subj=pa.string(), pred=pa.string(),
                           obj=pa.string(), n=pa.int64())

    partials = triples.map_batches(partial, batch_format="pyarrow",
                                   batch_size=None)

    def finalize(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("subj").agg(
            n_triples=("n", "sum"),
            n_preds=("pred", "nunique"),
            n_objs=("obj", "nunique")).reset_index()
        return typed_table(g, subj=pa.string(), n_triples=pa.int64(),
                           n_preds=pa.int64(), n_objs=pa.int64())

    return bucketed_group_apply(partials, "subj", finalize, num_buckets)
