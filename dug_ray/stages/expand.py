"""KG expansion: concepts + linked mentions -> (subj, pred, obj) triples.

Re-expresses dug's TranQL concept expansion (SURVEY.md §2.2 M16-M19, §2.4
J5-J6) as joins against the synthetic ontology edge table instead of the
remote TranQL service (``/root/reference/src/dug/core/concept_expander.py:
24-98``, answer extraction ``core/tranql.py:21-105``):

- **curie validity filter** (M16, ``tranql.py:242-255``; prefix map
  ``tranql.py:205-212``): an edge only applies to a concept when the
  concept's CURIE prefix is allowed for that edge's query shape;
- **redlist anti-join** (M17, ``crawler.py:183-185`` +
  ``config.py:92``): excluded identifiers are never expanded — a broadcast
  anti filter;
- **expansion join** (J5): concepts x ontology_edges on the canonical
  CURIE. The edges table here is small -> broadcast merge inside
  ``map_batches`` over the streaming concepts Dataset; at full KG scale
  (edges >> memory) this becomes a hash-partitioned shuffle join on
  ``subj`` — same key as the final sort, so the partitioning is reused;
- **annotates edges**: one ``dug:annotates`` triple per distinct
  (concept, element) pair — dug's concept->element membership
  (``crawler.py:128-142``, the searchable-dict ``concepts`` field). This is
  the *large* side (O(mentions)), produced by a vectorized per-batch
  distinct + a final groupby dedup (exact dedup via hash partition, A6
  semantics);
- **node->element casting** (M19, ``crawler.py:203-276``,
  ``config.py:106-125``): expansion objects whose category matches a
  casting config (here ``biolink:Publication`` with ``HEALCDE:`` prefix)
  become new elements, unioned into the elements stream.

Triple row: ``subj, pred, obj, obj_name, source_query``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from dug_ray import ontology

TRIPLE_SCHEMA = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("obj_name", pa.string()),
    ("source_query", pa.string()),
])


def _valid_edges() -> pd.DataFrame:
    """Edge table pre-filtered by subject-prefix validity + redlist.

    Both filters depend only on the edge row, so they are applied once to
    the small side before broadcast (cheaper than per-batch)."""
    e = ontology.edges_df()
    prefix = e["subj"].str.partition(":")[0]
    allowed = pd.Series(
        [p in ontology.QUERY_VALID_PREFIXES.get(q, []) for p, q in zip(prefix, e["source_query"])],
        index=e.index)
    e = e[allowed & ~e["subj"].isin(ontology.TRANQL_EXCLUDE_IDENTIFIERS)]
    return e.reset_index(drop=True)


import functools


@functools.lru_cache(maxsize=1)
def _valid_edges_cached() -> pd.DataFrame:
    return _valid_edges()


def expand_concepts(concepts: ray.data.Dataset, edges_ref=None) -> ray.data.Dataset:
    """concepts -> expansion triples (broadcast join on canonical CURIE)."""

    class Expander:
        def __init__(self):
            self.edges = ray.get(edges_ref) if edges_ref is not None else _valid_edges()

        def __call__(self, batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()[["concept_id"]]
            hit = df.merge(self.edges, left_on="concept_id", right_on="subj",
                           how="inner", sort=False)
            out = hit[["subj", "pred", "obj", "obj_name", "source_query"]]
            return pa.Table.from_pandas(out, preserve_index=False).cast(TRIPLE_SCHEMA)

    return concepts.map_batches(Expander, batch_format="pyarrow", concurrency=(1, 2))


def triples_partial(linked: ray.data.Dataset, edges_ref=None) -> ray.data.Dataset:
    """One-pass combiner: linked mentions -> (annotates pairs U expansion
    triples), emitted per batch in a single stage.

    This keeps the headline pipeline a SINGLE streaming pass — no
    ``materialize()`` of the mention table and no branch re-execution; the
    only exchange left is the salted subject-bucket groupby of
    ``materialize_graph(dedup=True)``, where cross-batch duplicates are
    exactly deduped. Projects to the two needed columns before building
    triples; low-cardinality columns are dictionary-encoded (shuffle moves
    codes, not repeated strings)."""

    def emit(batch: pa.Table) -> pa.Table:
        # stateless task (elastic); the edge table is tiny here and cached
        # per worker process — at real KG scale this becomes an actor pool
        # holding the broadcast edge table (edges_ref)
        edges = ray.get(edges_ref) if edges_ref is not None else _valid_edges_cached()
        df = batch.select(["canonical_curie", "element_id"]).to_pandas().drop_duplicates()
        n = len(df)
        ann = pa.table({
            "subj": pa.array(df["canonical_curie"], type=pa.string()).dictionary_encode(),
            "pred": pa.nulls(n, pa.string()).fill_null("dug:annotates").dictionary_encode(),
            "obj": pa.array(df["element_id"], type=pa.string()),
            "obj_name": pa.nulls(n, pa.string()).fill_null("").dictionary_encode(),
            "source_query": pa.nulls(n, pa.string()).fill_null("annotation").dictionary_encode(),
        })
        uniq = set(df["canonical_curie"].unique())
        hit = edges[edges["subj"].isin(uniq)]
        exp = pa.table({
            "subj": pa.array(hit["subj"], type=pa.string()).dictionary_encode(),
            "pred": pa.array(hit["pred"], type=pa.string()).dictionary_encode(),
            "obj": pa.array(hit["obj"], type=pa.string()),
            "obj_name": pa.array(hit["obj_name"], type=pa.string()).dictionary_encode(),
            "source_query": pa.array(hit["source_query"], type=pa.string()).dictionary_encode(),
        })
        return pa.concat_tables([exp, ann], promote_options="default")

    return linked.map_batches(emit, batch_format="pyarrow", batch_size=None)


def annotates_edges(linked: ray.data.Dataset) -> ray.data.Dataset:
    """linked mentions -> distinct (concept, 'dug:annotates', element) triples.

    Vectorized per-batch distinct (the combiner — same concept mentioned
    many times in one element collapses before any data moves), then an
    exact bucketed dedup (shuffle forms O(num_buckets) groups, not
    O(#elements); see dug_ray.shuffle)."""
    from dug_ray.shuffle import distinct_rows

    pairs = distinct_rows(linked, ["element_id", "canonical_curie"], num_buckets=32)

    def to_triples(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "subj": pc.cast(batch["canonical_curie"], pa.string()),
            "pred": pa.nulls(n, pa.string()).fill_null("dug:annotates"),
            "obj": pc.cast(batch["element_id"], pa.string()),
            "obj_name": pa.nulls(n, pa.string()).fill_null(""),
            "source_query": pa.nulls(n, pa.string()).fill_null("annotation"),
        })

    return pairs.map_batches(to_triples, batch_format="pyarrow", batch_size=None)


def cast_elements_from_triples(triples: ray.data.Dataset,
                               category: str = "biolink:Publication",
                               prefix: str = "HEALCDE") -> ray.data.Dataset:
    """M19 node->element casting: qualifying expansion objects become new
    elements (``crawler.py:203-276``; ``attribute_mapping`` reformat
    ``factory.py:69-95`` with first-element truncation ``crawler.py:267-269``).
    """
    edges = ontology.edges_df()

    def per_batch(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cat = df["obj"].map(dict(zip(edges["obj"], edges["obj_category"])))
        hit = df[(cat == category) & df["obj"].str.startswith(prefix + ":")]
        # combiner must keep the MIN subj per obj (the global dedup picks
        # min collection_id; a keep-first here could discard it before the
        # final merge ever sees it)
        hit = hit.sort_values(["obj", "subj"], kind="mergesort") \
                 .drop_duplicates(subset=["obj"], keep="first")
        return pa.table({
            "element_id": pa.array(hit["obj"], type=pa.string()),
            "element_name": pa.array(hit["obj_name"], type=pa.string()),
            "element_desc": pa.array(hit["obj_name"], type=pa.string()),
            "data_type": pa.array(["cde"] * len(hit), type=pa.string()),
            "collection_id": pa.array(hit["subj"], type=pa.string()),
        })

    # distinct across blocks: same HEALCDE obj may arrive from many concepts;
    # bucketed grouped apply (not per-key map_groups — shuffle.py discipline)
    from dug_ray.shuffle import bucketed_group_apply
    casted = triples.map_batches(per_batch, batch_format="pyarrow", batch_size=None)

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["element_id", "collection_id"], kind="mergesort")
                .drop_duplicates(subset=["element_id"], keep="first"))

    return bucketed_group_apply(casted, "element_id", dedup, num_buckets=8)
