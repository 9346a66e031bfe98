"""Canonicalization shuffle: linked mentions -> concepts Dataset.

The Ray-Data re-expression of dug's concept assembly (SURVEY.md §2.5 A1-A5):
the reference accumulates a global in-process ``self.concepts`` dict while
looping elements sequentially (``/root/reference/src/dug/core/crawler.py:
34,155-166``), with first-writer-wins concept name/desc and per-identifier
``search_text`` unions (``parsers/_base.py:99-104,116-121``). Here that
implicit mutable state becomes an explicit **partial+final aggregate**:

1. *partial* (the combiner): inside ``map_batches``, a pandas groupby per
   batch collapses each batch's mentions to at most one row per canonical
   CURIE — counts, min (doc_id, tok_pos) ordering key, first-at-min name/
   type, pipe-joined distinct term/identifier partial sets. This is the
   skew defense: the hot CURIEs (``MONDO:0004976`` attaches to nearly every
   document — the north star's "ubiquitous MONDO/HP terms") are reduced
   ~batch_size-fold *before* any data moves, so the shuffle receives
   O(#batches x #distinct-curies) tiny rows instead of O(#mentions).
2. *final*: ``groupby('canonical_curie').map_groups(merge)`` over the small
   partials — unions the sets, re-resolves first-wins by the global min
   (doc_id, tok_pos).

Determinism: the reference's "first" is Python arrival order; ours is the
explicit total order (doc_id, tok_pos) carried from the parse stage
(SURVEY.md §2.9) — stable across re-runs and block orderings.

Output concept row (the ``DugConcept`` searchable dict,
``parsers/_base.py:131-143``, with list fields as sorted-distinct
pipe-joined strings for exact cross-engine comparison):
``concept_id, name, type, n_mentions, n_elements, search_terms,
identifiers, synonyms, purl, first_doc_id, first_tok_pos``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from dug_ray import ontology

CONCEPT_COLUMNS = [
    "concept_id", "name", "type", "n_mentions", "n_elements",
    "search_terms", "identifiers", "synonyms", "purl",
    "first_doc_id", "first_tok_pos",
]


def _join_distinct(values) -> str:
    out = set()
    for v in values:
        if v:
            out.update(v.split("|"))
    return "|".join(sorted(out))


def partial_concepts(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: mentions -> partial concept metadata rows.

    All set logic is C-level (``drop_duplicates`` then per-group joins over
    the already-unique pairs); element membership is deliberately NOT
    carried here — a hot concept's element list is unbounded (a single
    partial string would be GBs at corpus scale), so ``n_elements`` comes
    from the separate distinct-pair count in ``build_concepts``."""
    df = batch.to_pandas()
    # doc_id is a string (io.py contract); order by NATURAL string order
    # (length, then lexicographic) — equals numeric order for canonical
    # integer ids without crashing on 'phs000123'-style ids. The emitted
    # first_doc_id column stays numeric (-1 sentinel for non-numeric ids,
    # in which case _doc_key carries the true ordering to the merge).
    df["_doc_len"] = df["doc_id"].str.len()
    df = df.sort_values(["_doc_len", "doc_id", "tok_pos"], kind="mergesort")
    # exact int64 parse (pd.to_numeric routes through float64 and corrupts
    # ids above 2^53); non-numeric ids keep the -1 sentinel, _doc_key
    # still carries their true ordering
    is_num = df["doc_id"].str.fullmatch(r"-?\d{1,18}")
    dn = pd.Series(-1, index=df.index, dtype="int64")
    if is_num.any():
        dn[is_num] = df.loc[is_num, "doc_id"].astype("int64")
    # 19-digit ids may still fit int64 (1e18..9.22e18): overflow-checked
    # exact parse on that rare subset only; genuine overflows keep -1
    c19 = df["doc_id"].str.fullmatch(r"-?\d{19}")
    if c19.any():
        v = df.loc[c19, "doc_id"].map(int)
        fits = v.between(-(1 << 63), (1 << 63) - 1)
        dn.loc[v.index[fits]] = v[fits].astype("int64")
    df["_doc_num"] = dn
    g = df.groupby("canonical_curie", sort=False)
    out = g.agg(
        name=("name", "first"),
        type=("type", "first"),
        synonyms=("synonyms", "first"),
        purl=("purl", "first"),
        n_mentions=("curie", "size"),
        first_doc_id=("_doc_num", "first"),
        _doc_key=("doc_id", "first"),
        first_tok_pos=("tok_pos", "first"),
    ).reset_index()
    terms = (df[["canonical_curie", "term"]].drop_duplicates()
             .sort_values("term").groupby("canonical_curie")["term"]
             .agg("|".join).rename("terms"))
    ids = (df[["canonical_curie", "curie"]].drop_duplicates()
           .sort_values("curie").groupby("canonical_curie")["curie"]
           .agg("|".join).rename("identifiers"))
    out = out.merge(terms, on="canonical_curie").merge(ids, on="canonical_curie")
    out = out.rename(columns={"canonical_curie": "concept_id"})
    from dug_ray.shuffle import typed_table
    return typed_table(out, concept_id=pa.string(), name=pa.string(),
                       type=pa.string(), synonyms=pa.string(), purl=pa.string(),
                       n_mentions=pa.int64(), first_doc_id=pa.int64(),
                       _doc_key=pa.string(), first_tok_pos=pa.int64(),
                       terms=pa.string(), identifiers=pa.string())


def _decat(df: pd.DataFrame) -> pd.DataFrame:
    """Dictionary-encoded shuffle columns arrive in map_groups as pandas
    categoricals whose sort order is CATEGORY-INSERTION order, not
    lexicographic — re-type before any order-sensitive op (the same guard
    materialize.write_partition applies). Latent today (partials emit
    plain strings) but load-bearing the moment a partial stream is
    dictionary-encoded or read back from a checkpoint."""
    for c in df.columns:
        if isinstance(df[c].dtype, pd.CategoricalDtype):
            df[c] = df[c].astype(object)
    return df


def merge_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Final merge of partial concept rows (vectorized per bucket).

    First-wins name/type resolve to the row with the global min
    (doc natural order, first_tok_pos) — the deterministic stand-in for the
    reference's arrival-order dict insert (``crawler.py:155-163``). Name and
    type join the sort key so even an exact positional tie between partials
    from different blocks resolves identically on every run (block arrival
    order never decides; in this ontology name/type are functions of the
    concept id, so this is purely a determinism guard)."""
    df = _decat(df)
    df = df.assign(_doc_len=df["_doc_key"].str.len())
    df = df.sort_values(["_doc_len", "_doc_key", "first_tok_pos", "name", "type"],
                        kind="mergesort")
    g = df.groupby("concept_id", as_index=False, sort=False)
    out = g.agg(
        name=("name", "first"),
        type=("type", "first"),
        purl=("purl", "first"),
        n_mentions=("n_mentions", "sum"),
        first_doc_id=("first_doc_id", "first"),
        first_tok_pos=("first_tok_pos", "first"),
        terms=("terms", _join_distinct),
        identifiers=("identifiers", _join_distinct),
        synonyms=("synonyms", _join_distinct),
    )
    # concept search_terms = union over identifiers of search_text + synonyms,
    # sorted distinct (parsers/_base.py:116-121, A2)
    out["search_terms"] = [
        "|".join(sorted(set(t.split("|")) | (set(s.split("|")) if s else set())))
        for t, s in zip(out["terms"], out["synonyms"])
    ]
    out["n_mentions"] = out["n_mentions"].astype("int64")
    return out


def element_counts(linked: ray.data.Dataset, num_buckets: int = 32) -> ray.data.Dataset:
    """Exact distinct-(concept, element) counts per concept in one shuffle:
    per-batch pair dedup (combiner) -> bucket by concept -> per-bucket
    dedup + size. Output: concept_id, n_elements."""
    from dug_ray.shuffle import bucketed_group_apply

    def per_batch(batch: pa.Table) -> pa.Table:
        from dug_ray.shuffle import typed_table
        df = batch.to_pandas()[["canonical_curie", "element_id"]].drop_duplicates()
        return typed_table(df, canonical_curie=pa.string(), element_id=pa.string())

    pairs = linked.map_batches(per_batch, batch_format="pyarrow", batch_size=None)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = (_decat(df).drop_duplicates().groupby("canonical_curie").size()
               .rename("n_elements").reset_index())
        return out.rename(columns={"canonical_curie": "concept_id"})

    return bucketed_group_apply(pairs, "canonical_curie", per_bucket, num_buckets)


def build_concepts(linked: ray.data.Dataset, num_buckets: int = 16) -> ray.data.Dataset:
    """linked mentions -> concepts (partial+final canonicalization shuffle).

    The partial combiner collapses hot CURIEs per batch before the shuffle;
    the final merge runs vectorized per hash bucket of the concept key
    (see dug_ray.shuffle for why not per-group map_groups). ``n_elements``
    joins in from the distinct-pair count; the counts table is bounded by
    ontology size, so it is collected and broadcast into the final map."""
    from dug_ray.shuffle import bucketed_group_apply
    partials = linked.map_batches(partial_concepts, batch_format="pyarrow", batch_size=None)
    meta = bucketed_group_apply(partials, "concept_id", merge_partials, num_buckets)
    counts = {r["concept_id"]: r["n_elements"] for r in element_counts(linked).take_all()}

    def attach(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["n_elements"] = df["concept_id"].map(counts).fillna(0).astype("int64")
        return pa.Table.from_pandas(df[CONCEPT_COLUMNS], preserve_index=False)

    return meta.map_batches(attach, batch_format="pyarrow", batch_size=None)


def element_terms(linked: ray.data.Dataset, concepts: ray.data.Dataset) -> ray.data.Dataset:
    """Per-element search terms (A4, ``parsers/_base.py:63-78``):
    union over the element's concepts of concept search_terms + concept name,
    sorted distinct. The concepts side is bounded by ontology size, so it is
    collected and broadcast into the mention->element aggregation (at
    1000x ontology scale this becomes a co-partitioned join on concept_id)."""
    cmap = {r["concept_id"]: (r["search_terms"], r["name"])
            for r in concepts.select_columns(["concept_id", "search_terms", "name"]).take_all()}

    # pre-join once per distinct concept (C-level dict .map), never per row
    joined = {cid: f"{ts}|{nm}" for cid, (ts, nm) in cmap.items()}

    def per_batch(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[["element_id", "collection_id", "canonical_curie"]]
        df = df.assign(_terms=df["canonical_curie"].map(joined).fillna(""))
        out = (df.groupby(["element_id", "collection_id"], as_index=False)
                 .agg(search_terms=("_terms", _join_distinct),
                      concepts=("canonical_curie", lambda s: "|".join(sorted(set(s))))))
        from dug_ray.shuffle import typed_table
        return typed_table(out, element_id=pa.string(), collection_id=pa.string(),
                           search_terms=pa.string(), concepts=pa.string())

    partial = linked.map_batches(per_batch, batch_format="pyarrow", batch_size=None)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return (_decat(df).groupby(["element_id", "collection_id"], as_index=False)
                  .agg(search_terms=("search_terms", _join_distinct),
                       concepts=("concepts", _join_distinct)))

    from dug_ray.shuffle import bucketed_group_apply
    return bucketed_group_apply(partial, "element_id", merge_bucket, num_buckets=32)
