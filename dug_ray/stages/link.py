"""Linker + normalization stage: candidate mentions -> linked mentions.

Re-expresses dug's score-threshold + node-normalizer + synonym + PURL chain
(SURVEY.md §2.2 M6, M8-M11, §2.4 J3-J4) as one actor-pool ``map_batches``:

- score threshold ``score >= 0.8`` (``sapbert_annotator.py:310-319``,
  config ``preprocessor`` direction flag ``config.py:48-51``) — a vectorized
  compute filter;
- identifier normalization (``annotators/_base.py:97-180``): raw CURIE ->
  preferred CURIE/label/type via the broadcast normalizer map (J3). A null
  preferred id is a normalization *failure*;
- greenlist rescue (M9, ``monarch_annotator.py:62-74`` +
  ``config.py:134-145``): failed identifiers survive with their raw CURIE
  only when the CURIE prefix is in the ontology greenlist, keeping the NER
  label/category as the resolved metadata; otherwise the mention is dropped
  (the ``norm_fails`` stream of M12 — surfaced as a metrics counter);
- synonym enrichment (M10, ``_base.py:183-229``): canonical CURIE ->
  pipe-joined sorted synonym list via the broadcast synonym map (J4);
- PURL attach (M11, ``biolink_purl_util.py:165-174``): static prefix map.

The three lookup tables are tiny versus the mention stream, so they are
broadcast (object-store refs fetched once per actor in ``__init__``) and
joined with an in-memory pandas hash merge per batch — never a shuffle.
At 10^12-doc scale this is exactly the "broadcast small side" join pattern;
only if the normalizer map itself outgrew worker memory would this become a
hash-partitioned shuffle join.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data

from dug_ray import ontology

LINKED_COLUMNS = [
    "doc_id", "element_id", "collection_id", "span_offset", "tok_pos",
    "term", "curie", "canonical_curie", "name", "type", "synonyms", "purl", "score",
]


def _synonyms_joined() -> pd.DataFrame:
    syn = ontology.synonym_df()
    return (
        syn.sort_values("synonym")
        .groupby("curie", as_index=False)
        .agg(synonyms=("synonym", lambda s: "|".join(sorted(set(s)))))
    )


class LinkNormalize:
    """Actor-pool linker/normalizer: ``map_batches(LinkNormalize, ...)``."""

    def __init__(self, normalizer_ref=None, synonyms_ref=None,
                 threshold: float = ontology.LINKER_SCORE_THRESHOLD,
                 greenlist: list[str] | None = None):
        norm = ray.get(normalizer_ref) if normalizer_ref is not None else ontology.normalizer_df()
        self.normalizer = norm
        self.synonyms = ray.get(synonyms_ref) if synonyms_ref is not None else _synonyms_joined()
        self.threshold = threshold
        self.greenlist = set(ontology.ONTOLOGY_GREENLIST if greenlist is None else greenlist)
        self.purl_map = ontology.PURL_MAP

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # M6 threshold filter
        df = df[df["score"] >= self.threshold]
        # J3 normalization merge
        df = df.merge(self.normalizer, on="curie", how="left", sort=False)
        prefix = df["curie"].str.partition(":")[0]
        rescued = df["preferred_curie"].isna() & prefix.isin(self.greenlist)
        df = df[df["preferred_curie"].notna() | rescued].copy()
        failed = df["preferred_curie"].isna()
        df["canonical_curie"] = df["preferred_curie"].where(~failed, df["curie"])
        df["name"] = df["preferred_label"].where(~failed, df["label"])
        df["type"] = df["preferred_type"].where(~failed, df["category"])
        # J4 synonym merge (on canonical id)
        df = df.merge(self.synonyms, left_on="canonical_curie", right_on="curie",
                      how="left", sort=False, suffixes=("", "_syn"))
        df["synonyms"] = df["synonyms"].fillna("")
        # M11 PURL from canonical prefix
        can_prefix = df["canonical_curie"].str.partition(":")
        bases = can_prefix[0].map(self.purl_map)
        df["purl"] = (bases + can_prefix[2]).where(bases.notna(), "")
        out = df[LINKED_COLUMNS]
        return pa.Table.from_pandas(out, preserve_index=False).cast(pa.schema([
            ("doc_id", pa.string()), ("element_id", pa.string()),
            ("collection_id", pa.string()), ("span_offset", pa.int32()),
            ("tok_pos", pa.int32()), ("term", pa.string()),
            ("curie", pa.string()), ("canonical_curie", pa.string()),
            ("name", pa.string()), ("type", pa.string()),
            ("synonyms", pa.string()), ("purl", pa.string()),
            ("score", pa.float64()),
        ]))


def link_mentions(mentions: ray.data.Dataset, *, concurrency: int | tuple = (1, 4),
                  batch_size: int = 8192, **actor_kwargs) -> ray.data.Dataset:
    """candidate mentions -> linked (canonicalized) mentions."""
    return mentions.map_batches(
        LinkNormalize,
        fn_constructor_kwargs=actor_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
