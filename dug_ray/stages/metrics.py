"""Failure/lineage metric streams (M12).

The reference appends failing inputs to crawlspace text files
(``anno_fails.txt`` / ``norm_fails.txt``,
``/root/reference/src/dug/core/annotators/monarch_annotator.py:52-55,64-67``).
Here failures are first-class side Datasets — countable, joinable,
writable — produced by the same vectorized logic as the happy path:

- ``annotation_failures``: elements whose text yields NO candidate
  identifier (exact per element: all of an element's tokens are in its
  batch);
- ``normalization_failures``: per raw CURIE, mentions dropped because
  normalization failed and the prefix is outside the greenlist.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dug_ray import ontology


def annotation_failures(elements: ray.data.Dataset, lexicon=None,
                        preprocessor: dict[str, str] | None = None) -> ray.data.Dataset:
    """Elements with zero NER hits: (element_id, element_desc).

    ``lexicon`` (a DataFrame with a ``term`` column) and ``preprocessor``
    must mirror the DictionaryNER configuration of the pipeline being
    measured — the defaults are the same module defaults NER uses, so the
    zero-hit determination matches the annotator exactly; a pipeline run
    with a broadcast lexicon or a non-identity debreviator passes the same
    objects here."""
    from dug_ray.stages.annotate import DEFAULT_PREPROCESSOR, preprocess_text
    lex = ontology.lexicon_df() if lexicon is None else lexicon
    lex_terms = sorted(set(lex["term"]))
    reps = dict(DEFAULT_PREPROCESSOR if preprocessor is None else preprocessor)

    def per_batch(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern(preprocess_text(batch["element_desc"], reps), " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        import numpy as np
        parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
        hit = pc.is_in(tokens.flatten(), value_set=pa.array(lex_terms)) \
            .to_numpy(zero_copy_only=False)
        has_hit = np.zeros(len(batch), dtype=bool)
        np.logical_or.at(has_hit, parent, hit)
        return batch.filter(pa.array(~has_hit)).select(["element_id", "element_desc"])

    return elements.map_batches(per_batch, batch_format="pyarrow", batch_size=None)


def normalization_failures(mentions: ray.data.Dataset) -> ray.data.Dataset:
    """Dropped-by-normalization counts per raw CURIE: (curie, n_dropped).

    A mention is dropped when its score passes the threshold but its CURIE
    has no preferred id and its prefix is outside the greenlist
    (stages/link.py)."""
    norm = ontology.normalizer_df()
    failed_ids = set(norm[norm["preferred_curie"].isna()]["curie"])
    green = set(ontology.ONTOLOGY_GREENLIST)
    dropped = sorted(c for c in failed_ids if c.partition(":")[0] not in green)

    def per_batch(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater_equal(batch["score"], ontology.LINKER_SCORE_THRESHOLD))
        t = t.filter(pc.is_in(t["curie"], value_set=pa.array(dropped or ["__none__"])))
        df = t.select(["curie"]).to_pandas()
        g = df.groupby("curie", as_index=False).size().rename(columns={"size": "n_dropped"})
        return pa.Table.from_pandas(g, preserve_index=False)

    partial = mentions.map_batches(per_batch, batch_format="pyarrow", batch_size=None)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("curie", as_index=False).agg(n_dropped=("n_dropped", "sum"))

    from dug_ray.shuffle import bucketed_group_apply
    out = bucketed_group_apply(partial, "curie", merge, 8)

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "curie": batch["curie"],
            "n_dropped": pc.cast(batch["n_dropped"], pa.int64()),
        })

    return out.map_batches(fin, batch_format="pyarrow", batch_size=None)
