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


def normalization_failures(mentions: ray.data.Dataset, normalizer=None,
                           lexicon=None, threshold: float | None = None,
                           greenlist: list[str] | None = None) -> ray.data.Dataset:
    """Dropped-by-normalization counts per raw CURIE: (curie, n_dropped).

    A mention is dropped when its score passes the threshold but its CURIE
    does not normalize — no normalizer row at all, OR a row with a null
    preferred id — and the prefix is outside the greenlist (the exact
    LinkNormalize drop condition, stages/link.py). The config params must
    mirror the link stage being measured (same contract as
    ``annotation_failures``): defaults are the module defaults link uses."""
    norm = ontology.normalizer_df() if normalizer is None else normalizer
    lex = ontology.lexicon_df() if lexicon is None else lexicon
    thr = ontology.LINKER_SCORE_THRESHOLD if threshold is None else threshold
    green = set(ontology.ONTOLOGY_GREENLIST if greenlist is None else greenlist)
    ok = set(norm[norm["preferred_curie"].map(lambda v: isinstance(v, str))]["curie"])
    # domain = the lexicon's curies (the only mention producers)
    dropped = sorted(c for c in set(lex["curie"])
                     if c not in ok and c.partition(":")[0] not in green)

    def per_batch(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater_equal(batch["score"], thr))
        t = t.filter(pc.is_in(t["curie"],
                              value_set=pa.array(dropped or ["__none__"], pa.string())))
        df = t.select(["curie"]).to_pandas()
        g = df.groupby("curie", as_index=False).size()
        # typed build: an empty pandas frame would infer a null-typed curie
        # column and leak divergent block schemas into the shuffle
        return pa.table({"curie": pa.array(g["curie"], pa.string()),
                         "n_dropped": pa.array(g["size"], pa.int64())})

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
