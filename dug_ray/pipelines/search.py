"""Serving-layer search over the elements Dataset (SURVEY.md §2.6 O2).

The reference serves ES relevance ranking with ``from_/size`` pagination
(``/root/reference/src/dug/core/async_search.py:243-252,301-308``). The
engine-side equivalent: score = number of distinct query terms present in
the element's token set, ranked (score desc, element_id asc), top-k — a
per-batch partial top-k (combiner) so only O(batches x k) candidate rows
leave the workers, then an exact driver-side merge of the tiny partials."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dug_ray.io import read_interleaved
from dug_ray.stages.parse import parse_elements


def score_elements(elements: ray.data.Dataset, terms: list[str]) -> ray.data.Dataset:
    """(element_id, score) for elements matching >= 1 query term."""
    tset = sorted(set(terms))

    def per_batch(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern(batch["element_desc"], " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
        flat = tokens.flatten()
        df = pd.DataFrame({
            "p": parent,
            "t": flat.to_numpy(zero_copy_only=False),
        })
        df = df[df["t"].isin(tset)].drop_duplicates()
        score = df.groupby("p").size()
        n = len(batch)
        sc = np.zeros(n, dtype=np.int64)
        sc[score.index.to_numpy()] = score.to_numpy()
        keep = sc > 0
        return pa.table({
            "element_id": pc.cast(batch["element_id"], pa.string()).filter(pa.array(keep)),
            "score": pa.array(sc[keep], pa.int64()),
        })

    return elements.map_batches(per_batch, batch_format="pyarrow", batch_size=None)


def search_elements(sf_dir: str, query: str, k: int = 20) -> ray.data.Dataset:
    """Top-k elements for a space-separated query string. Query terms are
    lowercased to match the parse-time ``utf8_lower`` of element_desc."""
    terms = query.lower().split()
    scored = score_elements(parse_elements(read_interleaved(sf_dir)), terms)

    def partial_topk(batch: pa.Table) -> pa.Table:
        # Arrow-native: no pandas roundtrip (which would degrade empty
        # blocks' element_id to a null-typed column). (score, element_id)
        # is a total order (ids unique per batch), so no stability concern.
        if len(batch) <= k:
            return batch
        idx = pc.sort_indices(batch, sort_keys=[("score", "descending"),
                                                ("element_id", "ascending")])
        return batch.take(idx.slice(0, k))

    partials = scored.map_batches(partial_topk, batch_format="pyarrow", batch_size=None)
    df = partials.to_pandas()
    if df.empty:  # zero hits: all-empty blocks drop the schema — rebuild it
        df = pd.DataFrame({"element_id": pd.Series([], dtype="object"),
                           "score": pd.Series([], dtype="int64")})
    df = df.sort_values(
        ["score", "element_id"], ascending=[False, True], kind="mergesort").head(k)
    df["rank"] = np.arange(1, len(df) + 1)
    return ray.data.from_pandas(df.reset_index(drop=True))
