"""Deterministic sampling + decontamination operators.

The remaining training-data-curation family (beyond the 10% holdout of
``q_doc_sample`` and the stratified split):

- ``group_sample``: uniform k-per-group sample — the k docs with the
  smallest ``md5(doc_id)`` per source. Content-independent and
  reproducible across engines/runs; shaped as a per-batch partial top-k
  (combiner) + bucketed exact merge, so only O(batches x groups x k) rows
  ever move.
- ``mixture_sample``: weighted source mixing — each source keeps a
  deterministic fraction of its docs (md5 threshold compared in INTEGER
  space: first 8 hex chars < w * 2^30, w in quarters — exact on both
  engines). The knob a pretraining pipeline turns to re-weight domains.
- ``decontaminate``: benchmark decontamination — flag corpus docs sharing
  any word-3-gram with the designated eval set. The eval set is SMALL by
  definition, so its distinct shingles are collected once and broadcast
  (``ray.put``); each batch counts its docs' distinct shingles against the
  set vectorized. No shuffle touches the corpus side.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from dug_ray.shuffle import bucketed_group_apply


def _md5_hex8(ids) -> list[int]:
    return [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) for i in ids]


def group_sample(docs: ray.data.Dataset, k: int = 5) -> ray.data.Dataset:
    """k-per-source uniform sample by md5 order. Output: source, doc_id,
    sample_rank (1-based by (md5 hex, doc_id))."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[["source", "doc_id"]]
        df["h"] = [hashlib.md5(str(i).encode()).hexdigest()[:8]
                   for i in df["doc_id"]]
        df = df.sort_values(["source", "h", "doc_id"], kind="mergesort")
        return pa.Table.from_pandas(df.groupby("source").head(k),
                                    preserve_index=False)

    partials = docs.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "h", "doc_id"], kind="mergesort")
        df = df.groupby("source").head(k)
        df["sample_rank"] = df.groupby("source").cumcount() + 1
        return df[["source", "doc_id", "sample_rank"]]

    return bucketed_group_apply(partials, "source", merge, 8)


def mixture_sample(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Weighted source mixture: source keeps fraction w = (len(source)%3+1)/4
    of its docs (deterministic md5 threshold, integer-exact). Output per
    source: n_total, n_kept, weight_quarters."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[["source", "doc_id"]]
        h = np.array(_md5_hex8(df["doc_id"]), dtype=np.int64)
        wq = df["source"].str.len().to_numpy() % 3 + 1  # weight in quarters
        df["kept"] = h < wq * (1 << 30)
        g = df.groupby("source", as_index=False).agg(
            n_total=("doc_id", "size"), n_kept=("kept", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = docs.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", as_index=False).agg(
            n_total=("n_total", "sum"), n_kept=("n_kept", "sum"))
        g["weight_quarters"] = g["source"].str.len() % 3 + 1
        return g

    return bucketed_group_apply(partials, "source", merge, 8)


def decontaminate(docs: ray.data.Dataset, bench_mod: int = 97) -> ray.data.Dataset:
    """Benchmark decontamination: corpus docs (doc_id % bench_mod != 0)
    sharing >= 1 word-3-gram with the eval set (doc_id % bench_mod == 0).
    Output: doc_id, n_contam (count of distinct contaminated shingles)."""
    from dug_ray.stages.dedup import _shingle_df

    def bench_filter(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % bench_mod == 0))

    bench_sh = (docs.map_batches(bench_filter, batch_format="pyarrow", batch_size=None)
                .map_batches(lambda b: pa.Table.from_pandas(
                    _shingle_df(b)[["shingle"]].drop_duplicates(), preserve_index=False),
                    batch_format="pyarrow", batch_size=None))
    # the eval set is small by definition -> its shingle set broadcasts
    bench_set = set()
    for b in bench_sh.iter_batches(batch_size=None, batch_format="pyarrow"):
        bench_set.update(b.column("shingle").to_pylist())
    ref = ray.put(sorted(bench_set))

    def per_batch(batch: pa.Table) -> pa.Table:
        probe = pa.array(ray.get(ref), pa.string())
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(ids % bench_mod != 0))
        sh = _shingle_df(batch)
        if sh.empty:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_contam": pa.array([], pa.int64())})
        hit = pc.is_in(pa.array(sh["shingle"]), value_set=probe)
        sh = sh[hit.to_numpy(zero_copy_only=False)]
        g = sh.groupby("doc_id", as_index=False).agg(n_contam=("shingle", "size"))
        return pa.table({"doc_id": pa.array(g["doc_id"], pa.int64()),
                         "n_contam": pa.array(g["n_contam"], pa.int64())})

    return docs.map_batches(per_batch, batch_format="pyarrow", batch_size=None)
